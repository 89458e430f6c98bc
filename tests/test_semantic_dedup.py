"""SemDeDup semantic deduplication (Abbas et al. 2023;
functions/similarity.py::semantic_dedup).  The oracle replica runs in
tests/test_oracle.py (similarity_suite kind 3); these pin the
operator-level semantics on hand-built embeddings."""

from pyspark.sql import functions as F


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_exact_duplicate_dropped_keep_farthest(spark):
    """Two identical vectors in one cluster: exactly one is flagged.
    Keep-diverse policy: the member FARTHEST from the centroid ranks
    first, so of two near-identical members the one with lower
    centroid cosine survives (ties -> smaller vec_id survives)."""
    from dask_array_spark.functions.similarity import semantic_dedup

    # vec 0 is the single centroid (n_cells=1); 1 and 2 are identical
    # to each other (cos = 1.0), 3 is orthogonal.  cos(0, 1) = 0.9939
    # stays below the 0.995 threshold, so only the identical pair
    # dedups.
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb(
                spark,
                [[1, 0, 0], [0.9, 0.1, 0], [0.9, 0.1, 0], [0, 0, 1]],
            ),
            n_cells=1,
            eps=0.995,
        ).collect()
    }
    assert len(out) == 4
    dropped = {v for v, r in out.items() if r["is_dup"]}
    # identical pair 1/2: equal ccos, tie -> smaller vec_id ranks
    # first and survives, so 2 is the duplicate
    assert dropped == {2}
    assert all(out[v]["cell"] == 0 for v in out)


def test_eps_gates_similarity(spark):
    from dask_array_spark.functions.similarity import semantic_dedup

    vecs = [[1, 0, 0], [0.8, 0.6, 0], [0.6, 0.8, 0]]  # cos(1,2) = 0.96
    strict = semantic_dedup(_emb(spark, vecs), n_cells=1, eps=0.99)
    assert strict.filter("is_dup").count() == 0
    loose = semantic_dedup(_emb(spark, vecs), n_cells=1, eps=0.9)
    assert loose.filter("is_dup").count() == 1


def test_max_cell_guard_skips_hot_cluster(spark):
    """Clusters above max_cell skip pair generation entirely: all
    members kept, flagged is_dup = false (quadratic guard)."""
    from dask_array_spark.functions.similarity import semantic_dedup

    vecs = [[1.0, 0.0]] + [[1.0, 0.001 * i] for i in range(1, 8)]
    capped = semantic_dedup(_emb(spark, vecs), n_cells=1, eps=0.9, max_cell=4)
    assert capped.filter("is_dup").count() == 0
    assert capped.count() == 8
    uncapped = semantic_dedup(_emb(spark, vecs), n_cells=1, eps=0.9, max_cell=None)
    assert uncapped.filter("is_dup").count() == 7  # all near-identical


def test_dedup_confined_to_cluster(spark):
    """Near-identical vectors in DIFFERENT clusters are both kept --
    SemDeDup only compares within a cluster."""
    from dask_array_spark.functions.similarity import semantic_dedup

    # centroids: vec 0 = x-axis, vec 1 = y-axis; vecs 2/3 similar to
    # each other but assigned to different cells
    vecs = [[1, 0], [0, 1], [0.71, 0.7], [0.7, 0.71]]
    out = semantic_dedup(_emb(spark, vecs), n_cells=2, eps=0.9)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[2]["cell"] != rows[3]["cell"]
    assert not rows[2]["is_dup"] and not rows[3]["is_dup"]


def test_trained_codebook_path(spark):
    """ivf_assign / semantic_dedup accept a kmeans_fit-trained
    codebook: assignment follows the TRAINED centroids, not the
    first-k stub, and the dedup semantics are unchanged."""
    from dask_array_spark.functions.similarity import (
        ivf_assign,
        kmeans_fit,
        semantic_dedup,
    )

    # two tight clusters around the x- and y-axes, but the FIRST two
    # vectors both sit in the x cluster -- the stub codebook (first-2
    # vectors) cannot separate the clusters; a trained one does
    vecs = [
        [1.0, 0.0], [0.99, 0.01],            # x cluster (incl. both stubs)
        [0.98, 0.02], [0.0, 1.0], [0.01, 0.99], [0.02, 0.98],
    ]
    emb = _emb(spark, vecs)
    cents = kmeans_fit(emb, k=2, iters=3)
    asg = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents=cents).collect()}
    x_cells = {asg[0], asg[1], asg[2]}
    y_cells = {asg[3], asg[4], asg[5]}
    assert len(x_cells) == 1 and len(y_cells) == 1 and x_cells != y_cells

    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, eps=0.999, cents=cents).collect()
    }
    assert len(out) == 6
    # EVERY within-cluster pair clears eps=0.999 (the smallest is
    # cos(0,2) = cos(3,5) = 0.98/sqrt(0.9608) ~= 0.999791), so each
    # trained cell keeps exactly its one top-ranked member and drops
    # the other two -- 4 duplicates total, one survivor per cluster
    dropped = {v for v, r in out.items() if r["is_dup"]}
    assert len(dropped) == 4
    assert len(dropped & {0, 1, 2}) == 2 and len(dropped & {3, 4, 5}) == 2
    # cross-cluster: nothing in the y cluster pairs with the x cluster
    assert all(out[v]["cell"] == asg[v] for v in out)


def test_ivf_topk_trained_codebook(spark):
    """ivf_topk with a trained codebook probes the right cell: a query
    in the y cluster finds its y-cluster neighbors even though the
    stub codebook would lump everything into one x-ish cell."""
    from dask_array_spark.functions.similarity import ivf_topk, kmeans_fit

    vecs = [
        [1.0, 0.0], [0.99, 0.01], [0.98, 0.02],
        [0.0, 1.0], [0.01, 0.99], [0.02, 0.98],
    ]
    emb = _emb(spark, vecs)
    cents = kmeans_fit(emb, k=2, iters=3)
    out = ivf_topk(emb, [3], k=2, n_probe=1, cents=cents).collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [4, 5]


def test_ann_recall_full_probe_is_perfect(spark):
    """Probing every cell makes IVF search exhaustive, so recall@k
    must be exactly 1.0 for every query; with one probe on a spread
    corpus recall stays in [0, 1] and n_hits/k == recall."""
    from dask_array_spark.functions.similarity import ann_recall

    vecs = [
        [1.0, 0.0, 0.0], [0.9, 0.1, 0.0], [0.8, 0.2, 0.0],
        [0.0, 1.0, 0.0], [0.1, 0.9, 0.0], [0.0, 0.8, 0.2],
        [0.0, 0.0, 1.0], [0.2, 0.0, 0.9],
    ]
    emb = _emb(spark, vecs)
    full = {
        r["qid"]: r
        for r in ann_recall(
            emb, [0, 3], k=3, n_cells=2, n_probe=2
        ).collect()
    }
    assert set(full) == {0, 3}
    assert all(r["recall"] == 1.0 and r["n_hits"] == 3 for r in full.values())

    one = ann_recall(emb, [0, 3], k=3, n_cells=2, n_probe=1).collect()
    for r in one:
        assert 0.0 <= r["recall"] <= 1.0
        # recall is 6-decimal rounded by design (oracle parity)
        assert abs(r["recall"] - r["n_hits"] / 3.0) <= 5e-7


def test_ann_recall_trained_codebook(spark):
    """A trained codebook routes queries to the right cells: with
    kmeans-fit centroids and n_probe=1, each query's own cluster is
    probed, so its same-cluster neighbors are found."""
    from dask_array_spark.functions.similarity import ann_recall, kmeans_fit

    vecs = [
        [1.0, 0.02, 0.0], [0.98, 0.0, 0.01], [0.97, 0.05, 0.0],
        [0.0, 1.0, 0.03], [0.02, 0.98, 0.0], [0.0, 0.97, 0.05],
    ]
    emb = _emb(spark, vecs)
    cents = kmeans_fit(emb, k=2, iters=3)
    out = {
        r["qid"]: r["recall"]
        for r in ann_recall(
            emb, [0, 3], k=2, n_cells=2, n_probe=1, cents=cents
        ).collect()
    }
    assert out == {0: 1.0, 3: 1.0}


def test_ann_recall_small_corpus_and_missing_qid(spark):
    """recall@k divides by the ACHIEVABLE exact count, not the fixed
    k: a 4-vector corpus with k=5 has only 3 exact neighbors per
    query, and a full probe finding all 3 must score 1.0 (not 3/5).
    A requested qid absent from the corpus still yields a row --
    n_hits 0 and NULL recall -- instead of silently vanishing."""
    from dask_array_spark.functions.similarity import ann_recall

    vecs = [
        [1.0, 0.0, 0.0], [0.9, 0.1, 0.0],
        [0.0, 1.0, 0.0], [0.1, 0.9, 0.0],
    ]
    emb = _emb(spark, vecs)
    rows = {
        r["qid"]: r
        for r in ann_recall(
            emb, [0, 999], k=5, n_cells=2, n_probe=2
        ).collect()
    }
    assert set(rows) == {0, 999}
    assert rows[0]["n_hits"] == 3 and rows[0]["recall"] == 1.0
    assert rows[999]["n_hits"] == 0 and rows[999]["recall"] is None


def test_ivf_topk_precomputed_assignment_parity(spark):
    """ivf_topk(assign=...) -- the production index path (vectors
    assigned ONCE at ingest, queries pay only probe + candidate scan)
    -- must return exactly the rows the self-assigning form computes
    for the same codebook."""
    from dask_array_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_fit,
    )

    vecs = [
        [1.0, 0.0], [0.99, 0.01], [0.98, 0.02],
        [0.0, 1.0], [0.01, 0.99], [0.02, 0.98],
        [0.7, 0.7], [0.71, 0.69],
    ]
    emb = _emb(spark, vecs)
    cents = kmeans_fit(emb, k=3, iters=3)
    index = ivf_assign(emb, 3, cents)
    auto = ivf_topk(emb, [0, 3, 6], k=3, n_cells=3, n_probe=2, cents=cents)
    pre = ivf_topk(
        emb, [0, 3, 6], k=3, n_cells=3, n_probe=2, cents=cents, assign=index
    )
    key = lambda r: (r["qid"], r["rank"])  # noqa: E731
    rows = lambda df: [  # noqa: E731
        (r["qid"], r["rank"], r["vec_id"], r["cos"])
        for r in sorted(df.collect(), key=key)
    ]
    assert rows(pre) == rows(auto)
