"""Zero-norm exclusion across the cosine-serving tier, plus the Spark
NULL/NaN division semantics the guards depend on.

The round-9 bug (VERDICT r9 "What's wrong #1"): with ANSI off, Spark
evaluates ``x / 0.0`` as **NULL**, not NaN, and ``isnan(NULL)`` is
**false** — so a ``.filter(~F.isnan("cos"))`` zero-norm guard is a
no-op.  Full scans looked right only because NULL sorts LAST under
``desc`` and the corpus had > k valid candidates; the probed
(``ivf_sq8_topk``) candidate pools are small, so the zero vector
ranked into top-k with ``cos NULL``.  These tests pin both the Spark
semantics (so a Spark upgrade changing them fails loudly here, not
silently in ranking) and the exclusion itself on every tier that
divides by ``nrm * qnrm``.
"""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- semantics


def test_spark_division_and_isnan_null_contract(spark):
    """Pin the exact Spark (ANSI off) semantics the guards rely on:
    x/0.0 -> NULL (not NaN), isnan(NULL) -> false, NaN/1 -> NaN,
    isnan(NaN) -> true, and NULL-vs-NaN ordering under desc."""
    row = spark.range(1).select(
        (F.lit(1.0) / F.lit(0.0)).alias("one_over_zero"),
        (F.lit(0.0) / F.lit(0.0)).alias("zero_over_zero"),
        F.isnan(F.lit(1.0) / F.lit(0.0)).alias("isnan_of_null"),
        (F.lit(float("nan")) / F.lit(1.0)).alias("nan_over_one"),
        F.isnan(F.lit(float("nan")) / F.lit(1.0)).alias("isnan_of_nan"),
    ).collect()[0]
    assert row["one_over_zero"] is None  # NULL, not inf/NaN
    assert row["zero_over_zero"] is None  # NULL, not NaN
    assert row["isnan_of_null"] is False  # the round-9 trap
    assert row["nan_over_one"] is not None and math.isnan(row["nan_over_one"])
    assert row["isnan_of_nan"] is True

    # ordering: under ORDER BY x DESC Spark puts NaN FIRST (NaN is
    # "largest") and NULL LAST -- i.e. an unguarded NaN cosine would
    # win rank 0 while an unguarded NULL hides past k.
    vals = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (2.0,)], "x double"
    )
    ordered = [r["x"] for r in vals.orderBy(F.col("x").desc()).collect()]
    assert math.isnan(ordered[0])
    assert ordered[1:3] == [2.0, 1.0]
    assert ordered[3] is None


# ---------------------------------------------------------------- fixtures

# 5 corpus vectors, k chosen so that WITHOUT exclusion the zero vector
# would land inside top-k of every tier (valid non-self candidates: 3).
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [-1.0, 0.0, 0.0, 0.0]),
    (4, [0.0, 0.0, 0.0, 0.0]),  # zero norm: must never appear
]
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<float>",
    )


def _check(rows, qids=(0,)):
    """Shared contract: zero vector absent, ranks 0-based dense, no
    NULL/NaN scores, every present qid among the requested ones."""
    assert rows, "tier returned nothing for a valid query"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) <= set(qids)
    for q, rs in by_q.items():
        ids = [r["vec_id"] for r in rs]
        assert 4 not in ids, f"zero-norm vector ranked for qid {q}: {rs}"
        assert q not in ids, "self not excluded"
        score_col = "cos" if "cos" in rs[0].asDict() else "dist"
        for r in rs:
            v = r[score_col]
            assert v is not None and not math.isnan(v)
        assert sorted(r["rank"] for r in rs) == list(range(len(rs)))


# ---------------------------------------------------------------- tiers


def test_cosine_topk_excludes_zero_norm(emb):
    from dask_array_spark.functions import similarity as SIM

    rows = SIM.cosine_topk(emb, [0], k=K).collect()
    _check(rows)
    # exactly the 3 valid non-self candidates survive
    assert len(rows) == 3


def test_ivf_topk_excludes_zero_norm(emb):
    from dask_array_spark.functions import similarity as SIM

    # full probe = exhaustive; small pools are exactly where the bug bit
    rows = SIM.ivf_topk(emb, [0], k=K, n_cells=2, n_probe=2).collect()
    _check(rows)
    assert len(rows) == 3


def test_sq8_topk_excludes_zero_norm(emb):
    from dask_array_spark.functions import similarity as SIM

    rows = SIM.sq8_topk(emb, [0], k=K).collect()
    _check(rows)
    assert len(rows) == 3


def test_ivf_sq8_topk_excludes_zero_norm(emb):
    from dask_array_spark.functions import similarity as SIM

    # the round-9 red test's shape: probed pool smaller than k
    rows = SIM.ivf_sq8_topk(emb, [0], k=K, n_cells=2, n_probe=2).collect()
    _check(rows)
    assert len(rows) == 3


def test_zero_norm_query_returns_no_rows(emb):
    from dask_array_spark.functions import similarity as SIM

    assert SIM.cosine_topk(emb, [4], k=K).collect() == []
    assert SIM.sq8_topk(emb, [4], k=K).collect() == []


def test_rerank_rejects_bool(emb):
    """ADVICE r9 (low): rerank=True must raise, not behave as rerank=1."""
    from dask_array_spark.functions import similarity as SIM

    cents = SIM.pq_train(emb, dim=4, m=2, n_codes=2, iters=1)
    with pytest.raises(ValueError, match="rerank"):
        SIM.pq_topk(emb, [0], cents, dim=4, m=2, k=2, rerank=True)
