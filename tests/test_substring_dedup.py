"""Exact-substring span dedup (Lee et al. 2021 ExactSubstr;
functions/dedup.py::duplicated_spans)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_maximal_spans_and_positions(spark):
    from dask_array_spark.functions.dedup import duplicated_spans

    docs = _docs(
        spark,
        [
            "a b c d e f g h i j",
            "z z c d e f g z z",      # shares "c d e f g" at (2, 2)
            "a b c x y z q w e r",    # shares "a b c" at (0, 0)
        ],
    )
    rows = {
        (r["doc_a"], r["doc_b"]): (r["a_start"], r["b_start"], r["length"])
        for r in duplicated_spans(docs, k=3).collect()
    }
    assert rows == {(0, 1): (2, 2, 5), (0, 2): (0, 0, 3)}


def test_repeat_occurrences_separate_diagonals(spark):
    """The same span occurring twice in one doc yields one match per
    (position pair) diagonal, each maximal."""
    from dask_array_spark.functions.dedup import duplicated_spans

    docs = _docs(spark, ["p q r s t", "p q r z p q r"])
    rows = sorted(
        (r["a_start"], r["b_start"], r["length"])
        for r in duplicated_spans(docs, k=3).collect()
    )
    assert rows == [(0, 0, 3), (0, 4, 3)]


def test_min_tokens_filters_short_spans(spark):
    from dask_array_spark.functions.dedup import duplicated_spans

    docs = _docs(spark, ["a b c d e f", "x x c d e x"])  # 3-token overlap
    assert duplicated_spans(docs, k=3, min_tokens=4).count() == 0
    assert duplicated_spans(docs, k=3).count() == 1
    with pytest.raises(ValueError, match="min_tokens"):
        duplicated_spans(docs, k=3, min_tokens=2)


def test_identical_docs_full_span(spark):
    from dask_array_spark.functions.dedup import duplicated_spans

    text = " ".join(f"t{i}" for i in range(12))
    rows = duplicated_spans(_docs(spark, [text, text]), k=4).collect()
    assert len(rows) == 1
    assert (rows[0]["a_start"], rows[0]["b_start"], rows[0]["length"]) == (0, 0, 12)


def test_hot_gram_cap_drops_boilerplate(spark):
    """A k-gram occurring corpus-wide above the cap never seeds
    matches (quadratic guard), while rare grams still do."""
    from dask_array_spark.functions.dedup import duplicated_spans

    boiler = "same old boilerplate line"
    docs = _docs(spark, [f"{boiler} unique{i} tail{i}" for i in range(30)])
    capped = duplicated_spans(docs, k=4, max_positions=10)
    assert capped.count() == 0
    uncapped = duplicated_spans(docs, k=4, max_positions=None)
    # every pair shares the 4-token boilerplate prefix
    assert uncapped.count() == 30 * 29 // 2


def test_verify_rejects_hash_collision_spans(spark, monkeypatch):
    """verify=True re-checks merged spans against the token text and
    drops hash-collision artifacts.  A real mod-P collision is
    ~n^2/P, so the test forces one: with the gram combine multiplier
    patched to 0 every k-gram hashes to its LAST token's hash, making
    'a b' and 'c b' collide while their text differs."""
    from dask_array_spark.functions import dedup as D

    docs = _docs(spark, ["a b q w e r t y", "c b z x v n m k"])
    monkeypatch.setattr(D, "M_COMB", 0)
    collided = D.duplicated_spans(docs, k=2)
    assert collided.count() == 1  # the false 'a b' ~ 'c b' match
    assert D.duplicated_spans(docs, k=2, verify=True).count() == 0


def test_verify_keeps_true_spans(spark):
    """verify=True is a no-op on genuine matches (same rows out)."""
    from dask_array_spark.functions.dedup import duplicated_spans

    docs = _docs(
        spark,
        ["a b c d e f g h i j", "z z c d e f g z z", "a b c x y z q w e r"],
    )
    plain = sorted(map(tuple, duplicated_spans(docs, k=3).collect()))
    checked = sorted(map(tuple, duplicated_spans(docs, k=3, verify=True).collect()))
    assert plain == checked and len(plain) == 2


def test_default_cap_is_1k(spark):
    """The hot-gram default dropped 10k -> 1k: the cap bounds a JOIN
    MULTIPLICITY (up to max_positions^2/2 seed rows per surviving
    gram), not a list's memory, so the generous LSH-style default was
    a scale hazard (VERDICT r4)."""
    import inspect

    from dask_array_spark.functions.dedup import duplicated_spans

    assert inspect.signature(duplicated_spans).parameters["max_positions"].default == 1_000


def test_clip_removes_one_copy_and_merges_overlaps(spark):
    """clip_duplicated_spans removes the span from the HIGHER-id doc
    only, passes unclipped docs through, and merges overlapping
    spans before clipping (no double-count of shared tokens)."""
    from dask_array_spark.functions.dedup import (
        clip_duplicated_spans,
        duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "x1 x2 a b c d e f g h x3"),
            (2, "y1 a b c d e f g h y2 y3"),
            (3, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, k=4, min_tokens=4)
    out = {r["doc_id"]: r for r in clip_duplicated_spans(docs, spans).collect()}
    assert out[1]["text"] == "x1 x2 a b c d e f g h x3"
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text"] == "y1 y2 y3"
    assert (out[2]["n_tokens_kept"], out[2]["n_tokens_removed"]) == (3, 8)
    assert out[3]["n_tokens_removed"] == 0

    # overlapping spans merge: hand-built spans covering [1,5) and
    # [3,7) over a 9-token doc remove exactly tokens 1..6
    hand = spark.createDataFrame(
        [(0, 9, 0, 1, 4), (0, 9, 0, 3, 4)],
        "doc_a long, doc_b long, a_start long, b_start long, length long",
    )
    d9 = spark.createDataFrame(
        [(9, "t0 t1 t2 t3 t4 t5 t6 t7 t8")], "doc_id long, text string"
    )
    row = clip_duplicated_spans(d9, hand).collect()[0]
    assert row["text"] == "t0 t7 t8"
    assert (row["n_tokens_kept"], row["n_tokens_removed"]) == (3, 6)


def test_clip_empty_and_whitespace_docs(spark):
    """Zero-token documents pass through with (0, 0) counts -- the
    F.sequence(0, size-1) formulation counted DOWN to [0, -1] on an
    empty token array and reported n_tokens_kept=2,
    n_tokens_removed=-2 (caught by round-5 review)."""
    from dask_array_spark.functions.dedup import clip_duplicated_spans

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [], "doc_a long, doc_b long, a_start long, b_start long, length long"
    )
    out = {r["doc_id"]: r for r in clip_duplicated_spans(docs, spans).collect()}
    for d in (1, 2):
        assert (out[d]["n_tokens_kept"], out[d]["n_tokens_removed"]) == (0, 0)
        assert out[d]["text"] == ""
    assert out[3]["text"] == "a b"
