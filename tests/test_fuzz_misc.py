"""Property-based fuzz of the remaining small surfaces: the
conveniences layer (allclose / flatnonzero / broadcast_arrays /
percentile spellings), the skew-safe two-stage salted aggregation and
salted join (plans/skew.py) vs plain groupBy/join oracles under
deliberately hot keys, and kth_smallest on heavy-duplicate data where
bucket boundaries land ON tied values.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


# ------------------------------------------------------------ conveniences


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.integers(-3, 3), min_size=1, max_size=12),
    st.integers(0, 10_000),
)
def test_allclose_flatnonzero_random(spark, vals, seed):
    from dask_array_spark.operators import conveniences as CV

    x = np.asarray(vals, dtype="float64")
    rng = np.random.default_rng(seed)
    y = x + rng.choice([0.0, 1e-9, 0.5], size=len(x))
    got = CV.allclose(_arr(spark, x), _arr(spark, y)).compute()
    assert bool(got) == np.allclose(x, y)
    assert_eq(CV.flatnonzero(_arr(spark, x)), np.flatnonzero(x).astype("float64"))


@settings(max_examples=4, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 10_000))
def test_broadcast_arrays_random(spark, n, m, seed):
    from dask_array_spark.operators import conveniences as CV

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 9, size=(n, 1)).astype("float64")
    b = rng.integers(1, 9, size=(1, m)).astype("float64")
    got = CV.broadcast_arrays(_arr(spark, a), _arr(spark, b))
    want = np.broadcast_arrays(a, b)
    for g, w in zip(got, want):
        assert_eq(g, w)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.integers(-20, 20), min_size=2, max_size=25),
    st.integers(0, 100),
)
def test_percentile_spellings_random(spark, vals, p):
    from dask_array_spark.operators import conveniences as CV

    x = np.asarray(vals, dtype="float64")
    a = _arr(spark, x)
    assert_eq(CV.percentile(a, p), np.percentile(x, p))
    assert_eq(CV.nanpercentile(a, p), np.nanpercentile(x, p))
    assert_eq(CV.nanquantile(a, p / 100.0), np.nanquantile(x, p / 100.0))


# ----------------------------------------------------------------- skew


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(-5, 5)), min_size=1, max_size=40),
    st.sampled_from(["sum", "count", "min", "max"]),
    st.integers(1, 8),
)
def test_salted_agg_matches_plain_groupby(spark, rows, agg, salt):
    """Two-stage salted aggregation == one-stage groupBy for every
    supported merge, including a deliberately hot key (key 0 drawn
    3x as often as the rest via the narrow key range)."""
    import pandas as pd

    from dask_array_spark.plans.skew import salted_agg

    df = spark.createDataFrame(
        pd.DataFrame({"k": [r[0] for r in rows], "v": [float(r[1]) for r in rows]})
    )
    got = {
        r["k"]: r["v"] for r in salted_agg(df, ["k"], "v", agg, salt=salt).collect()
    }
    want = {}
    for k, v in rows:
        want.setdefault(k, []).append(v)
    fn = {"sum": sum, "count": len, "min": min, "max": max}[agg]
    want = {k: float(fn(vs)) for k, vs in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


# ------------------------------------------------------------ kth_smallest


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.integers(0, 4), min_size=3, max_size=30),
    st.integers(0, 10_000),
)
def test_kth_smallest_heavy_ties(spark, vals, seed):
    """Bucket-narrowing exact k-th smallest on data where most values
    are TIED (5 distinct values), so bucket boundaries land on ties --
    the classic off-by-one surface for histogram narrowing."""
    from dask_array_spark.operators import reductions as R

    x = np.asarray(vals, dtype="float64")
    rng = np.random.default_rng(seed)
    ks = rng.choice(len(x), size=min(3, len(x)), replace=False)
    srt = np.sort(x)
    for k in ks:
        got = R.kth_smallest(_arr(spark, x), int(k), buckets=4, max_collect=6)
        assert got == srt[int(k)]
