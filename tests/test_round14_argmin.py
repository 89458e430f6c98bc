"""Round-14 packed-argmin pins: the guarded hash-aggregatable argmin
(functions/similarity.py::_argmin_packed_sql) must replicate
min_by(struct(cell, dist), struct(dist, cell)) bit-for-bit on the
engine's distance contract -- dist = round(x, 6) + 0.0 (non-negative
or NULL or NaN, never -0.0) -- and fail LOUDLY outside it instead of
silently corrupting (the round-13 rejection class)."""

import random

import pytest
from pyspark.sql import functions as F

from dask_array_spark.functions.similarity import (
    _argmin_cell_sql,
    _argmin_dist_sql,
    _argmin_packed_sql,
)


def _old(df):
    return (
        df.groupBy("vec_id")
        .agg(F.min_by(F.struct("cell", "dist"), F.struct("dist", "cell")).alias("m"))
        .selectExpr("vec_id", "m.cell AS cell", "m.dist AS dist")
    )


def _new(df):
    return (
        df.selectExpr("vec_id", f"{_argmin_packed_sql('cell', 'dist')} AS __pp")
        .groupBy("vec_id")
        .agg(F.expr("min(__pp) AS __p"))
        .selectExpr(
            "vec_id",
            f"{_argmin_cell_sql('__p')} AS cell",
            f"{_argmin_dist_sql('__p')} AS dist",
        )
    )


def test_packed_argmin_matches_min_by_on_hostile_distances(spark):
    rng = random.Random(14)
    vals = [None, float("nan"), 0.0, 1e-6, 2.5, 4.0, 4.398046e6 - 1,
            123.456789, 0.123456, 3.999999]
    rows = []
    for vid in range(800):
        for c in range(rng.randint(1, 6)):
            rows.append((vid, c, rng.choice(vals)))
    # deliberate ties: equal dists, all-NULL, all-NaN, zero ties
    rows += [
        (9001, 0, 1.5), (9001, 1, 1.5),
        (9002, 5, None), (9002, 2, None),
        (9003, 3, float("nan")), (9003, 1, float("nan")),
        (9004, 0, 0.0), (9004, 1, 0.0),
        (9005, 2, None), (9005, 0, float("nan")), (9005, 1, 0.0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, cell long, dist double")
    a, b = _old(df), _new(df)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_packed_argmin_is_hash_aggregated(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "vec_id long, cell long, dist double")
    plan = _new(df)._sc._jvm.PythonSQLUtils.explainString(
        _new(df)._jdf.queryExecution(), "simple"
    )
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


@pytest.mark.parametrize(
    "row",
    [
        (1, 0, 5.0e6),        # dist too large to pack
        (1, 1 << 21, 1.0),    # cell id out of range
        (1, -1, 1.0),         # negative cell id
    ],
)
def test_packed_argmin_guards_raise_loudly(spark, row):
    df = spark.createDataFrame([row], "vec_id long, cell long, dist double")
    with pytest.raises(Exception, match="argmin"):
        df.selectExpr(f"{_argmin_packed_sql('cell', 'dist')} AS p").collect()


def _old_argmax(df):
    return df.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("c"), (-F.col("cell")).alias("nc")))
        .cast("long")
        .alias("cell")
    )


def _new_argmax(df):
    from dask_array_spark.functions.similarity import (
        _argmax_cell_sql,
        _argmax_cos_packed_sql,
    )

    return (
        df.selectExpr("vec_id", f"{_argmax_cos_packed_sql('cell', 'c')} AS __pp")
        .groupBy("vec_id")
        .agg(F.expr("max(__pp) AS __p"))
        .selectExpr("vec_id", f"{_argmax_cell_sql('__p')} AS cell")
    )


def test_packed_argmax_matches_max_by_on_hostile_cosines(spark):
    """ivf_assign's cosine argmax packing: NULL < -Inf < finite <
    +Inf < NaN ascending, ties to the smaller cell (engine-probed
    max_by semantics) -- including the zero-norm division artifacts
    (NaN, +-Inf) the round-9 bug class is about."""
    import random

    inf, nan = float("inf"), float("nan")
    rng = random.Random(41)
    vals = [None, nan, inf, -inf, -1.0, 1.0, 0.0, -0.0, 0.123456, -0.999999]
    rows = []
    for vid in range(600):
        for cell in range(rng.randint(1, 5)):
            rows.append((vid, cell, rng.choice(vals)))
    rows += [(9001, 0, 0.5), (9001, 1, 0.5), (9002, 0, nan), (9002, 1, nan),
             (9003, 1, None), (9003, 0, -inf), (9004, 0, -0.0), (9004, 1, 0.0)]
    df = spark.createDataFrame(rows, "vec_id long, cell long, c double")
    a, b = _old_argmax(df), _new_argmax(df)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    plan = _new_argmax(df)._sc._jvm.PythonSQLUtils.explainString(
        _new_argmax(df)._jdf.queryExecution(), "simple"
    )
    assert "SortAggregate" not in plan and "HashAggregate" in plan
