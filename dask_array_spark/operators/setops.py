"""Set operations over 1-D arrays of values.

Parity: unique / union1d (/root/reference/dask_array/routines/
_unique.py:167,226), isin semantics (routines/_search.py:101); the
reference has no intersect1d/setdiff1d but Spark INTERSECT/EXCEPT give
them free (SURVEY.md section 2.9).

NumPy returns SORTED unique values, so the output index is the rank of
the value.  Ranking the (small, deduplicated) result uses a window over
one partition -- fine because set-op OUTPUTS are distinct values, which
are orders of magnitude smaller than the inputs; the heavy lifting
(DISTINCT / INTERSECT / EXCEPT) is a shuffle-partitioned hash
aggregate / join that scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = ["union1d", "intersect1d", "setdiff1d", "in1d"]


def _ranked(values: DataFrame) -> Array:
    d = values.select(
        (F.row_number().over(Window.orderBy(VALUE_COL)) - 1).cast("long").alias("i0"),
        F.col(VALUE_COL),
    )
    return Array(d, (None,))


def union1d(a: Array, b: Array) -> Array:
    """Sorted distinct union (reference routines/_unique.py:226)."""
    vals = a.df.select(VALUE_COL).union(b.df.select(VALUE_COL)).distinct()
    return _ranked(vals)


def intersect1d(a: Array, b: Array) -> Array:
    """Sorted distinct intersection == Spark INTERSECT (left semi join
    on distinct values)."""
    vals = a.df.select(VALUE_COL).intersect(b.df.select(VALUE_COL))
    return _ranked(vals)


def setdiff1d(a: Array, b: Array) -> Array:
    """Sorted distinct difference == Spark EXCEPT (left anti join)."""
    vals = a.df.select(VALUE_COL).subtract(b.df.select(VALUE_COL))
    return _ranked(vals)


def in1d(a: Array, b: Array) -> Array:
    """Membership of each element of ``a`` in ``b``'s values -- a left
    semi/anti join realized as a boolean column via left join on the
    (broadcastable) distinct test set."""
    test = b.df.select(F.col(VALUE_COL).alias("__t")).distinct()
    d = a.df.join(
        F.broadcast(test), on=F.col(VALUE_COL) == F.col("__t"), how="left"
    ).select(*a.index_cols, F.col("__t").isNotNull().alias(VALUE_COL))
    return Array(d, a.shape)
