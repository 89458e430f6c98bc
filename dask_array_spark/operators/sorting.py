"""First-class sorting (SURVEY.md section 2.8: the reference has no
total sort -- arrays are positional -- but our engine adds ORDER BY as
a first-class op since oracle checks need deterministic order).

``sort``/``argsort`` produce (rank, value) / (rank, original index)
via the scalable two-pass zipWithIndex rank over a range partitioner
(sources/ingest.py `with_dense_index`): a range exchange + local
sorts, never a single-partition global window.  Ties break on the
original index (NumPy stable-sort semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array
from ..sources.ingest import with_dense_index

__all__ = ["sort", "argsort"]


def _ranked(a: Array, keep: str) -> Array:
    if a.ndim != 1:
        raise ValueError("sort/argsort are defined for 1-D arrays")
    d = a.df.select(F.col("i0").alias("__orig"), F.col(VALUE_COL))
    ranked = with_dense_index(d, [VALUE_COL, "__orig"], "i0")
    out = ranked.select("i0", F.col(keep).alias(VALUE_COL))
    return Array(out, a.shape)


def sort(a: Array) -> Array:
    """Values in ascending order, index = rank (stable)."""
    return _ranked(a, VALUE_COL)


def argsort(a: Array) -> Array:
    """Original indexes in value order (stable ties)."""
    return _ranked(a, "__orig")
