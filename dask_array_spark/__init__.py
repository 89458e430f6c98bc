"""dask-array-spark: a PySpark-native chunked-array analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (mrocklin/dask-array -- lazy N-d arrays with a
query-optimizing expression system), re-expressed Spark-first: arrays
are cell/COO DataFrames, the "expression tree" is the Spark logical
plan, and Catalyst/Tungsten/AQE play the role of the reference's
simplify/lower/fuse + Frisky tiers (SURVEY.md sections 3-4).
"""

from .core import blocks
from .core.array import Array, VALUE_COL
from .core.diagnostics import chunk_report, explain, plan_census
from .operators import (
    complexes,
    creation,
    elemwise,
    fourier,
    linalg,
    manipulation,
    overlap,
    reductions,
    setops,
    slicing,
    sorting,
    windows,
)
from .sources import (
    densify,
    from_npy_stack,
    from_numpy,
    from_table_arrays,
    from_table_column,
    from_table_matrix,
    read_table,
    to_npy_stack,
    with_dense_index,
)

__version__ = "0.1.0"

__all__ = [
    "Array",
    "VALUE_COL",
    "blocks",
    "complexes",
    "creation",
    "elemwise",
    "fourier",
    "linalg",
    "manipulation",
    "overlap",
    "reductions",
    "setops",
    "slicing",
    "sorting",
    "windows",
    "densify",
    "from_npy_stack",
    "from_numpy",
    "from_table_arrays",
    "from_table_column",
    "from_table_matrix",
    "read_table",
    "to_npy_stack",
    "with_dense_index",
    "chunk_report",
    "explain",
    "plan_census",
]
