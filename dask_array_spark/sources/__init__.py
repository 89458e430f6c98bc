from .ingest import (
    densify,
    from_npy_stack,
    from_parquet,
    from_numpy,
    from_table_arrays,
    from_table_column,
    from_table_matrix,
    read_table,
    to_npy_stack,
    to_parquet,
    widen_partitions,
    with_dense_index,
)

__all__ = [
    "densify",
    "from_npy_stack",
    "from_parquet",
    "from_numpy",
    "from_table_arrays",
    "from_table_column",
    "from_table_matrix",
    "read_table",
    "to_npy_stack",
    "to_parquet",
    "widen_partitions",
    "with_dense_index",
]
