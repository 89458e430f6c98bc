from .ingest import (
    densify,
    from_numpy,
    from_table_arrays,
    from_table_column,
    from_table_matrix,
    read_table,
    with_dense_index,
)

__all__ = [
    "densify",
    "from_numpy",
    "from_table_arrays",
    "from_table_column",
    "from_table_matrix",
    "read_table",
    "with_dense_index",
]
