from .ingest import (
    from_numpy,
    from_table_column,
    from_table_matrix,
    read_table,
    with_dense_index,
)

__all__ = [
    "from_numpy",
    "from_table_column",
    "from_table_matrix",
    "read_table",
    "with_dense_index",
]
