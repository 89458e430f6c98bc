from .array import Array, VALUE_COL, idx_cols

__all__ = ["Array", "VALUE_COL", "idx_cols"]
