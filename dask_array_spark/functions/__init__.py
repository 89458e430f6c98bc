from . import dedup, governance, similarity, text  # noqa: F401
