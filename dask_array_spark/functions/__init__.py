from . import dedup, governance, similarity, text, tokenize  # noqa: F401
