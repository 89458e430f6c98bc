from . import dedup, embeddings, events, governance  # noqa: F401
