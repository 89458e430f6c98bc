from . import dedup, embeddings, events, governance, serving  # noqa: F401
