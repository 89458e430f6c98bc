from . import dedup, events, governance  # noqa: F401
