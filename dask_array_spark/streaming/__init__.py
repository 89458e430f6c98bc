from . import dedup, events  # noqa: F401
