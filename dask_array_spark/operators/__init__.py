from . import creation, elemwise, linalg, manipulation, reductions, slicing, windows  # noqa: F401
