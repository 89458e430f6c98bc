"""Public-namespace guard: pins the flat ``dask_array_spark.api``
export surface (the reference pins its namespace the same way,
tests/test_public_namespace.py / test_api.py:12-27)."""

EXPECTED = {
    # collection & IO
    "Array", "VALUE_COL", "densify", "from_array", "from_npy_stack",
    "from_numpy", "from_table_arrays", "from_table_column",
    "from_table_matrix", "read_table", "to_npy_stack", "with_dense_index",
    # creation
    "arange", "diag_extract", "diagonal", "eye", "fromfunction", "full",
    "indices", "linspace", "ones", "random_choice", "random_exponential",
    "random_integers", "random_lognormal", "random_normal",
    "random_permutation", "random_poisson", "random_uniform", "tri",
    "tril_indices", "tril_indices_from", "triu_indices",
    "triu_indices_from", "zeros",
    # ufuncs
    "absolute", "arccos", "arccosh", "arcsin", "arcsinh", "arctan",
    "arctan2", "arctanh", "cbrt", "ceil", "choose", "clip", "copysign",
    "cos", "cosh", "deg2rad", "degrees", "digitize", "divmod_", "elemwise",
    "exp", "exp2", "expm1", "fix", "float_power", "floor", "fmax", "fmin",
    "fmod", "frexp", "hypot", "isclose", "isfinite", "isinf", "isnan",
    "isneginf", "isnull", "isposinf", "ldexp", "log", "log1p", "log2",
    "log10", "logaddexp", "logaddexp2", "logical_and", "logical_not",
    "logical_or", "logical_xor", "left_shift", "maximum", "minimum",
    "modf", "nan_to_num", "notnull", "piecewise", "rad2deg", "radians",
    "reciprocal", "right_shift", "rint", "select", "sign", "signbit",
    "sin", "sinc", "sinh", "sqrt", "square", "tan", "tanh", "trunc",
    "where",
    # complex
    "angle", "cabs", "cadd", "cmul", "conj", "imag", "iscomplex",
    "make_complex", "real",
    # slicing
    "argwhere", "boolean_mask", "compress", "extract", "isin", "nonzero",
    "searchsorted", "set_index_value", "take", "vindex",
    # reductions
    "all", "amax", "amin", "any", "argmax", "argmin", "argtopk",
    "average", "bincount", "count_nonzero", "grouping_sum", "histogram",
    "histogram2d", "histogramdd", "kth_smallest", "max", "mean", "median",
    "median_scalable", "min", "moment", "nanargmax", "nanargmin",
    "nanmax", "nanmean", "nanmedian", "nanmin", "nanprod", "nanstd",
    "nansum", "nanvar", "percentile_approx", "prod", "ptp", "quantile",
    "quantiles", "std", "sum", "topk", "unique", "var",
    # windows
    "coarsen", "cumprod", "cumsum", "cumsum_1d_scalable", "diff",
    "ediff1d", "gradient", "moving_reduce", "nancumsum", "push",
    "sliding_reduce",
    # shape
    "append", "atleast_1d", "atleast_2d", "atleast_3d", "broadcast_to",
    "concatenate", "delete", "expand_dims", "flip", "insert", "moveaxis",
    "pad", "ravel_multi_index", "repeat", "reshape", "roll", "squeeze",
    "stack", "swapaxes", "tile", "transpose", "unravel_index",
    # linalg
    "cholesky", "corrcoef", "cov", "dot", "einsum", "inv", "lstsq", "lu",
    "matmul", "norm", "outer", "qr", "solve", "solve_triangular", "svd",
    "tensordot", "trace", "vdot",
    # fourier / sorting / sets / kernels
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn", "rfft", "irfft",
    "rfft2", "irfft2", "rfftn", "irfftn", "hfft", "ihfft", "fftfreq",
    "rfftfreq", "fftshift", "ifftshift",
    "argsort", "sort", "in1d", "intersect1d", "setdiff1d",
    "union1d", "map_overlap", "overlap", "trim_overlap",
    "apply_along_axis", "apply_gufunc",
    "from_blocks", "map_blocks", "to_blocks",
    # numpy-convenience aliases (VERDICT r3 item 2)
    "allclose", "asanyarray", "asarray", "broadcast_arrays", "dstack",
    "empty_like", "flatnonzero", "fliplr", "flipud", "full_like",
    "hstack", "iscomplexobj", "nanpercentile", "nanquantile",
    "ones_like", "percentile", "result_type", "rollaxis", "vstack",
    "zeros_like",
    # namespace-parity tail (round 4 audit vs reference __init__)
    "PerformanceWarning", "aligned_coarsen_chunks", "apply_over_axes",
    "arg_reduction", "around", "array", "block", "blockwise", "compute",
    "diag", "empty", "from_tiledb", "nancumprod", "ndim",
    "normalize_chunks", "ravel", "rechunk", "register_chunk_type",
    "rot90", "round", "shape", "shuffle", "to_tiledb", "tril", "triu",
    "unify_chunks", "expr_flow", "expr_table", "trace_rewrites",
}


def test_api_namespace_is_pinned():
    import dask_array_spark.api as da

    public = {n for n in dir(da) if not n.startswith("_")}
    # module objects leak in via re-export imports; only check names we
    # claim, plus detect accidental removals
    missing = EXPECTED - public
    assert not missing, f"missing API names: {sorted(missing)}"


def test_api_names_are_callable_or_types():
    import dask_array_spark.api as da

    for name in sorted(EXPECTED - {"VALUE_COL"}):
        obj = getattr(da, name)
        assert callable(obj), f"{name} is not callable"


# Static snapshot of the reference's full public ``__all__`` (298
# names, reference __init__.py:263-562).  Every name except the
# opt-in ``xarray`` submodule must resolve on dask_array_spark.api --
# this is the porting-user contract: ``import dask_array_spark.api as
# da`` supports every ``da.<name>`` the reference supports.
REFERENCE_ALL = [
    "Array", "PerformanceWarning", "abs", "absolute", "add",
    "aligned_coarsen_chunks", "all", "allclose", "angle", "any", "append",
    "apply_along_axis", "apply_gufunc", "apply_over_axes", "arange",
    "arccos", "arccosh", "arcsin", "arcsinh", "arctan", "arctan2",
    "arctanh", "arg_reduction", "argmax", "argmin", "argtopk", "argwhere",
    "around", "array", "as_gufunc", "asanyarray", "asarray", "atleast_1d",
    "atleast_2d", "atleast_3d", "average", "bincount", "bitwise_and",
    "bitwise_not", "bitwise_or", "bitwise_xor", "block", "blockwise",
    "bool", "broadcast_arrays", "broadcast_to", "cbrt", "ceil", "choose",
    "chunk_report", "clip", "coarsen", "complex128", "complex64",
    "compress", "compute", "concatenate", "conj", "conjugate", "copysign",
    "corrcoef", "cos", "cosh", "count_nonzero", "cov", "cumprod",
    "cumreduction", "cumsum", "deg2rad", "degrees", "delete", "diag",
    "diagonal", "diff", "digitize", "divide", "divmod", "dot", "dstack",
    "e", "ediff1d", "einsum", "elemwise", "empty", "empty_like", "equal",
    "euler_gamma", "exp", "exp2", "expand_dims", "explain", "expm1",
    "expr_flow", "expr_table", "extract", "eye", "fabs", "fix",
    "flatnonzero", "flip", "fliplr", "flipud", "float32", "float64",
    "float_power", "floor", "floor_divide", "fmax", "fmin", "fmod", "frexp",
    "from_array", "from_delayed", "from_map", "from_npy_stack",
    "from_tiledb", "from_zarr", "fromfunction", "frompyfunc", "full",
    "full_like", "gradient", "greater", "greater_equal", "gufunc",
    "histogram", "histogram2d", "histogramdd", "hstack", "hypot", "i0",
    "imag", "indices", "inf", "insert", "int16", "int32", "int64", "int8",
    "invert", "isclose", "iscomplex", "iscomplexobj", "isfinite", "isin",
    "isinf", "isnan", "isneginf", "isnull", "isposinf", "isreal", "ldexp",
    "left_shift", "less", "less_equal", "linspace", "log", "log10", "log1p",
    "log2", "logaddexp", "logaddexp2", "logical_and", "logical_not",
    "logical_or", "logical_xor", "map_blocks", "map_overlap", "matmul",
    "max", "maximum", "mean", "median", "meshgrid", "min", "minimum", "mod",
    "modf", "moment", "moveaxis", "multiply", "nan", "nan_to_num",
    "nanargmax", "nanargmin", "nancumprod", "nancumsum", "nanmax",
    "nanmean", "nanmedian", "nanmin", "nanpercentile", "nanprod",
    "nanquantile", "nanstd", "nansum", "nanvar", "ndim", "negative",
    "newaxis", "nextafter", "nonzero", "normalize_chunks", "not_equal",
    "notnull", "ones", "ones_like", "optimize", "outer", "overlap", "pad",
    "percentile", "pi", "piecewise", "positive", "power", "prod", "ptp",
    "push", "quantile", "rad2deg", "radians", "ravel", "ravel_multi_index",
    "real", "rechunk", "reciprocal", "reduction", "register_chunk_type",
    "remainder", "repeat", "reshape", "reshape_blockwise", "result_type",
    "right_shift", "rint", "roll", "rollaxis", "rot90", "round",
    "searchsorted", "select", "shape", "shuffle", "sign", "signbit", "sin",
    "sinc", "sinh", "sliding_window_view", "spacing", "sqrt", "square",
    "squeeze", "stack", "std", "store", "subtract", "sum", "swapaxes",
    "take", "tan", "tanh", "tensordot", "tile", "to_hdf5", "to_npy_stack",
    "to_tiledb", "to_zarr", "topk", "trace", "trace_rewrites", "transpose",
    "tri", "tril", "tril_indices", "tril_indices_from", "trim_overlap",
    "triu", "triu_indices", "triu_indices_from", "true_divide", "trunc",
    "ufunc", "uint16", "uint32", "uint64", "uint8", "unify_chunks",
    "union1d", "unique", "unravel_index", "var", "vdot", "vstack", "where",
    "zeros", "zeros_like",
]

REFERENCE_ONLY = {"xarray"}  # documented out of scope (SURVEY section 2.15)


def test_every_reference_name_resolves():
    import dask_array_spark.api as da

    missing = [
        n for n in REFERENCE_ALL
        if n not in REFERENCE_ONLY and not hasattr(da, n)
    ]
    assert not missing, f"reference __all__ names absent from api: {missing}"
