"""Flat public namespace mirroring the reference's ``dask_array``
API surface (~280 names re-exported from
/root/reference/dask_array/__init__.py:263-562): a user of the
reference writes ``da.sqrt(x)`` / ``da.matmul(a, b)`` and can switch
to ``import dask_array_spark.api as da`` with the same spellings.

Names are re-exports of the operator modules; the export list is
pinned by tests/test_namespace.py (the reference pins its namespace in
tests/test_public_namespace.py).
"""

from __future__ import annotations

# -- collection & IO ------------------------------------------------------
from .core.array import Array, VALUE_COL  # noqa: F401
from .core.diagnostics import (  # noqa: F401
    chunk_report,
    explain,
    expr_flow,
    expr_table,
    plan_census,
    trace_rewrites,
)
from .sources.ingest import (  # noqa: F401
    densify,
    from_delayed,
    from_graph,
    from_map,
    from_npy_stack,
    from_numpy,
    from_table_arrays,
    from_table_column,
    from_table_matrix,
    read_table,
    store,
    to_npy_stack,
    with_dense_index,
)
from .sources.hdf5 import from_hdf5, h5_ls, to_hdf5  # noqa: F401
from .sources.ingest import from_zarr, to_zarr  # noqa: F401

from_array = from_numpy  # reference spelling for in-memory sources

# -- creation -------------------------------------------------------------
from .operators.creation import (  # noqa: F401
    arange,
    diag_extract,
    diagonal,
    eye,
    fromfunction_expr as fromfunction,
    full,
    indices_1d as indices,
    indices_nd,
    meshgrid,
    linspace,
    ones,
    random_choice,
    random_exponential,
    random_integers,
    random_lognormal,
    random_normal,
    random_permutation,
    random_poisson,
    random_uniform,
    tri,
    tril_indices,
    tril_indices_from,
    triu_indices,
    triu_indices_from,
    zeros,
)

# -- random distribution family -------------------------------------------
from .operators.random_dists import (  # noqa: F401
    Generator as RandomGenerator,
    default_rng,
)

# -- elemwise / ufuncs ----------------------------------------------------
from .operators.elemwise import (  # noqa: F401
    absolute,
    arccos,
    arccosh,
    arcsin,
    arcsinh,
    arctan,
    arctan2,
    arctanh,
    cbrt,
    ceil,
    choose,
    clip,
    copysign,
    cos,
    cosh,
    deg2rad,
    degrees,
    digitize_uniform as digitize,
    divmod_,
    elemwise,
    exp,
    exp2,
    expm1,
    fix,
    float_power,
    floor,
    fmax,
    fmin,
    fmod,
    frexp,
    frompyfunc,
    hypot,
    isclose,
    isfinite,
    isinf,
    isnan,
    isneginf,
    isnull,
    isposinf,
    ldexp,
    log,
    log1p,
    log2,
    log10,
    logaddexp,
    logaddexp2,
    logical_and,
    logical_not,
    logical_or,
    logical_xor,
    left_shift,
    maximum,
    minimum,
    modf,
    nan_to_num,
    notnull,
    piecewise,
    rad2deg,
    radians,
    reciprocal,
    right_shift,
    rint,
    select,
    sign,
    signbit,
    sin,
    sinc,
    sinh,
    sqrt,
    square,
    tan,
    tanh,
    trunc,
    where,
)

# -- complex --------------------------------------------------------------
from .operators.complexes import (  # noqa: F401
    angle,
    cabs,
    cadd,
    cmul,
    conj,
    imag,
    iscomplex,
    make_complex,
    real,
)

# -- slicing / indexing ---------------------------------------------------
from .operators.slicing import (  # noqa: F401
    argwhere,
    boolean_mask,
    compress,
    extract,
    isin,
    nonzero,
    searchsorted,
    set_index_value,
    take,
    vindex,
)

# -- reductions -----------------------------------------------------------
from .operators.reductions import (  # noqa: F401
    all_ as all,  # noqa: A001
    amax,
    amin,
    any_ as any,  # noqa: A001
    argmax,
    argmin,
    argtopk,
    average,
    bincount,
    count_nonzero,
    cumreduction,
    grouping_sum,
    histogram,
    histogram2d,
    histogramdd,
    kth_smallest,
    mean,
    median,
    median_scalable,
    moment,
    nanargmax,
    nanargmin,
    nanmax,
    nanmean,
    nanmedian,
    nanmin,
    nanprod,
    nanstd,
    nansum,
    nanvar,
    percentile_approx,
    prod,
    ptp,
    quantile,
    quantiles,
    reduction,
    std,
    sum,  # noqa: A001
    topk,
    unique_table as unique,
    var,
)

amax = amax
max = amax  # noqa: A001
min = amin  # noqa: A001

# -- windows / cumulative -------------------------------------------------
from .operators.windows import (  # noqa: F401
    coarsen,
    cumprod,
    cumsum,
    cumsum_1d_scalable,
    diff,
    ediff1d,
    gradient,
    moving_reduce,
    nancumprod,
    nancumsum,
    push,
    sliding_reduce,
)

# -- shape / layout -------------------------------------------------------
from .operators.manipulation import (  # noqa: F401
    append_1d as append,
    atleast_1d,
    atleast_2d,
    atleast_3d,
    broadcast_to,
    concatenate,
    delete_1d as delete,
    expand_dims,
    flip,
    insert_1d as insert,
    moveaxis,
    pad,
    ravel_multi_index,
    repeat,
    reshape,
    reshape_blockwise,
    roll,
    unravel_index,
    sliding_window_view,
    squeeze,
    stack,
    swapaxes,
    tile,
    transpose,
)

# -- linalg ---------------------------------------------------------------
from .operators.linalg import (  # noqa: F401
    cholesky,
    corr_pair,
    corrcoef,
    cov,
    cov_pair,
    einsum,
    inv,
    lstsq,
    lu,
    matmul,
    norm,
    outer,
    solve,
    solve_triangular,
    svd_compressed,
    qr,
    sfqr,
    svd_tall as svd,
    tensordot,
    trace,
    tsqr,
    vdot,
)

dot = matmul

# -- fourier / sorting / set ops / overlap / kernels ----------------------
from .operators.fourier import (  # noqa: F401
    fft, fft2, fft_long, fftfreq, fftn, fftshift, hfft, ifft, ifft2,
    ifftn, ifftshift, ihfft, irfft, irfft2, irfftn, rfft, rfft2,
    rfftfreq, rfftn,
)
from .operators.sorting import argsort, sort  # noqa: F401
from .operators.setops import in1d, intersect1d, setdiff1d, union1d  # noqa: F401
from .operators.overlap import map_overlap, overlap, trim_overlap  # noqa: F401

# -- numpy-convenience aliases --------------------------------------------
from .operators.conveniences import (  # noqa: F401
    allclose,
    asanyarray,
    asarray,
    broadcast_arrays,
    dstack,
    empty_like,
    flatnonzero,
    fliplr,
    flipud,
    full_like,
    hstack,
    iscomplexobj,
    nanpercentile,
    nanquantile,
    ones_like,
    percentile,
    result_type,
    rollaxis,
    vstack,
    zeros_like,
)
from .core.blocks import (  # noqa: F401
    apply_along_axis,
    apply_gufunc,
    from_blocks,
    map_blocks,
    to_blocks,
)
from .operators.parity import (  # noqa: F401
    PerformanceWarning,
    aligned_coarsen_chunks,
    apply_over_axes,
    around,
    array,
    block,
    blockwise,
    compute,
    diag,
    empty,
    ndim,
    normalize_chunks,
    ravel,
    rechunk,
    register_chunk_type,
    rot90,
    round,
    shape,
    shuffle,
    tril,
    triu,
    unify_chunks,
)
from .operators.reductions import arg_reduction  # noqa: F401
from .sources.ingest import from_tiledb, to_tiledb  # noqa: F401  (lib-gated, injectable)

# -- namespace alias tail (round-5 audit: the 53 remaining reference
# names -- dunder-dispatching aliases, dtype/constant names,
# ufunc/gufunc wrappers, nextafter/spacing/i0) ----------------------------
from .operators.ufuncs import (  # noqa: F401
    abs,  # noqa: A004
    add,
    as_gufunc,
    bitwise_and,
    bitwise_not,
    bitwise_or,
    bitwise_xor,
    bool,  # noqa: A004
    complex64,
    complex128,
    conjugate,
    divide,
    divmod,  # noqa: A004
    e,
    equal,
    euler_gamma,
    fabs,
    float32,
    float64,
    floor_divide,
    greater,
    greater_equal,
    gufunc,
    i0,
    inf,
    int8,
    int16,
    int32,
    int64,
    invert,
    isreal,
    less,
    less_equal,
    mod,
    multiply,
    nan,
    negative,
    newaxis,
    nextafter,
    not_equal,
    optimize,
    pi,
    positive,
    power,
    remainder,
    spacing,
    subtract,
    true_divide,
    ufunc,
    uint8,
    uint16,
    uint32,
    uint64,
)
from . import random  # noqa: F401  (da.random namespace)
from . import chunk  # noqa: F401  (da.chunk block-kernel helpers)
