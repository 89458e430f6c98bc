"""npy-stack connector round trip (reference io/_from_npy_stack.py:13,
io/_to_npy_stack.py:13): executor-side writes, binaryFile-source reads
with np.load decode -- the driver touches only the tiny headers."""

import shutil

import numpy as np
import pytest

from tests.conftest import assert_eq

STACK_DIR = "/root/repo/.tmp/npy_stack_test"


@pytest.fixture()
def stack_dir():
    shutil.rmtree(STACK_DIR, ignore_errors=True)
    yield STACK_DIR
    shutil.rmtree(STACK_DIR, ignore_errors=True)


def test_npy_stack_roundtrip_2d(spark, rng, stack_dir):
    from dask_array_spark.sources import from_npy_stack, from_numpy, to_npy_stack

    a = rng.normal(size=(37, 5))
    to_npy_stack(from_numpy(spark, a), stack_dir, files=4)
    back = from_npy_stack(spark, stack_dir)
    assert back.shape == (37, 5)
    assert_eq(back, a)


def test_npy_stack_roundtrip_1d(spark, rng, stack_dir):
    from dask_array_spark.sources import from_npy_stack, from_numpy, to_npy_stack

    a = rng.normal(size=23)
    to_npy_stack(from_numpy(spark, a), stack_dir, files=3)
    back = from_npy_stack(spark, stack_dir)
    assert back.shape == (23,)
    assert_eq(back, a)


def test_npy_stack_int_bool_native(spark, stack_dir):
    """long/boolean value columns write native int64/bool stacks
    (round 11; the old float64 dump lost the dtype and shredded ints
    above 2**53); NULL cells refuse loudly like to_zarr's int
    stores."""
    import os

    from dask_array_spark.sources import from_npy_stack, from_numpy, to_npy_stack

    xi = np.array([0, -5, 2**53 + 1, -(2**53) - 7, 2**62, 11], dtype=np.int64)
    to_npy_stack(from_numpy(spark, xi), stack_dir, files=2)
    first = np.load(os.path.join(stack_dir, sorted(os.listdir(stack_dir))[0]))
    assert first.dtype == np.int64
    back = from_npy_stack(spark, stack_dir)
    assert dict(back.df.dtypes)["v"] == "bigint"
    got = back.compute()
    np.testing.assert_array_equal(got.astype("int64"), xi)

    shutil.rmtree(stack_dir, ignore_errors=True)
    xb = np.array([True, False, True, True, False])
    to_npy_stack(from_numpy(spark, xb), stack_dir, files=1)
    assert np.load(os.path.join(stack_dir, "0.npy")).dtype == np.bool_
    gb = from_npy_stack(spark, stack_dir).compute()
    np.testing.assert_array_equal(gb.astype(bool), xb)

    # NULL int cells -> loud refusal (no NULL encoding in .npy)
    shutil.rmtree(stack_dir, ignore_errors=True)
    from pyspark.sql import functions as F

    from dask_array_spark.core.array import Array

    a = from_numpy(spark, xi)
    nulled = Array(
        a.df.withColumn(
            "v", F.when(F.col("i0") == 2, None).otherwise(F.col("v"))
        ),
        a.shape,
    )
    with pytest.raises(Exception, match="NULL cells"):
        to_npy_stack(nulled, stack_dir, files=1)


def test_parquet_array_roundtrip(spark, rng):
    import shutil

    from dask_array_spark.sources import from_numpy, from_parquet, to_parquet

    path = "/root/repo/.tmp/arr_parquet"
    shutil.rmtree(path, ignore_errors=True)
    try:
        a = rng.normal(size=(40, 3))
        to_parquet(from_numpy(spark, a), path, partition_by_block=10)
        back = from_parquet(spark, path, (40, 3))
        assert_eq(back, a)
        # region read: the derived __b0 predicate actually prunes the
        # block directories (non-empty PartitionFilters on __b0)
        import numpy as np

        region = from_parquet(spark, path, (10, 3), i0_range=(0, 10), block=10)
        assert_eq(region, a[0:10])
        plan = region.df._jdf.queryExecution().executedPlan().toString()
        scan = [l for l in plan.splitlines() if "FileScan" in l][0]
        assert "PartitionFilters: [" in scan and "__b0" in scan.split("PartitionFilters")[1][:120]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_external_connectors_are_gated(spark):
    from dask_array_spark.sources import from_tiledb

    with pytest.raises(NotImplementedError):
        from_tiledb(spark, "tiledb://array")


def test_from_map_blocks(spark):
    """from_map (reference io/_from_map.py:199): one block per input
    value, blocks built executor-side."""
    import numpy as np

    from dask_array_spark.sources import from_map

    out = from_map(spark, lambda i: np.arange(i * 10, i * 10 + 10, dtype="float64"),
                   range(5))
    assert out.shape == (50,)
    assert np.allclose(out.compute(), np.arange(50.0))


def test_from_map_ragged_blocks(spark):
    import numpy as np

    from dask_array_spark.sources import from_map

    lens = [3, 5, 2]
    out = from_map(
        spark, lambda n: np.full(n, float(n)), lens, block_lengths=lens
    )
    want = np.concatenate([np.full(n, float(n)) for n in lens])
    assert np.allclose(out.compute(), want)


def test_from_delayed(spark):
    import numpy as np

    from dask_array_spark.sources import from_delayed

    out = from_delayed(spark, lambda: np.linspace(0, 1, 11))
    assert out.shape == (11,)
    assert np.allclose(out.compute(), np.linspace(0, 1, 11))


def test_store_region_roundtrip(spark, tmp_path):
    """store (reference io/_store.py:168): two sources region-write
    into one target; reading back reproduces the concatenation."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.sources import from_parquet, store

    x = np.arange(6.0)
    y = np.arange(6.0, 10.0)
    tgt = str(tmp_path / "stored")
    store(
        [from_numpy(spark, x), from_numpy(spark, y)],
        [tgt, tgt],
        regions=[(slice(0, 6),), (slice(6, 10),)],
    )
    back = from_parquet(spark, tgt, (10,))
    assert np.allclose(back.compute(), np.arange(10.0))


def test_zarr_roundtrip_raw_and_zlib(spark, tmp_path):
    """Real zarr v2 connector (no zarr library needed): executor-side
    chunk writes, .zarray metadata, binaryFile chunk-grid read with
    edge-chunk trimming and zlib decompression."""
    import json
    import zlib

    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.sources import from_zarr, to_zarr

    mat = np.arange(35.0).reshape(5, 7) + 0.5
    a = from_numpy(spark, mat)
    for comp in (None, "zlib"):
        url = str(tmp_path / f"z_{comp}")
        to_zarr(a, url, chunks=(2, 3), compressor=comp)
        meta = json.load(open(url + "/.zarray"))
        assert meta["shape"] == [5, 7] and meta["chunks"] == [2, 3]
        back = from_zarr(spark, url)
        assert back.shape == (5, 7)
        assert np.allclose(back.compute(), mat)

    # read a store written by hand (as an external tool would)
    url2 = str(tmp_path / "ext")
    import os

    os.makedirs(url2)
    vec = np.linspace(0, 1, 10)
    json.dump(
        {"zarr_format": 2, "shape": [10], "chunks": [4], "dtype": "<f8",
         "compressor": {"id": "zlib", "level": 1}, "fill_value": None,
         "filters": None, "order": "C"},
        open(url2 + "/.zarray", "w"),
    )
    for c in range(3):
        block = np.zeros(4)
        seg = vec[c * 4:(c + 1) * 4]
        block[: len(seg)] = seg
        open(f"{url2}/{c}", "wb").write(zlib.compress(block.tobytes(), 1))
    back = from_zarr(spark, url2)
    got = back.compute()
    # fill_value zeros beyond data are real zeros in this store
    assert np.allclose(got, vec)


def test_from_graph_and_frompyfunc(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from dask_array_spark.operators.elemwise import frompyfunc
    from dask_array_spark.sources import from_graph

    df = spark.range(6).select(
        F.col("id").alias("i0"), (F.col("id") * 2.0).alias("v")
    )
    a = from_graph(df, (6,))
    f = frompyfunc(lambda x: x ** 2 + 1.0)
    out = f(a)
    assert np.allclose(out.compute(), (np.arange(6) * 2.0) ** 2 + 1.0)


def test_zarr_nested_store(spark, tmp_path):
    """dimension_separator '/' (nested chunk dirs) -- ADVICE round 2:
    the flat scan used to return an empty array silently."""
    import json
    import os

    import numpy as np

    from dask_array_spark.sources import from_zarr

    url = str(tmp_path / "znest")
    os.makedirs(url)
    data = np.arange(24, dtype="<f8").reshape(4, 6)
    json.dump(
        {"zarr_format": 2, "shape": [4, 6], "chunks": [2, 3], "dtype": "<f8",
         "compressor": None, "fill_value": "NaN", "filters": None, "order": "C",
         "dimension_separator": "/"},
        open(url + "/.zarray", "w"),
    )
    for bi in range(2):
        for bj in range(2):
            os.makedirs(f"{url}/{bi}", exist_ok=True)
            blk = data[bi * 2 : bi * 2 + 2, bj * 3 : bj * 3 + 3]
            open(f"{url}/{bi}/{bj}", "wb").write(
                np.ascontiguousarray(blk).tobytes()
            )
    back = from_zarr(spark, url)
    np.testing.assert_array_equal(back.compute(), data)


def test_zarr_fill_value_zero(spark, tmp_path):
    """fill_value 0 with an omitted chunk: the missing chunk's cells
    must read as 0, not silently drop (ADVICE round 2)."""
    import json
    import os

    import numpy as np

    from dask_array_spark.sources import from_zarr

    url = str(tmp_path / "zfill")
    os.makedirs(url)
    json.dump(
        {"zarr_format": 2, "shape": [10], "chunks": [4], "dtype": "<f8",
         "compressor": None, "fill_value": 0, "filters": None, "order": "C"},
        open(url + "/.zarray", "w"),
    )
    # chunks 0 and 2 present, chunk 1 omitted -> positions 4..7 are fill
    open(url + "/0", "wb").write(np.arange(4, dtype="<f8").tobytes())
    open(url + "/2", "wb").write(np.full(4, 7.0, dtype="<f8").tobytes())
    back = from_zarr(spark, url)
    want = np.array([0.0, 1, 2, 3, 0, 0, 0, 0, 7, 7])
    np.testing.assert_array_equal(back.compute(), want)


def _blosc_frame_zlib(payload: bytes, typesize: int, shuffle: bool) -> bytes:
    """Hand-build a c-blosc1 frame (zlib codec, one block) per the
    public chunk format -- validates the reader's format handling."""
    import struct
    import zlib

    import numpy as np

    nbytes = len(payload)
    if shuffle:
        n_elem = nbytes // typesize
        arr = np.frombuffer(payload, dtype="u1")
        payload = arr[: n_elem * typesize].reshape(n_elem, typesize).T.tobytes() + bytes(
            arr[n_elem * typesize :]
        )
    comp = zlib.compress(payload, 5)
    flags = (0x1 if shuffle else 0) | (3 << 5)  # zlib cname code
    blocksize = nbytes
    body = struct.pack("<I", 16 + 4 + 4 + len(comp))  # bstarts[0] after header+bstarts
    block = struct.pack("<I", len(comp)) + comp
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, 16 + 4 + 4 + len(comp)
    )
    # bstarts offset points at the block (header 16 + bstarts 4)
    body = struct.pack("<I", 20)
    return header + body + block


def test_zarr_blosc_zlib_chunks(spark, tmp_path):
    """blosc-compressed store (zlib codec inside the blosc frame),
    with and without byte-shuffle, plus the memcpy flag."""
    import json
    import os
    import struct

    import numpy as np

    from dask_array_spark.sources import from_zarr

    for shuffle in (False, True):
        url = str(tmp_path / f"zblosc{int(shuffle)}")
        os.makedirs(url)
        json.dump(
            {"zarr_format": 2, "shape": [8], "chunks": [4], "dtype": "<f8",
             "compressor": {"id": "blosc", "cname": "zlib", "clevel": 5,
                            "shuffle": int(shuffle)},
             "fill_value": "NaN", "filters": None, "order": "C"},
            open(url + "/.zarray", "w"),
        )
        data = np.arange(8, dtype="<f8") * 1.5
        open(url + "/0", "wb").write(
            _blosc_frame_zlib(data[:4].tobytes(), 8, shuffle)
        )
        # chunk 1: memcpy flag (incompressible marker), any cname
        payload = data[4:].tobytes()
        hdr = struct.pack("<BBBBIII", 2, 1, 0x2, 8, len(payload), len(payload),
                          16 + len(payload))
        open(url + "/1", "wb").write(hdr + payload)
        back = from_zarr(spark, url)
        np.testing.assert_array_equal(back.compute(), data)


def test_from_map_lengths_derived_on_executors(spark):
    """With no explicit length, the count pass derives block lengths on
    EXECUTORS -- func never runs on the driver (TaskContext is None
    only there)."""
    from dask_array_spark.sources import from_delayed, from_map

    def blk(j):
        from pyspark import TaskContext

        assert TaskContext.get() is not None, "ran on the driver"
        return np.full(3 + j, float(j))

    out = from_map(spark, blk, [0, 1, 2])
    got = out.compute()
    want = np.concatenate([np.full(3 + j, float(j)) for j in range(3)])
    np.testing.assert_allclose(got, want)

    def thunk():
        from pyspark import TaskContext

        assert TaskContext.get() is not None, "ran on the driver"
        return np.full(7, 4.0)

    lazy = from_delayed(spark, thunk)
    np.testing.assert_allclose(lazy.compute(), np.full(7, 4.0))
