"""Pure-Python codec kernels for executor-side chunk decoding.

Spark executors run Python workers without the native ``lz4``/``blosc``
packages in this environment, so connectors that meet compressed chunks
(zarr blosc stores -- reference io/_zarr.py:67) need a dependency-free
decode path.  The LZ4 *block* format is small and public
(lz4.github.io/lz4/lz4_Block_format.html); this decoder leans on
bytearray slice copies so the hot work is C-speed memcpy, not a
per-byte Python loop.
"""

from __future__ import annotations

__all__ = [
    "lz4_block_decompress",
    "snappy_decompress",
    "bitshuffle",
    "bitunshuffle",
]


def lz4_block_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 *block* (raw block format, no frame header) into
    exactly ``dst_size`` bytes.

    Format: repeated sequences of
      token(1B: lit_len<<4 | (match_len-4)) [lit_len ext: 255...] literals
      offset(2B LE, 1..65535) [match_len ext: 255...]
    with the final sequence ending after its literals.  Overlapping
    matches (offset < length) repeat the trailing pattern -- that is
    LZ4's RLE encoding.
    """
    n = len(src)
    out = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        llen = token >> 4
        if llen == 15:
            while True:
                b = src[i]
                i += 1
                llen += b
                if b != 255:
                    break
        if llen:
            out += src[i : i + llen]
            i += llen
        if i >= n:
            break  # last sequence carries literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 15) + 4
        if token & 15 == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: match offset past start")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            pattern = bytes(out[start:])
            reps = -(-mlen // offset)
            out += (pattern * reps)[:mlen]
    if len(out) != dst_size:
        raise ValueError(
            f"corrupt LZ4 block: decoded {len(out)} bytes, expected {dst_size}"
        )
    return bytes(out)


def snappy_decompress(src: bytes, dst_size: int | None = None) -> bytes:
    """Decode one raw snappy block (the format parquet/blosc use --
    github.com/google/snappy/blob/main/format_description.txt).

    Layout: a little-endian varint giving the uncompressed length,
    then tagged elements:
      tag&3==0  literal; length-1 in tag>>2, or (tag>>2)-59 trailing
                LE bytes when tag>>2 >= 60
      tag&3==1  copy, 1-byte offset: len 4..11 in bits 2-4, offset
                11 bits (bits 5-7 of the tag are offset bits 8-10)
      tag&3==2  copy, 2-byte LE offset: len 1..64 in tag>>2
      tag&3==3  copy, 4-byte LE offset: len 1..64 in tag>>2
    Copies may overlap (offset < length) -- RLE-style repetition.
    """
    n = len(src)
    # uncompressed length varint
    ulen = 0
    shift = 0
    i = 0
    while True:
        if i >= n:
            raise ValueError("corrupt snappy block: truncated length varint")
        b = src[i]
        i += 1
        ulen |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 35:
            raise ValueError("corrupt snappy block: varint overflow")
    if dst_size is not None and ulen != dst_size:
        raise ValueError(
            f"corrupt snappy block: header says {ulen} bytes, expected {dst_size}"
        )
    out = bytearray()
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:
            llen = tag >> 2
            if llen >= 60:
                nb = llen - 59
                llen = int.from_bytes(src[i : i + nb], "little")
                i += nb
            llen += 1
            out += src[i : i + llen]
            i += llen
            continue
        if kind == 1:
            mlen = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:
            mlen = (tag >> 2) + 1
            offset = src[i] | (src[i + 1] << 8)
            i += 2
        else:
            mlen = (tag >> 2) + 1
            offset = int.from_bytes(src[i : i + 4], "little")
            i += 4
        start = len(out) - offset
        if offset == 0 or start < 0:
            raise ValueError("corrupt snappy block: bad copy offset")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            pattern = bytes(out[start:])
            reps = -(-mlen // offset)
            out += (pattern * reps)[:mlen]
    if len(out) != ulen:
        raise ValueError(
            f"corrupt snappy block: decoded {len(out)} bytes, header said {ulen}"
        )
    return bytes(out)


def bitshuffle(data: bytes, typesize: int) -> bytes:
    """Bit-transpose ``data`` the way c-blosc's bitshuffle filter does
    (github.com/kiyo-masui/bitshuffle; c-blosc blosc/shuffle.c wrapper).

    Elements of ``typesize`` bytes are viewed as typesize*8 bit planes;
    plane k (MSB-first within each byte, matching numpy's default
    ``unpackbits`` order -- the documented unpackbits/transpose/packbits
    equivalence of the reference implementation) is emitted contiguously.
    Only a multiple-of-8 element count bit-transposes; trailing elements
    and remainder bytes are copied verbatim, exactly as the c-blosc
    wrapper does (size -= size % 8; memcpy the leftovers).
    """
    import numpy as np

    nbytes = len(data)
    nelem = nbytes // typesize
    ne8 = nelem - (nelem % 8)
    body = ne8 * typesize
    if ne8 == 0:
        return data
    a = np.frombuffer(data, dtype=np.uint8, count=body).reshape(ne8, typesize)
    planes = np.unpackbits(a, axis=1)  # (ne8, typesize*8), MSB-first
    out = np.packbits(planes.T.reshape(-1))
    return out.tobytes() + data[body:]


def bitunshuffle(data: bytes, typesize: int) -> bytes:
    """Inverse of :func:`bitshuffle` (the decode path for blosc chunks
    carrying the bit-shuffle flag)."""
    import numpy as np

    nbytes = len(data)
    nelem = nbytes // typesize
    ne8 = nelem - (nelem % 8)
    body = ne8 * typesize
    if ne8 == 0:
        return data
    nplanes = typesize * 8
    packed = np.frombuffer(data, dtype=np.uint8, count=body)
    planes = np.unpackbits(packed).reshape(nplanes, ne8)
    a = np.packbits(planes.T.reshape(-1))
    return a.tobytes() + data[body:]
