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

__all__ = ["lz4_block_decompress"]


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
