"""ORC RLE v1 integer decoding (read-only interop).

The pre-HIVE-8732 integer encoding (ORC file version 0.11): groups are
either a RUN — header byte h in [0,127] meaning h+3 values, followed by a
signed delta byte and a base varint — or LITERALS — header byte h in
[128,255] meaning 256-h plain varints. Signed streams zigzag each varint.

Our writer always emits RLE v2; this decoder exists so files written by
old Hive / ORC 0.11 writers (ColumnEncoding kind DIRECT/DICTIONARY, the
v1 kinds the reference also declares in proto.rs) decode correctly instead
of being mis-read with the v2 frame decoder. Literal groups decode through
the vectorized array-varint kernel; runs are a numpy arange fill.
"""

from __future__ import annotations

import numpy as np

from . import varint


def decode(buf: bytes, n: int, signed: bool) -> np.ndarray:
    """Decode the first ``n`` RLE-v1 values; int64 (signed) / uint64."""
    out = np.zeros(n, dtype=np.int64)
    pos = 0
    got = 0
    mv = memoryview(buf)
    while got < n:
        if pos >= len(buf):
            raise ValueError("RLEv1 stream truncated")
        h = buf[pos]
        pos += 1
        if h < 128:
            length = h + 3
            delta = buf[pos]
            pos += 1
            if delta >= 128:
                delta -= 256
            if signed:
                base, pos = varint.decode_signed(buf, pos)
            else:
                base, pos = varint.decode_unsigned(buf, pos)
            take = min(length, n - got)
            # Fill in uint64 space: an unsigned base >= 2^63 arrives as a
            # Python int, and `int + int64 array` would promote to float64
            # and silently lose low bits. Wrap the base to its 64-bit
            # pattern and add with uint64 wraparound (matching the literal
            # path's view-based handling), then view back as int64.
            base_u = np.uint64(base & 0xFFFFFFFFFFFFFFFF)
            steps = (np.int64(delta)
                     * np.arange(take, dtype=np.int64)).view(np.uint64)
            with np.errstate(over="ignore"):
                out[got:got + take] = (base_u + steps).view(np.int64)
            got += take
        else:
            count = 256 - h
            take = min(count, n - got)
            # Bound the slice to the max varint footprint (10 bytes each):
            # decode_*_array scans its whole input for terminators, so
            # passing mv[pos:] would rescan the full remaining stream per
            # group — O(groups x stream_len) on multi-MB v1 columns.
            lim = mv[pos:pos + take * 10]
            if signed:
                vals, used = varint.decode_signed_array(lim, take)
            else:
                vals, used = varint.decode_unsigned_array(lim, take)
                vals = vals.view(np.int64)
            out[got:got + take] = vals
            pos += used
            got += take
    if signed:
        return out
    return out.view(np.uint64)
