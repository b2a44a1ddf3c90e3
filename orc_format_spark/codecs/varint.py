"""LEB128 varints and zigzag, matching the reference decoder.

Reference semantics:
  - unsigned varint: little-endian base-128, ≤10 bytes
    (/root/reference/src/read/decode/rle_v2.rs:71-89)
  - zigzag decode: ``z & 1 == 0 ? z >> 1 : !(z >> 1)``
    (/root/reference/src/read/decode/rle_v2.rs:91-98)
  - signed varint = zigzag(unsigned varint)
    (/root/reference/src/read/decode/rle_v2.rs:100-102)
"""

from __future__ import annotations

import numpy as np

_U64_MASK = (1 << 64) - 1


def encode_unsigned(value: int) -> bytes:
    """Unsigned LEB128 encode of a value in [0, 2^64)."""
    value &= _U64_MASK
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_unsigned(buf, pos: int) -> tuple[int, int]:
    """Decode one unsigned LEB128 varint at ``pos``; return (value, new_pos)."""
    value = 0
    shift = 0
    for j in range(10):
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if b < 0x80:
            return value & _U64_MASK, pos
        shift += 7
    raise ValueError("varint longer than 10 bytes (out of spec)")


def zigzag_encode_int(v: int) -> int:
    """Zigzag a signed 64-bit int to unsigned."""
    return ((v << 1) ^ (v >> 63)) & _U64_MASK


def zigzag_decode_int(z: int) -> int:
    """Inverse of :func:`zigzag_encode_int` (matches rle_v2.rs:91-98)."""
    if z & 1 == 0:
        return z >> 1
    return ~(z >> 1)


def encode_signed(value: int) -> bytes:
    return encode_unsigned(zigzag_encode_int(value))


def decode_signed(buf, pos: int) -> tuple[int, int]:
    z, pos = decode_unsigned(buf, pos)
    return zigzag_decode_int(z), pos


def encode_unsigned_array(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array: ≤10 numpy passes (one
    per possible varint byte), no per-value Python."""
    z = values.astype(np.uint64, copy=False)
    n = len(z)
    if n == 0:
        return b""
    # bytes per value: 1 + #thresholds passed (value >= 2^(7k))
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (z >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offs[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        byte = ((z[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1) > j
        out[offs[sel] + j] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def decode_unsigned_array(buf: bytes, n: int) -> tuple[np.ndarray, int]:
    """Vectorized LEB128 decode of the FIRST ``n`` varints in ``buf``:
    continuation-bit scan + ≤10 gather passes. Returns (uint64 array,
    bytes consumed)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 0
    raw = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(raw < 0x80)
    if len(ends) < n:
        raise ValueError("varint stream truncated")
    ends = ends[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if int(lengths.max()) > 10:
        raise ValueError("varint longer than 10 bytes (out of spec)")
    if int(lengths.max()) == 10:
        # A 10-byte varint's last byte holds bits 63..69; a uint64 value
        # only uses bit 63, so anything above 1 means the encoded value
        # exceeds 64 bits and would otherwise wrap SILENTLY (e.g. an
        # Apache-written decimal mantissa 2^63+5 decoding as 5).
        last = raw[ends[lengths == 10]] & np.uint8(0x7F)
        if (last > 1).any():
            raise ValueError("varint overflows uint64 (value needs >64 bits)")
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        sel = lengths > j
        vals[sel] |= ((raw[starts[sel] + j] & np.uint8(0x7F))
                      .astype(np.uint64) << np.uint64(7 * j))
    return vals, int(ends[-1]) + 1


def encode_signed_array(values: np.ndarray) -> bytes:
    return encode_unsigned_array(zigzag_encode(np.asarray(values)))


def decode_signed_array(buf: bytes, n: int) -> tuple[np.ndarray, int]:
    z, consumed = decode_unsigned_array(buf, n)
    return zigzag_decode(z), consumed


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized zigzag int64 -> uint64."""
    v = values.astype(np.int64, copy=False)
    return (v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Vectorized zigzag uint64 -> int64."""
    z = values.astype(np.uint64, copy=False)
    half = (z >> np.uint64(1)).astype(np.int64)
    sign = -(z & np.uint64(1)).astype(np.int64)
    return half ^ sign
