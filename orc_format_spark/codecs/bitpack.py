"""Big-endian bit-packing.

Our ENCODER emits only the reference's aligned width table — other width
codes hit ``todo!()`` in the reference decoder
(/root/reference/src/read/decode/rle_v2.rs:21-58) — and value ``i`` occupies
bits ``[i*w, (i+1)*w)`` MSB-first (rle_v2.rs:104-123 ``unpack``).

Our DECODER accepts the FULL ORC width-code table (public ORC v1 spec,
``decodeBitWidth``): codes 0-23 map to widths 1-24, then 26/28/30/32/40/48/
56/64 — real ORC writers (ORC C++/Java) use every width, and the interop
reader (orc_reader.py) decodes their streams with these codecs. The aligned
table is a consistent subset (same codes), so our own streams decode
unchanged.
"""

from __future__ import annotations

import numpy as np

# width -> 5-bit header code, per rle_v2_direct_bit_width (rle_v2.rs:21-36)
WIDTH_TO_CODE = {1: 0, 2: 1, 4: 3, 8: 7, 16: 15, 24: 23, 32: 27, 40: 28, 48: 29, 56: 30, 64: 31}
# full ORC decodeBitWidth table: every code a real writer may emit
CODE_TO_WIDTH = {**{c: c + 1 for c in range(24)},
                 24: 26, 25: 28, 26: 30, 27: 32, 28: 40, 29: 48, 30: 56, 31: 64}
ALIGNED_WIDTHS = (1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64)
# delta runs use the same table with 0 -> 0 (fixed-delta) and no width 1
# (rle_v2_delta_bit_width, rle_v2.rs:43-58)
DELTA_WIDTHS = (0, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64)


def closest_fixed_bits(n: int) -> int:
    """ORC ``getClosestFixedBits``: 1-24 stay as-is, then the sparse tail.
    Patch-list entries are packed at this width (it is DERIVED by readers
    from gap+patch widths, never coded in the stream, so both sides must
    use the spec's rounding — aligned rounding here would be out of spec)."""
    if n <= 1:
        return 1
    if n <= 24:
        return n
    for w in (26, 28, 30, 32, 40, 48, 56, 64):
        if n <= w:
            return w
    raise ValueError(f"width {n} exceeds 64")

_ALIGNED_ARR = np.array(ALIGNED_WIDTHS, dtype=np.int64)


def bits_needed(max_value: int) -> int:
    """Bit length of an unsigned max value (≥1 so zero still packs)."""
    return max(int(max_value).bit_length(), 1)


def round_width(bits: int, delta: bool = False) -> int:
    """Smallest aligned width ≥ ``bits`` (delta table excludes width 1)."""
    table = DELTA_WIDTHS if delta else ALIGNED_WIDTHS
    for w in table:
        if w >= bits and (w > 0 or bits == 0):
            return w
    raise ValueError(f"width {bits} exceeds 64")


_WIDTH_THRESHOLDS = np.array([1 << w for w in ALIGNED_WIDTHS[:-1]],
                             dtype=np.uint64)  # value fits width w iff v < 2^w


def element_widths(values: np.ndarray) -> np.ndarray:
    """Per-element aligned width (for patched-base percentile analysis).
    One searchsorted pass instead of one compare+assign pass per width."""
    v = values.astype(np.uint64, copy=False)
    idx = np.searchsorted(_WIDTH_THRESHOLDS, v, side="right")
    return _ALIGNED_ARR[idx]


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values big-endian at an aligned ``width``."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    if width % 8 == 0:
        nb = width // 8
        be = v.astype(">u8").view(np.uint8).reshape(n, 8)
        return be[:, 8 - nb:].tobytes()
    # sub-byte widths 1, 2, 4: expand to a bit matrix, MSB-first, pack
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def unpack(buf, width: int, n: int, offset: int = 0) -> np.ndarray:
    """Unpack ``n`` uint64 values at aligned ``width`` from ``buf[offset:]``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width % 8 == 0:
        nb = width // 8
        a = np.frombuffer(buf, dtype=np.uint8, count=n * nb, offset=offset).reshape(n, nb)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, 8 - nb:] = a
        return out.reshape(-1).view(">u8").astype(np.uint64)
    nbytes = (n * width + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(raw, count=n * width).reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8
