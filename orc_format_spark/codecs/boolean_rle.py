"""Byte-level RLE and the boolean (bit) layer on top, per the reference.

Decode parity (/root/reference/src/read/decode/boolean_rle.rs):
  - header byte as i8: ``h >= 0`` -> run of (h + 3) copies of the next byte
    (3..130); ``h < 0`` -> ``-h`` literal bytes (1..128)
    (boolean_rle.rs:40-63)
  - booleans are the RLE'd bytes expanded MSB-first (mask = 128 >> pos),
    trailing pad bits dropped by the caller-supplied count
    (boolean_rle.rs:89-158; spec example [0xff, 0x80] -> T,F*7)

The reference has a known comment-bug around literal runs ("may require more
than one byte", boolean_rle.rs:54) — we follow the ORC spec (SURVEY.md §4):
literals carry one byte per 8 bools.
"""

from __future__ import annotations

import numpy as np


def encode_bytes(data: bytes | np.ndarray) -> bytes:
    """Byte-level RLE encode (deterministic greedy: repeats ≥3 become runs)."""
    a = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = len(a)
    out = bytearray()
    if n == 0:
        return b""
    # run-length segmentation
    change = np.flatnonzero(np.diff(a)) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    lit_start = None  # start index (in a) of pending literal bytes

    def flush_literals(end: int) -> None:
        nonlocal lit_start
        if lit_start is None:
            return
        i = lit_start
        while i < end:
            chunk = min(end - i, 128)
            out.append((256 - chunk) & 0xFF)  # -chunk as u8
            out.extend(a[i:i + chunk].tobytes())
            i += chunk
        lit_start = None

    for s, ln in zip(starts.tolist(), lengths.tolist()):
        value = a[s]
        if ln >= 3:
            flush_literals(s)
            rem = ln
            while rem >= 3:
                c = min(rem, 130)
                out.append(c - 3)
                out.append(int(value))
                rem -= c
            if rem:
                if lit_start is None:
                    lit_start = s + ln - rem
        else:
            if lit_start is None:
                lit_start = s
    flush_literals(n)
    return bytes(out)


def decode_bytes(buf, n_bytes: int) -> np.ndarray:
    """Decode byte-level RLE until ``n_bytes`` bytes are produced."""
    out = np.empty(n_bytes, dtype=np.uint8)
    filled = 0
    pos = 0
    while filled < n_bytes:
        if pos >= len(buf):
            raise ValueError(f"byte-RLE stream exhausted at {filled}/{n_bytes}")
        header = buf[pos]
        pos += 1
        if header < 128:  # run
            count = header + 3
            value = buf[pos]
            pos += 1
            take = min(count, n_bytes - filled)
            out[filled:filled + take] = value
            filled += take
        else:  # literals
            count = 256 - header
            take = min(count, n_bytes - filled)
            out[filled:filled + take] = np.frombuffer(buf, np.uint8, count=take, offset=pos)
            pos += count
            filled += take
    return out


def encode_bools(bits: np.ndarray) -> bytes:
    """Booleans -> MSB-first packed bits -> byte RLE."""
    packed = np.packbits(np.asarray(bits, dtype=np.uint8))
    return encode_bytes(packed)


def decode_bools(buf, n: int) -> np.ndarray:
    """Decode ``n`` booleans (trailing pad bits dropped, boolean_rle.rs:101)."""
    if n == 0:
        return np.zeros(0, dtype=bool)
    n_bytes = (n + 7) // 8
    packed = decode_bytes(buf, n_bytes)
    return np.unpackbits(packed, count=n).astype(bool)
