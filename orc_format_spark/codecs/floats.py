"""Raw little-endian IEEE float streams (non-null values only).

Parity: /root/reference/src/read/decode/float.rs:34-91 — fixed-width LE
IEEE 754, one value per 4 (f32) / 8 (f64) bytes, bit-preserving (NaN payloads
survive the round-trip because we never go through Python floats).
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray, dtype: str = "float64") -> bytes:
    kind = "<f4" if dtype == "float32" else "<f8"
    return np.asarray(values).astype(kind, copy=False).tobytes()


def decode(buf, n: int, dtype: str = "float64") -> np.ndarray:
    kind = "<f4" if dtype == "float32" else "<f8"
    return np.frombuffer(buf, dtype=kind, count=n)
