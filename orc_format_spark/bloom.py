"""Per-stripe bloom filters for point-lookup pruning on high-cardinality
keys — the BloomFilter-stream analog (reference src/proto.rs:100-111, an
unused model there; load-bearing here).

A stripe's key column gets a small bloom over its distinct values; the
manifest carries it, and a point lookup prunes every stripe whose bloom
misses — min/max stats only help sorted keys, blooms prune on ANY key
(conv_id is hash-bucketed, so every stripe spans the full lexicographic
range and min/max never prunes it).

Layout: varint k, varint n_bits, bitset bytes (little-endian bit order).
Hashing: blake2b-128 per distinct value -> (h1, h2), double hashing
``(h1 + i*h2) % n_bits`` — the standard Kirsch-Mitzenmacher construction.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .codecs import varint

DEFAULT_K = 6
BITS_PER_KEY = 12  # ~0.3% false-positive rate at k=6


def _hash_pair(data: bytes) -> tuple[int, int]:
    d = hashlib.blake2b(data, digest_size=16).digest()
    return (int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little"))


def _canon(value) -> bytes:
    """Canonical bytes for any key value (both build and probe sides)."""
    if isinstance(value, bytes):
        return value
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, (int, np.integer)):
        return int(value).to_bytes(8, "little", signed=True)
    return str(value).encode("utf-8")


def build(values, k: int = DEFAULT_K) -> bytes:
    """Bloom over the DISTINCT values of a stripe column. ``values`` is a
    numpy array, pyarrow array, or iterable; nulls are skipped."""
    import pyarrow as pa
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.drop_null().unique().to_pylist()
    elif isinstance(values, np.ndarray):
        values = np.unique(values).tolist()
    else:
        values = list(dict.fromkeys(values))
    n = max(len(values), 1)
    n_bits = 1 << max(int(np.ceil(np.log2(n * BITS_PER_KEY))), 8)
    bits = np.zeros(n_bits, dtype=bool)
    for v in values:
        if v is None:
            continue
        h1, h2 = _hash_pair(_canon(v))
        for i in range(k):
            bits[(h1 + i * h2) % n_bits] = True
    return (varint.encode_unsigned(k) + varint.encode_unsigned(n_bits)
            + np.packbits(bits, bitorder="little").tobytes())


def might_contain(blob: bytes, value) -> bool:
    """False -> the value is DEFINITELY absent from the stripe's column."""
    if not blob:
        return True  # no bloom recorded: cannot prune
    k, pos = varint.decode_unsigned(blob, 0)
    n_bits, pos = varint.decode_unsigned(blob, pos)
    bits = np.unpackbits(np.frombuffer(blob, np.uint8, offset=pos),
                         bitorder="little", count=n_bits)
    h1, h2 = _hash_pair(_canon(value))
    return all(bits[(h1 + i * h2) % n_bits] for i in range(k))
