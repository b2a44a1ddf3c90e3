"""Golden byte vectors ported verbatim from the reference's unit tests
(FIXTURES.md §C) — these pin the byte format before any Spark code runs.

Sources: /root/reference/src/read/decode/rle_v2.rs:760-816,
boolean_rle.rs:160-209, decompress/mod.rs:154-177.
"""

import numpy as np

from orc_format_spark.codecs import boolean_rle, deflate, rle_v2, varint


def test_rle_v2_short_repeat():
    # rle_v2.rs:777-786
    out = rle_v2.decode(bytes([0x0A, 0x27, 0x10]), 5, signed=False)
    assert out.tolist() == [10000] * 5


def test_rle_v2_direct():
    # rle_v2.rs:788-797
    buf = bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF])
    out = rle_v2.decode(buf, 4, signed=False)
    assert out.tolist() == [23713, 43806, 57005, 48879]


def test_rle_v2_delta():
    # rle_v2.rs:799-815 — the primes example
    buf = bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])
    out = rle_v2.decode(buf, 10, signed=False)
    assert out.tolist() == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_rle_v2_encode_reproduces_golden_short_repeat():
    # forced run decomposition: 5 equal values in one frame
    enc = rle_v2.encode(np.full(5, 10000, dtype=np.uint64), signed=False)
    assert enc == bytes([0x0A, 0x27, 0x10])


def test_rle_v2_encode_reproduces_golden_delta():
    enc = rle_v2.encode(np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29], dtype=np.uint64),
                        signed=False)
    assert enc == bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])


def test_zigzag():
    # rle_v2.rs:431-439 semantics
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]:
        assert varint.zigzag_encode_int(v) == z
        assert varint.zigzag_decode_int(z) == v
    arr = np.array([0, -1, 1, -2, 2, -(2**62), 2**62], dtype=np.int64)
    assert (varint.zigzag_decode(varint.zigzag_encode(arr)) == arr).all()


def test_boolean_rle_basic():
    # boolean_rle.rs:164-174
    out = boolean_rle.decode_bools(bytes([0x61, 0x00]), 100)
    assert out.tolist() == [False] * 100


def test_boolean_rle_literals():
    # boolean_rle.rs:176-192
    out = boolean_rle.decode_bools(bytes([0xFE, 0b01000100, 0b01000101]), 16)
    assert out.tolist() == [False, True, False, False, False, True, False, False,
                            False, True, False, False, False, True, False, True]


def test_boolean_rle_spec_example():
    # boolean_rle.rs:194-208 — [0xff, 0x80] = one true then seven false
    out = boolean_rle.decode_bools(bytes([0xFF, 0x80]), 8)
    assert out.tolist() == [True] + [False] * 7


def test_compression_header_original():
    # decompress/mod.rs:158-166 — header [0x0b,0,0] = original, length 5
    assert deflate.decompress(bytes([0x0B, 0x00, 0x00]) + b"abcde") == b"abcde"


def test_compression_header_compressed_length():
    # decompress/mod.rs:168-176 — header [0x40,0x0d,0x03] = compressed, 100_000
    header = int.from_bytes(bytes([0x40, 0x0D, 0x03]), "little")
    assert header & 1 == 0
    assert header >> 1 == 100_000
