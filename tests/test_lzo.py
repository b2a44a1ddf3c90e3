"""LZO1X (ORC CompressionKind LZO = 3) — the last compression kind the
reference leaves as `todo!()` (decompress/mod.rs:80-93) and the last one
this repo had marked unsupported. No Python LZO library exists in this
environment, so codecs/lz77.py implements the raw LZO1X block format from
its public spec (oberhumer LZO.FORMAT / the kernel's
lzo1x_decompress_safe.c), BOTH directions.

Validation is three independent oracles:
  1. pure roundtrip fuzz (ours -> ours),
  2. cross-implementation: aircompressor's Java LzoCompressor /
     LzoDecompressor (the codec Hadoop/Spark ORC itself links, on the
     Spark classpath as aircompressor-2.0.3.jar) — both directions,
  3. whole-file interop: ORC files our writer emits with compression=lzo
     read bit-identically through the Apache ORC C++ reader (pyarrow.orc).

py4j note: byte[] return values materialize as immutable Python bytes and
byte[] arguments are copied per call, so an output byte[] mutated JVM-side
is invisible from Python. The JVM helpers below therefore use the
Compressor/Decompressor ByteBuffer overloads (ByteBuffer stays a JVM
handle) and read results back via the backing array.
"""

import random

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from orc_format_spark import orc_reader, orc_writer
from orc_format_spark.codecs.lz77 import lzo1x_compress, lzo1x_decompress


def _fuzz_cases(seed=7, n_random=150):
    rng = random.Random(seed)
    words = [b"user", b"assistant", b"tool_call", b"spark", b"stripe",
             b"the quick brown fox", b"0123456789"]
    cases = [
        b"",
        b"a",
        b"abc",
        b"abcd",                      # exactly one hash-4 key, no match
        b"hello world " * 400,        # long repetitive: M3/M4 + extensions
        b" ".join(rng.choices(words, k=3000)),
        bytes(rng.randrange(256) for _ in range(10000)),  # incompressible
        b"\x00" * 100000,             # max-length run extensions
        (b"0123456789abcdef" * 64 + b"X") * 37,
        bytes(rng.choices(b"abcd", k=50000)),
    ]
    for _ in range(n_random):          # run/random interleavings
        n = rng.randrange(0, 3000)
        parts = []
        while sum(map(len, parts)) < n:
            if rng.random() < 0.5:
                parts.append(bytes([rng.randrange(256)])
                             * rng.randrange(1, 300))
            else:
                parts.append(bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(1, 100))))
        cases.append(b"".join(parts)[:n])
    return cases


def test_lzo1x_roundtrip_fuzz():
    for i, c in enumerate(_fuzz_cases()):
        enc = lzo1x_compress(c)
        assert lzo1x_decompress(enc) == c, (i, len(c))


def test_lzo1x_strict_stream_checks():
    assert lzo1x_decompress(b"") == b""   # aircompressor's empty-input form
    with pytest.raises(ValueError):
        lzo1x_decompress(b"\x12")                   # truncated
    with pytest.raises(ValueError):
        lzo1x_decompress(b"\x12a")                  # no terminator
    with pytest.raises(ValueError):
        lzo1x_decompress(lzo1x_compress(b"xyz") + b"\x00")  # trailing bytes
    assert lzo1x_compress(b"") == b""               # aircompressor form
    assert lzo1x_decompress(b"\x11\x00\x00") == b""  # bare terminator ok


def _jvm_lzo(spark):
    jvm = spark._jvm
    comp = jvm.io.airlift.compress.lzo.LzoCompressor()
    decomp = jvm.io.airlift.compress.lzo.LzoDecompressor()
    BB = jvm.java.nio.ByteBuffer

    def j_compress(raw: bytes) -> bytes:
        bo = BB.allocate(comp.maxCompressedLength(len(raw)))
        comp.compress(BB.wrap(raw), bo)
        return bytes(bo.array())[:bo.position()]

    def j_decompress(buf: bytes, out_len: int) -> bytes:
        bo = BB.allocate(out_len)
        decomp.decompress(BB.wrap(buf), bo)
        return bytes(bo.array())[:bo.position()]

    return j_compress, j_decompress


def test_lzo1x_cross_validates_against_aircompressor(spark):
    """Bidirectional cross-implementation oracle against the Java LZO codec
    Spark's own ORC reader uses: every byte stream our encoder emits must
    decode on their side, and every stream their encoder emits must decode
    on ours."""
    j_compress, j_decompress = _jvm_lzo(spark)
    for i, c in enumerate(_fuzz_cases(seed=11, n_random=25)):
        je = j_compress(c)
        assert lzo1x_decompress(je) == c, f"case {i}: java->ours"
        pe = lzo1x_compress(c)
        assert j_decompress(pe, len(c)) == c, f"case {i}: ours->java"


def _mixed_table(n=5000):
    rng = random.Random(3)
    return pa.table({
        "i": pa.array([rng.randrange(1000) if i % 97 else None
                       for i in range(n)], type=pa.int64()),
        "s": pa.array([f"doc-{i % 37}-{'x' * (i % 11)}" for i in range(n)]),
        "f": pa.array([rng.gauss(0, 1) for _ in range(n)],
                      type=pa.float64()),
        "b": pa.array([i % 3 == 0 for i in range(n)]),
    })


def test_write_side_lzo_orc_file_interop(tmp_path):
    """Whole-file oracle: our LZO ORC file reads bit-identically through
    BOTH the Apache ORC C++ reader (pyarrow.orc — validates every section's
    on-wire LZO bytes against an implementation we didn't write) and our
    own reader, including under a row index; the postscript really claims
    kind 3 (not silently zlib)."""
    t = _mixed_table()
    p = str(tmp_path / "ours_lzo.orc")
    orc_writer.write_orc(t, p, compression="lzo", stripe_rows=1500,
                         row_index_stride=700)
    back_apache = orc.read_table(p)
    back_ours = orc_reader.read_orc(p)
    for name in t.column_names:
        e = t.column(name).combine_chunks()
        assert back_apache.column(name).combine_chunks().cast(e.type) \
            .equals(e), f"apache/{name}"
        assert back_ours.column(name).combine_chunks().cast(e.type) \
            .equals(e), f"ours/{name}"
    ps, _ = orc_reader.read_tail(p)
    assert ps["compression"] == 3


def test_read_side_lzo_sections_via_framing(tmp_path):
    """orc_reader._decompress(kind=3) under the 3-byte chunk framing:
    compressed chunks and is-original chunks both route correctly."""
    from orc_format_spark.codecs import deflate
    payload = b"assistant says " * 1000           # compresses
    framed = deflate.frame(payload, lzo1x_compress)
    assert orc_reader._decompress(framed, 3) == payload
    rnd = bytes(random.Random(5).randrange(256) for _ in range(4096))
    framed2 = deflate.frame(rnd, lzo1x_compress)  # stays is-original
    assert orc_reader._decompress(framed2, 3) == rnd
