"""ORC WRITER interop: files produced by our pure-Python writer (engine
codecs + hand-assembled protobuf tail) are read bit-identically by the
APACHE ORC reader (pyarrow.orc == ORC C++) — the reverse direction of
tests/test_orc_interop.py, together proving full bidirectional parity."""

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from orc_format_spark import orc_reader, orc_writer


def _mixed_table(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    mask = rng.integers(0, 5, n) == 0

    def nul(arr):
        return pa.array([None if m else v
                         for v, m in zip(arr.to_pylist(), mask)], type=arr.type)
    return pa.table({
        "i64": nul(pa.array(rng.integers(-10**12, 10**12, n))),
        "i16": pa.array(rng.integers(-30000, 30000, n), type=pa.int16()),
        "i8": pa.array(rng.integers(-100, 100, n), type=pa.int8()),
        "f64": pa.array(rng.standard_normal(n)),
        "b": nul(pa.array(rng.integers(0, 2, n).astype(bool))),
        "s_low": pa.array([f"cat-{i % 7}" for i in range(n)]),   # dict path
        "s_high": nul(pa.array([f"u-{i}-{rng.integers(10**9)}" for i in range(n)])),
        "bin": pa.array([bytes([i % 256]) for i in range(n)], type=pa.binary()),
        "dt": pa.array(rng.integers(10000, 20000, n).astype("int32"),
                       type=pa.int32()).cast(pa.date32()),
        "ts": nul(pa.array(np.int64(1.7e15) + rng.integers(0, 10**12, n),
                           type=pa.timestamp("us"))),
        "ts_old": pa.array(np.int64(9e14) + rng.integers(0, 10**12, n),
                           type=pa.timestamp("us")),  # pre-2015 seconds
    })


@pytest.mark.parametrize("comp", ["none", "zlib"])
def test_apache_reader_reads_our_files(tmp_path, comp):
    t = _mixed_table()
    p = str(tmp_path / "ours.orc")
    orc_writer.write_orc(t, p, compression=comp, stripe_rows=1500)  # 3 stripes
    back = orc.read_table(p)  # the APACHE reader is the oracle
    for name in t.column_names:
        e = t[name].combine_chunks()
        g = back[name].combine_chunks().cast(e.type)
        assert e.equals(g), name
    f = orc.ORCFile(p)
    assert f.nstripes == 3 and f.nrows == t.num_rows


def test_our_reader_reads_our_files(tmp_path):
    t = _mixed_table(seed=9)
    p = str(tmp_path / "self.orc")
    orc_writer.write_orc(t, p, compression="zlib")
    got = orc_reader.read_orc(p)
    for name in t.column_names:
        e = t[name].combine_chunks()
        assert e.equals(got[name].combine_chunks().cast(e.type)), name


def test_empty_and_single_row(tmp_path):
    t = pa.table({"x": pa.array([], type=pa.int64()),
                  "s": pa.array([], type=pa.string())})
    p = str(tmp_path / "empty.orc")
    orc_writer.write_orc(t, p)
    assert orc.read_table(p).num_rows == 0
    t1 = pa.table({"x": pa.array([7]), "s": pa.array(["only"])})
    orc_writer.write_orc(t1, str(tmp_path / "one.orc"))
    back = orc.read_table(str(tmp_path / "one.orc"))
    assert back.to_pylist() == t1.to_pylist()


def test_all_null_column(tmp_path):
    t = pa.table({"n": pa.array([None] * 50, type=pa.string()),
                  "k": pa.array(range(50))})
    p = str(tmp_path / "nulls.orc")
    orc_writer.write_orc(t, p)
    back = orc.read_table(p)
    assert back["n"].null_count == 50
    assert back["k"].to_pylist() == list(range(50))


def test_unsupported_type_raises(tmp_path):
    # nested list/struct/map are supported since r3; a genuinely
    # unsupported leaf (duration) must still raise clearly
    t = pa.table({"d": pa.array([1, 2], type=pa.duration("s"))})
    with pytest.raises(NotImplementedError, match="unsupported type"):
        orc_writer.write_orc(t, str(tmp_path / "x.orc"))


def test_spark_write_orc_distributed(spark, tmp_path):
    """Distributed write: every produced file is valid Apache-readable ORC
    and the union equals the input."""
    out = str(tmp_path / "orc_out")
    df = spark.range(0, 10_000).selectExpr(
        "id", "CAST(id % 13 AS STRING) AS cat", "id * 1.5 AS v")
    n_files = orc_writer.spark_write_orc(df.repartition(4), out)
    assert n_files == 4
    import glob
    parts = [orc.read_table(p) for p in sorted(glob.glob(f"{out}/*.orc"))]
    total = pa.concat_tables(parts)
    assert total.num_rows == 10_000
    assert sorted(total["id"].to_pylist()) == list(range(10_000))
