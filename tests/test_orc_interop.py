"""Real-ORC interop: files written by the APACHE ORC writer (pyarrow.orc ==
ORC C++) are decoded bit-identically by our pure-Python tail reader +
codecs. Mirrors the reference's end-to-end contract
(/root/reference/tests/it/main.rs:26-316 over write.py's golden column
families), with the golden data recreated via pyarrow since pyorc is not in
this environment."""

import numpy as np
import pyarrow as pa
import pyarrow.orc as orc
import pytest

from orc_format_spark import orc_reader


def _roundtrip(tbl: pa.Table, tmp_path, **write_kw) -> pa.Table:
    p = str(tmp_path / "t.orc")
    orc.write_table(tbl, p, **write_kw)
    return orc_reader.read_orc(p)


def _assert_tables_equal(exp: pa.Table, got: pa.Table):
    assert exp.column_names == got.column_names
    for name in exp.column_names:
        e = exp[name].combine_chunks()
        g = got[name].combine_chunks().cast(e.type)
        assert e.equals(g), f"column {name}: {e.to_pylist()[:8]} != {g.to_pylist()[:8]}"


# the reference's write.py golden column families (write.py:5-22), which
# tests/it/main.rs:26-176 asserts column by column
_GOLDEN = {
    "a": pa.array([1.0, 2.0, None, 4.0, 5.0], type=pa.float32()),
    "b": pa.array([True, False, None, True, False]),
    "str_direct": pa.array(["a", "cccccc", None, "ddd", "ee"]),
    "d": pa.array(["a", "bb", None, "ccc", "ddd"]),
    "e": pa.array(["ddd", "cc", None, "bb", "a"]),
    "f": pa.array(["aaaaa", "bbbbb", None, "ccccc", "ddddd"]),
    "int_short_repeated": pa.array([5, 5, None, 5, 5], type=pa.int32()),
    "int_neg_short_repeated": pa.array([-5, -5, None, -5, -5], type=pa.int32()),
    "int_delta": pa.array([1, 2, None, 4, 5], type=pa.int32()),
    "int_neg_delta": pa.array([5, 4, None, 2, 1], type=pa.int32()),
    "int_direct": pa.array([1, 6, None, 3, 2], type=pa.int32()),
    "int_neg_direct": pa.array([-1, -6, None, -3, -2], type=pa.int32()),
    "bigint_direct": pa.array([1, 6, None, 3, 2], type=pa.int64()),
    "bigint_neg_direct": pa.array([-1, -6, None, -3, -2], type=pa.int64()),
    "bigint_other": pa.array([5, -5, 1, 5, 5], type=pa.int64()),
    "utf8_increase": pa.array(["a", "bb", "ccc", "dddd", "eeeee"]),
    "utf8_decrease": pa.array(["eeeee", "dddd", "ccc", "bb", "a"]),
}


@pytest.mark.parametrize("comp", ["uncompressed", "zlib"])
def test_reference_golden_families(tmp_path, comp):
    """The test.orc families (main.rs read_bool/read_str_*/read_int_*)."""
    tbl = pa.table(_GOLDEN)
    got = _roundtrip(tbl, tmp_path, compression=comp)
    _assert_tables_equal(tbl, got)
    # spot-assert the exact values main.rs pins (main.rs:30-33, 42-45)
    assert got["b"].to_pylist() == [True, False, None, True, False]
    assert got["str_direct"].to_pylist() == ["a", "cccccc", None, "ddd", "ee"]


@pytest.mark.parametrize("comp", ["uncompressed", "zlib"])
def test_long_bool_and_strings(tmp_path, comp):
    """long_bool.orc / string_long.orc / string_dict.orc families
    (main.rs:178-316): 32 trues, alternating strings, dictionary path."""
    tbl = pa.table({
        "long": pa.array([True] * 32),
        "dict": pa.array((["abcd", "efgh"] * 16)),
        "dict_heavy": pa.array((["abc", "efgh"] * 5000)[:32] * 1),
    })
    got = _roundtrip(tbl, tmp_path, compression=comp)
    _assert_tables_equal(tbl, got)


def test_string_long_long_dictionary(tmp_path):
    """10^4 alternating strings — the ORC C++ writer picks DICTIONARY_V2
    here; decode goes through our dict-codes path (string_long_long.orc)."""
    vals = ["abcd", "efgh"] * (10**4 // 2)
    tbl = pa.table({"dict": pa.array(vals)})
    for comp in ("uncompressed", "zlib"):
        got = _roundtrip(tbl, tmp_path, compression=comp)
        assert got["dict"].to_pylist() == vals


def test_f32_long_zlib(tmp_path):
    """10^5 random floats under zlib (f32_long_long_gzip.orc, scaled down)."""
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 1, 10**5).astype(np.float32)
    tbl = pa.table({"dict": pa.array(vals)})
    got = _roundtrip(tbl, tmp_path, compression="zlib")
    assert np.array_equal(got["dict"].to_numpy(), vals)  # bit-identical


def test_all_int_widths_and_rlev2_forms(tmp_path):
    """Data shaped to force every RLEv2 form (short-repeat, direct, delta,
    patched-base) and unaligned bit widths from the C++ writer."""
    rng = np.random.default_rng(11)
    n = 4096
    base = rng.integers(0, 7, n)            # 3-bit direct (unaligned width)
    patched = rng.integers(0, 100, n)
    patched[rng.integers(0, n, 20)] = 10**12  # outliers -> patched-base
    tbl = pa.table({
        "w3": pa.array(base),
        "sr": pa.array(np.full(n, 42)),
        "delta": pa.array(np.arange(n) * 3),
        "patched": pa.array(patched),
        "wide": pa.array(rng.integers(-2**62, 2**62, n)),
    })
    for comp in ("uncompressed", "zlib"):
        got = _roundtrip(tbl, tmp_path, compression=comp)
        _assert_tables_equal(tbl, got)


def test_timestamps_pre_and_post_2015(tmp_path):
    """ORC timestamps are seconds-from-2015 + scaled nanos; both signs."""
    us = np.array([
        1420070400_000000,            # exactly the ORC epoch
        1700000000_123456,            # post-2015 with sub-second
        900000000_000001,             # pre-2015 (negative seconds) + 1us
        0,                            # unix epoch
        -5000000,                     # pre-1970
    ], dtype=np.int64)
    tbl = pa.table({"ts": pa.array(us, type=pa.timestamp("us"))})
    got = _roundtrip(tbl, tmp_path)
    exp = orc.read_table(str(tmp_path / "t.orc"))  # Apache reader as oracle
    assert got["ts"].combine_chunks().cast(exp["ts"].type).equals(exp["ts"].combine_chunks())


def test_decimal_column(tmp_path):
    import decimal
    vals = [decimal.Decimal("123.45"), None, decimal.Decimal("-0.01"),
            decimal.Decimal("99999.99"), decimal.Decimal("0.00")]
    tbl = pa.table({"d": pa.array(vals, type=pa.decimal128(10, 2))})
    got = _roundtrip(tbl, tmp_path)
    assert got["d"].to_pylist() == vals


def test_multi_stripe_file(tmp_path):
    """Small stripe size forces several stripes; all are read and stitched."""
    n = 200_000
    tbl = pa.table({"x": pa.array(np.arange(n)),
                    "s": pa.array([f"r{i % 100}" for i in range(n)])})
    p = str(tmp_path / "multi.orc")
    orc.write_table(tbl, p, stripe_size=64 * 1024)
    f = orc.ORCFile(p)
    assert f.nstripes > 1
    got = orc_reader.read_orc(p)
    _assert_tables_equal(tbl, got)


def test_all_null_and_empty_strings(tmp_path):
    tbl = pa.table({
        "all_null": pa.array([None] * 10, type=pa.int64()),
        "empty_strs": pa.array(["", "", "x", "", ""] * 2),
    })
    got = _roundtrip(tbl, tmp_path)
    _assert_tables_equal(tbl, got)


def test_nested_list_reads_from_apache_file(tmp_path):
    """Nested list columns read back from an Apache-written file (was a
    loud error pre-r3)."""
    tbl = pa.table({"l": pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))})
    p = str(tmp_path / "nested.orc")
    orc.write_table(tbl, p)
    got = orc_reader.read_orc(p)
    assert got.column("l").combine_chunks().equals(
        tbl.column("l").combine_chunks())


def test_not_an_orc_file_raises(tmp_path):
    p = tmp_path / "junk.orc"
    p.write_bytes(b"PAR1 definitely not orc")
    with pytest.raises(ValueError, match="not an ORC file"):
        orc_reader.read_orc(str(p))


def test_spark_read_orc_distributed(spark, tmp_path):
    """spark_read_orc: one file per task, decoded with OUR reader."""
    paths = []
    for i in range(4):
        tbl = pa.table({"x": pa.array(np.arange(i * 100, (i + 1) * 100)),
                        "s": pa.array([f"f{i}-{j}" for j in range(100)])})
        p = str(tmp_path / f"part{i}.orc")
        orc.write_table(tbl, p)
        paths.append(p)
    df = orc_reader.spark_read_orc(spark, paths)
    got = df.orderBy("x").toPandas()
    assert got["x"].tolist() == list(range(400))
    assert got["s"].iloc[0] == "f0-0" and got["s"].iloc[399] == "f3-99"


def _nested_table():
    import pyarrow as pa
    return pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "nums": pa.array([[1, 2], [3], None, []], type=pa.list_(pa.int64())),
        "meta": pa.array(
            [{"a": 1, "b": "x"}, {"a": 2, "b": None}, None,
             {"a": None, "b": "z"}],
            type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "props": pa.array([[("k", 1), ("j", 2)], [], None, [("z", 9)]],
                          type=pa.map_(pa.string(), pa.int64())),
        "deep": pa.array([[{"q": 1.5}], None, [{"q": None}, {"q": 2.5}], []],
                         type=pa.list_(pa.struct([("q", pa.float64())]))),
    })


def test_nested_orc_write_read_self():
    """list / struct / map / list<struct> with nulls at every level through
    our writer + our reader."""
    from orc_format_spark import orc_reader, orc_writer
    tbl = _nested_table()
    back = orc_reader.read_orc_bytes(orc_writer.write_orc_bytes(tbl))
    for c in tbl.column_names:
        assert back.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), c


def test_nested_orc_apache_reads_ours():
    import io
    import pyarrow.orc as po
    from orc_format_spark import orc_writer
    tbl = _nested_table()
    ap = po.ORCFile(io.BytesIO(orc_writer.write_orc_bytes(tbl))).read()
    for c in tbl.column_names:
        assert ap.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), c


def test_nested_orc_we_read_apache():
    import io
    import pyarrow.orc as po
    from orc_format_spark import orc_reader
    tbl = _nested_table()
    buf = io.BytesIO()
    po.write_table(tbl, buf)
    ours = orc_reader.read_orc_bytes(buf.getvalue())
    for c in tbl.column_names:
        assert ours.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), c


def test_spark_read_orc_stripe_granular(spark, tmp_path):
    """A multi-stripe file fans out across >1 plan partition, each task
    reading only its stripe's byte range; rows and values survive."""
    import numpy as np
    import pyarrow as pa
    from orc_format_spark import orc_reader, orc_writer
    n = 4000
    tbl = pa.table({
        "id": pa.array(np.arange(n)),
        "txt": pa.array([f"row-{i % 37}" for i in range(n)]),
    })
    path = str(tmp_path / "multi.orc")
    orc_writer.write_orc(tbl, path, stripe_rows=1000)
    ps, footer = orc_reader.read_tail(path)
    assert len(footer["stripes"]) == 4
    df = orc_reader.spark_read_orc(spark, [path])
    assert df.rdd.getNumPartitions() >= 2  # stripes spread across tasks
    got = df.toPandas().sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(range(n))
    assert got["txt"][7] == "row-7"


def test_decimal_interop_vectorized_both_ways():
    """1M-row decimal ORC interop runs in seconds (vectorized varint
    streams), byte-validated against the Apache C++ reader."""
    import io
    import time
    import numpy as np
    import pyarrow as pa
    import pyarrow.orc as po
    from orc_format_spark import orc_reader, orc_writer
    n = 200_000
    mant = np.random.default_rng(0).integers(-10**17, 10**17, n)
    words = np.empty((n, 2), dtype=np.int64)
    words[:, 0] = mant
    words[:, 1] = mant >> 63
    arr = pa.Array.from_buffers(pa.decimal128(18, 4), n,
                                [None, pa.py_buffer(words.tobytes())])
    tbl = pa.table({"d": arr})
    t0 = time.perf_counter()
    raw = orc_writer.write_orc_bytes(tbl)
    back = orc_reader.read_orc_bytes(raw)
    dt = time.perf_counter() - t0
    assert back.column("d").combine_chunks().equals(arr)
    assert dt < 10, f"decimal interop too slow: {dt:.1f}s for {n} rows"
    ap = po.ORCFile(io.BytesIO(raw)).read()
    assert ap.column("d").combine_chunks().equals(arr)


def test_rle_v1_file_version_011_decodes():
    """ORC file version 0.11 (pre-HIVE-8732): every varint-RLE stream is
    RLE v1 and ColumnEncoding kinds are DIRECT/DICTIONARY. Validated
    against the Apache C++ writer — runs, literals, v1 dictionary strings,
    timestamps, lists, and nulls."""
    import datetime
    import io
    import numpy as np
    from orc_format_spark import orc_reader
    rng = np.random.default_rng(0)
    n = 5000
    tbl = pa.table({
        "run": pa.array(np.arange(n)),
        "lit": pa.array(rng.integers(-10**9, 10**9, n)),
        "s": pa.array([f"v{i % 7}" for i in range(n)]),
        "txt": pa.array([f"unique-{i}" for i in range(n)]),
        "maybe": pa.array([None if i % 5 == 0 else i for i in range(n)],
                          type=pa.int64()),
        "ts": pa.array([datetime.datetime(2020, 1, 1)
                        + datetime.timedelta(seconds=int(i))
                        for i in range(n)], type=pa.timestamp("us")),
        "ls": pa.array([[i, i + 1] if i % 3 else None for i in range(n)],
                       type=pa.list_(pa.int64())),
    })
    buf = io.BytesIO()
    orc.write_table(tbl, buf, file_version="0.11")
    got = orc_reader.read_orc_bytes(buf.getvalue())
    for c in tbl.column_names:
        assert got.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), c


def test_union_column_roundtrip_and_apache_reads_ours():
    """Dense union through our writer/reader (tag byte-RLE + per-tag child
    columns, Kind::Union = the one type the reference only declares,
    src/proto.rs:196). pyarrow.orc cannot WRITE unions, so the strong
    cross-check is the Apache C++ reader consuming OUR union file."""
    import io
    from orc_format_spark import orc_reader, orc_writer
    tags = pa.array([0, 1, 0, 0, 1, 1], type=pa.int8())
    offs = pa.array([0, 0, 1, 2, 1, 2], type=pa.int32())
    u = pa.UnionArray.from_dense(tags, offs, [
        pa.array([10, 20, 30], type=pa.int64()),
        pa.array(["a", "b", "c"])], ["num", "txt"])
    tbl = pa.table({"id": pa.array([1, 2, 3, 4, 5, 6]), "u": u})
    raw = orc_writer.write_orc_bytes(tbl)
    back = orc_reader.read_orc_bytes(raw)
    assert back.column("u").combine_chunks().to_pylist() == u.to_pylist()
    ap = orc.ORCFile(io.BytesIO(raw)).read()
    assert ap.column("u").combine_chunks().to_pylist() == u.to_pylist()


@pytest.mark.parametrize("comp", ["snappy", "lz4", "zstd"])
def test_snappy_and_lz4_orc_files_decode(tmp_path, comp):
    """SNAPPY(2)/LZ4(4) section compression — `todo!()` in the reference
    (decompress/mod.rs:80-88) — via pure-Python block decoders, and ZSTD(5)
    via pyarrow's bundled codec, all under the same 3-byte chunk framing,
    validated against the Apache C++ writer."""
    n = 50_000
    tbl = pa.table({
        "i": pa.array(np.arange(n)),
        "s": pa.array([f"value-{i % 997}-{'x' * (i % 13)}"
                       for i in range(n)]),
        "f": pa.array(np.random.default_rng(0).uniform(0, 1, n)),
        "nul": pa.array([None if i % 9 == 0 else i for i in range(n)],
                        type=pa.int64()),
    })
    p = str(tmp_path / f"c_{comp}.orc")
    orc.write_table(tbl, p, compression=comp)
    got = orc_reader.read_orc(p)
    for c in tbl.column_names:
        assert got.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), (comp, c)


def test_rich_tool_calls_shape_through_orc(tmp_path):
    """The transcripts tool_calls shape (list -> struct -> struct -> map,
    plus timestamp fields, nulls at every level) through the real-ORC
    writer/reader — and the Apache C++ reader consumes our file with equal
    values."""
    import pyarrow as pa
    from orc_format_spark import orc_reader, orc_writer

    t = pa.table({
        "conv_id": pa.array(["a", "b", "c"]),
        "tool_calls": pa.array(
            [[{"call_id": "a-0",
               "fn": {"name": "bash", "args": [("q", "x"), ("turn", "0")]},
               "at": 1700000000000000}],
             None,
             [{"call_id": "c-1", "fn": {"name": "grep", "args": []},
               "at": None},
              {"call_id": "c-2", "fn": None, "at": 1700000001000000}]],
            type=pa.list_(pa.struct([
                ("call_id", pa.string()),
                ("fn", pa.struct([
                    ("name", pa.string()),
                    ("args", pa.map_(pa.string(), pa.string()))])),
                ("at", pa.timestamp("us"))]))),
    })
    path = str(tmp_path / "rich.orc")
    orc_writer.write_orc(t, path)
    back = orc_reader.read_orc(path)
    assert back.cast(t.schema).to_pylist() == t.to_pylist()
    pao = pytest.importorskip("pyarrow.orc")
    apache = pao.read_table(path)
    assert apache.cast(t.schema).to_pylist() == t.to_pylist()


def test_orc_column_pruning_decodes_only_selected(tmp_path, monkeypatch):
    """columns=[...] reads only those columns' streams per stripe (the
    reference's per-column slicing contract, src/read/mod.rs:117-159):
    instrumented _decode_column sees exactly the selected column ids, and
    values match the Apache writer's."""
    n = 4000
    rng = np.random.default_rng(5)
    tbl = pa.table({
        "a": pa.array(np.arange(n)),
        "b": pa.array([f"text-{i}" for i in range(n)]),
        "c": pa.array(rng.standard_normal(n)),
        "d": pa.array(rng.integers(0, 100, n)),
    })
    p = str(tmp_path / "wide.orc")
    orc.write_table(tbl, p)

    seen = []
    real = orc_reader._decode_column

    def spy(stripe_buf, sf, col_id, typ, n_rows, comp, types=None):
        seen.append(col_id)
        return real(stripe_buf, sf, col_id, typ, n_rows, comp, types)

    monkeypatch.setattr(orc_reader, "_decode_column", spy)
    got = orc_reader.read_orc(p, columns=["b", "d"])
    assert got.column_names == ["b", "d"]
    # file col ids: 0=root struct, then a=1, b=2, c=3, d=4
    assert set(seen) == {2, 4}, seen
    assert got.column("b").combine_chunks().equals(tbl.column("b").combine_chunks())
    assert got.column("d").combine_chunks().equals(tbl.column("d").combine_chunks())
    with pytest.raises(KeyError):
        orc_reader.read_orc(p, columns=["nope"])


def test_orc_stripe_pruning_point_lookup(tmp_path, spark):
    """A point lookup on a multi-stripe file plans FEWER stripes than exist
    (Metadata-section per-stripe ColumnStatistics, the RowIndex/stats model
    the reference declares in src/proto.rs:88-99), and the values coming
    back through spark_read_orc + residual filter are exact."""
    n = 60_000
    tbl = pa.table({
        "id": pa.array(np.arange(n)),
        "payload": pa.array([f"row-{i:07d}" * 3 for i in range(n)]),
    })
    p = str(tmp_path / "multi.orc")
    orc.write_table(tbl, p, stripe_size=64 * 1024)
    _, footer, stats = orc_reader.read_tail(p, with_stats=True)
    n_stripes = len(footer["stripes"])
    assert n_stripes >= 4, "fixture must be multi-stripe"
    assert len(stats) == n_stripes and stats[0][1]["kind"] == "int"

    target = 51_234
    plans, _, _, _, n_pruned = orc_reader._plan_stripes(
        [p], ("id", "=", target))
    assert n_pruned >= 1 and len(plans) < n_stripes, (len(plans), n_stripes)

    df = orc_reader.spark_read_orc(spark, [p], columns=["id", "payload"],
                                   predicate=("id", "=", target))
    from pyspark.sql import functions as F
    row = df.filter(F.col("id") == target).collect()
    assert len(row) == 1 and row[0]["payload"] == f"row-{target:07d}" * 3
    # range predicate prunes too and stays exact
    plans2, _, _, _, pruned2 = orc_reader._plan_stripes(
        [p], ("id", "between", (100, 200)))
    assert pruned2 >= 1
    df2 = orc_reader.spark_read_orc(spark, [p],
                                    predicate=("id", "between", (100, 200)))
    got = df2.filter(F.col("id").between(100, 200)).count()
    assert got == 101
