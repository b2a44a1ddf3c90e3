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


def test_row_index_streams_and_stride_stats(tmp_path):
    """row_index_stride>0: ROW_INDEX streams (RowIndexEntry positions +
    per-stride ColumnStatistics, the RowIndex model of src/proto.rs:88-99)
    are emitted per stripe; the Apache C++ reader consumes the file whole,
    and stride-level stats round-trip exactly. Nulls force an all-true
    PRESENT contribution from null-free groups; nested columns index too."""
    import io
    import pyarrow.orc as po
    n = 5000
    rng = np.random.default_rng(3)
    tbl = pa.table({
        "a": pa.array(np.arange(n)),
        "s": pa.array([f"doc-{i % 37}-{i}" for i in range(n)]),
        "d": pa.array(rng.standard_normal(n)),
        "m": pa.array([None if i % 7 == 0 else i * 2 for i in range(n)],
                      type=pa.int64()),
        "ls": pa.array([[i, i + 1] if i % 3 else None for i in range(n)],
                       type=pa.list_(pa.int64())),
    })
    p = str(tmp_path / "ri.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=2500, row_index_stride=1000)

    raw = open(p, "rb").read()
    ap = po.ORCFile(io.BytesIO(raw)).read()
    for c in tbl.column_names:
        assert ap.column(c).combine_chunks().cast(
            tbl.column(c).type).equals(tbl.column(c).combine_chunks()), c
    back = orc_reader.read_orc_bytes(raw)
    for c in tbl.column_names:
        assert back.column(c).combine_chunks().cast(
            tbl.column(c).type).equals(tbl.column(c).combine_chunks()), c

    ri = orc_reader.read_row_index(p)
    assert len(ri) == 2                      # 2 stripes
    for stripe_idx, per in enumerate(ri):
        base = stripe_idx * 2500
        ent = per[1]                         # column "a" (cid 1)
        assert len(ent) == 3                 # 1000,1000,500 strides
        for g, e in enumerate(ent):
            lo = base + g * 1000
            hi = base + min((g + 1) * 1000, 2500) - 1
            assert e["stats"]["kind"] == "int"
            assert e["stats"]["min"] == lo and e["stats"]["max"] == hi
            assert e["positions"][0] >= 0    # block offsets monotone
        offs = [e["positions"][0] for e in ent]
        assert offs == sorted(offs) and offs[0] == 0
        # nullable column: numberOfValues excludes nulls, hasNull set
        ment = per[4]
        assert any(e["stats"]["has_null"] for e in ment)
        assert sum(e["stats"]["n"] for e in ment) == 2500 - sum(
            1 for i in range(base, base + 2500) if i % 7 == 0)

    # positions point at compressed-chunk starts: decoding column "a" from
    # a mid-stripe row group using only the index must reproduce the values
    from orc_format_spark.codecs import deflate, rle_v2
    ps, footer = orc_reader.read_tail(p)
    si = footer["stripes"][0]
    sf = orc_reader._parse_stripe_footer(orc_reader._decompress(
        raw[si["offset"] + si["indexLength"] + si["dataLength"]:
            si["offset"] + si["indexLength"] + si["dataLength"]
            + si["footerLength"]], ps["compression"]))
    pos = 0
    a_data = None
    for s in sf["streams"]:
        if s["kind"] == orc_reader.DATA and s["column"] == 1:
            a_data = raw[si["offset"] + pos:si["offset"] + pos + s["length"]]
        pos += s["length"]
    e2 = ri[0][1][2]                         # third row group of stripe 0
    block_off = e2["positions"][0]
    vals = rle_v2.decode(deflate.decompress(a_data[block_off:]), 500,
                         signed=True)
    assert vals.tolist() == list(range(2000, 2500))


def test_our_files_carry_stripe_stats_for_pruning(tmp_path, spark):
    """The writer always emits the Metadata section (StripeStatistics), so
    spark_read_orc's predicate hint prunes stripes of OUR OWN files."""
    n = 20_000
    tbl = pa.table({"id": pa.array(np.arange(n)),
                    "v": pa.array(np.arange(n) % 100)})
    p = str(tmp_path / "ours.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=4000)
    _, footer, stats = orc_reader.read_tail(p, with_stats=True)
    assert len(stats) == len(footer["stripes"]) == 5
    assert stats[2][1]["min"] == 8000 and stats[2][1]["max"] == 11999
    plans, _, _, _, n_pruned = orc_reader._plan_stripes(
        [p], ("id", "=", 9500))
    assert len(plans) == 1 and n_pruned == 4
    from pyspark.sql import functions as F
    df = orc_reader.spark_read_orc(spark, [p], predicate=("id", "=", 9500))
    got = df.filter(F.col("id") == 9500).collect()
    assert len(got) == 1 and got[0]["v"] == 9500 % 100


@pytest.mark.parametrize("seed", [901, 913])
def test_row_index_fuzz_random_tables(tmp_path, seed):
    """Random typed tables (nulls everywhere, uneven final stride) with a
    row index: Apache reads the file whole, our reader matches, and every
    RowIndexEntry's stats agree with numpy recomputation per stride."""
    import io
    import pyarrow.orc as po
    rng = np.random.default_rng(seed)
    n = int(rng.integers(900, 2600))
    stride = int(rng.choice([100, 150, 250, 333]))  # deliberately NOT multiples of 8
    stripe_rows = int(rng.choice([700, 1500]))

    def maybe_null(vals, typ):
        mask = rng.random(n) < 0.15
        return pa.array([None if m else v for v, m in zip(vals, mask)],
                        type=typ)

    tbl = pa.table({
        "i": maybe_null(rng.integers(-10**6, 10**6, n).tolist(), pa.int64()),
        "f": maybe_null(rng.standard_normal(n).tolist(), pa.float64()),
        "s": maybe_null([f"k{int(v)}" for v in rng.integers(0, 50, n)],
                        pa.string()),
    })
    p = str(tmp_path / "fz.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=stripe_rows,
                         row_index_stride=stride)
    raw = open(p, "rb").read()
    ap = po.ORCFile(io.BytesIO(raw)).read()
    back = orc_reader.read_orc_bytes(raw)
    for c in tbl.column_names:
        e = tbl.column(c).combine_chunks()
        assert ap.column(c).combine_chunks().cast(e.type).equals(e), c
        assert back.column(c).combine_chunks().cast(e.type).equals(e), c

    ri = orc_reader.read_row_index(p)
    i_vals = tbl.column("i").to_pylist()
    for s_idx, per in enumerate(ri):
        base = s_idx * stripe_rows
        s_rows = min(stripe_rows, n - base)
        ent = per[1]                      # column "i"
        assert len(ent) == (s_rows + stride - 1) // stride
        for g, e in enumerate(ent):
            seg = [v for v in i_vals[base + g * stride:
                                     base + min((g + 1) * stride, s_rows)]
                   if v is not None]
            if seg:
                assert e["stats"]["min"] == min(seg), (s_idx, g)
                assert e["stats"]["max"] == max(seg), (s_idx, g)
                assert e["stats"]["n"] == len(seg)


def test_stripe_pruning_string_predicate(tmp_path):
    """String-typed ColumnStatistics prune stripes too (lexicographic
    min/max), and a type-mismatched predicate degrades to no pruning
    rather than wrong pruning."""
    n = 8000
    tbl = pa.table({
        "k": pa.array([f"key-{i:06d}" for i in range(n)]),
        "v": pa.array(np.arange(n)),
    })
    p = str(tmp_path / "s.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=2000)
    plans, _, _, _, pruned = orc_reader._plan_stripes(
        [p], ("k", "=", "key-005000"))
    assert pruned == 3 and len(plans) == 1
    # int value against string stats: TypeError guard => conservative keep
    plans2, _, _, _, pruned2 = orc_reader._plan_stripes([p], ("k", "=", 42))
    assert pruned2 == 0 and len(plans2) == 4


def test_row_index_bit_unaligned_groups(tmp_path):
    """REGRESSION: bit-packed streams (PRESENT, bool DATA) under a row
    index whose stride is NOT a multiple of 8. A per-group restart would
    leave padding bits that shift every later value; the writer must emit
    ONE whole-stripe bit sequence chunked at byte boundaries, with the
    group's bit offset in the RowIndexEntry positions."""
    import io
    from decimal import Decimal
    import pyarrow.orc as po
    n = 900
    tbl = pa.table({
        "d": pa.array([None if i % 5 == 0 else Decimal(i) / Decimal(100)
                       for i in range(n)], type=pa.decimal128(12, 2)),
        "bo": pa.array([None if i % 7 == 0 else bool(i % 3)
                        for i in range(n)], type=pa.bool_()),
        "ls": pa.array([[i] * (i % 4) if i % 6 else None for i in range(n)],
                       type=pa.list_(pa.int64())),
    })
    p = str(tmp_path / "bits.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=400, row_index_stride=150)
    raw = open(p, "rb").read()
    ours = orc_reader.read_orc_bytes(raw)
    ap = po.ORCFile(io.BytesIO(raw)).read()
    for c in tbl.column_names:
        e = tbl.column(c).combine_chunks()
        assert ours.column(c).combine_chunks().cast(e.type).equals(e), c
        assert ap.column(c).combine_chunks().cast(e.type).equals(e), c
    # positions carry the real bit offset (150 % 8 == 6) for bool streams
    ri = orc_reader.read_row_index(p)
    assert ri[0][1][1]["positions"][3] == 6   # decimal PRESENT bit offset


def test_stats_keep_inf_bounds_no_misprune(tmp_path, spark):
    """REGRESSION (r4 advice, high): a double slice containing +/-inf used
    to publish NO bounds for that slice, and _merge_stats then adopted the
    finite sibling's bounds — fabricating stripe/file stats that exclude
    the inf rows, so stats-aware readers silently dropped them. Apache ORC
    semantics: +/-inf are valid orderable bounds (only NaN omits them)."""
    inf = float("inf")
    tbl = pa.table({"v": pa.array([float(i) for i in range(1000)]
                                  + [inf] * 1000)})
    p = str(tmp_path / "inf.orc")
    # one stripe, two stride groups: [0..999] then [inf x 1000]
    orc_writer.write_orc(tbl, p, stripe_rows=5000, row_index_stride=1000)
    _, _, stats = orc_reader.read_tail(p, with_stats=True)
    assert stats[0][1]["min"] == 0.0 and stats[0][1]["max"] == inf
    # the pruning path must keep the stripe for v >= 1e9 (inf rows match)
    df = orc_reader.spark_read_orc(spark, [p], predicate=("v", ">=", 1e9))
    import pyspark.sql.functions as F
    assert df.filter(F.col("v") >= 1e9).count() == 1000
    # Apache reader still consumes the file (inf encodes as a fixed64)
    assert orc.read_table(p).column("v").to_pylist()[-1] == inf

    # two-stripe variant: predicate correctly prunes the finite stripe but
    # keeps the all-inf one
    p2 = str(tmp_path / "inf2.orc")
    orc_writer.write_orc(tbl, p2, stripe_rows=1000)
    plans, _, _, _, n_pruned = orc_reader._plan_stripes(
        [p2], predicate=("v", ">=", 1e9))
    assert n_pruned == 1 and len(plans) == 1


def test_stats_nan_poisons_merged_bounds(tmp_path):
    """NaN is unorderable: a slice holding NaN publishes no bounds, and the
    merge with a finite slice must stay unknown (never adopt the finite
    side), so readers fall back to scanning — exact, just unpruned."""
    tbl = pa.table({"v": pa.array([float(i) for i in range(1000)]
                                  + [float("nan")] * 10)})
    p = str(tmp_path / "nan.orc")
    orc_writer.write_orc(tbl, p, stripe_rows=5000, row_index_stride=1000)
    _, _, stats = orc_reader.read_tail(p, with_stats=True)
    assert stats[0][1]["min"] is None and stats[0][1]["max"] is None
    plans, _, _, _, n_pruned = orc_reader._plan_stripes(
        [p], predicate=("v", ">=", 1e9))
    assert n_pruned == 0   # unknown bounds never prune

    # direct merge-unit check: unknown side poisons, empty side doesn't
    fin = {"n": 5, "has_null": False, "kind": "double", "min": 1.0, "max": 2.0}
    unk = {"n": 3, "has_null": False, "kind": None, "min": None, "max": None}
    emp = {"n": 0, "has_null": False, "kind": None, "min": None, "max": None}
    assert orc_writer._merge_stats(fin, unk)["min"] is None
    assert orc_writer._merge_stats(unk, fin)["max"] is None
    assert orc_writer._merge_stats(fin, emp)["min"] == 1.0
    assert orc_writer._merge_stats(emp, fin)["max"] == 2.0


@pytest.mark.parametrize("comp", ["zstd", "snappy", "lz4"])
def test_write_side_modern_compressions(tmp_path, comp):
    """Write-side SNAPPY/LZ4/ZSTD sections (r4 had them decode-only): our
    files must read bit-identically through BOTH the Apache ORC reader
    (pyarrow.orc — validates the on-wire codec bytes) and our own reader
    (validates the decode symmetry), including under a row index."""
    t = _mixed_table()
    p = str(tmp_path / f"ours_{comp}.orc")
    orc_writer.write_orc(t, p, compression=comp, stripe_rows=1500,
                         row_index_stride=700)
    back_apache = orc.read_table(p)
    back_ours = orc_reader.read_orc(p)
    for name in t.column_names:
        e = t.column(name).combine_chunks()
        assert back_apache.column(name).combine_chunks().cast(e.type) \
            .equals(e), f"apache/{comp}/{name}"
        assert back_ours.column(name).combine_chunks().cast(e.type) \
            .equals(e), f"ours/{comp}/{name}"
    # postscript really claims the requested kind (not silently zlib)
    ps, _ = orc_reader.read_tail(p)
    assert ps["compression"] == {"snappy": 2, "lz4": 4, "zstd": 5}[comp]
