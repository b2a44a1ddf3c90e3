"""Row-group (stride) index: sub-stripe skipping — encode with per-stride
stats, decode only matching strides (the RowIndexEntry analog,
reference src/proto.rs:88-99)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from orc_format_spark import pipeline, stripe, transcripts


def _col(values, dtype=None):
    return pa.array(values, type=dtype)


def test_strided_roundtrip_matches_plain_all_kinds():
    n = 1000
    rng = np.random.default_rng(5)
    cases = [
        ("int64", _col(rng.integers(-1e9, 1e9, n))),
        ("int64", _col(np.arange(n) * 3 + 7)),
        ("float64", _col(rng.standard_normal(n))),
        ("bool", _col(rng.integers(0, 2, n).astype(bool))),
        ("string", _col([f"doc-{i % 37}-{'x' * (i % 11)}" for i in range(n)])),
        ("timestamp", _col(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(rng.integers(0, 1e6, n), unit="s"),
                           pa.timestamp("us"))),
    ]
    for kind, arr in cases:
        plain = stripe.encode_column(arr, kind)
        strided = stripe.encode_column_strided(arr, kind, index_rows=128)
        dv, dm = stripe._decode_column_parts(strided)
        pv, pm = stripe._decode_column_parts(plain)
        assert (dm == pm).all()
        if kind == "string":
            assert dv.to_pylist() == pv.to_pylist()
        else:
            assert np.array_equal(np.asarray(dv), np.asarray(pv)), kind


def test_strided_roundtrip_with_nulls_and_dict_fsst():
    n = 800
    texts = [None if i % 7 == 0 else f"value-{i % 5}" for i in range(n)]
    arr = pa.array(texts, type=pa.string())
    for force in ("str_dict", "str_direct", "str_fsst"):
        strided = stripe.encode_column_strided(arr, "string", 100, force_codec=force)
        got = stripe.decode_column(strided)
        assert got.to_pylist() == texts, force


def test_strided_array_float_roundtrip():
    n = 300
    rng = np.random.default_rng(2)
    vecs = [rng.standard_normal(8).astype(np.float32).tolist() for _ in range(n)]
    arr = pa.array(vecs, type=pa.list_(pa.float32()))
    strided = stripe.encode_column_strided(arr, "array_float32", 64)
    got = stripe.decode_column(strided)
    assert got.to_pylist() == arr.to_pylist()


def test_stride_skip_decodes_under_10_percent():
    """A narrow predicate on a sorted key decodes <10% of the stripe's
    values — the row-group skip contract."""
    n = 8192
    key = pa.array(np.arange(n, dtype=np.int64))
    text = pa.array([f"row-{i}" for i in range(n)])
    krow = stripe.encode_column_strided(key, "int64", 256)
    trow = stripe.encode_column_strided(text, "string", 256)
    lo, hi = 1000, 1100  # spans at most 2 strides of 256
    keep = stripe._strides_overlapping(krow, lo, hi)
    assert 1 <= len(keep) <= 2
    kv, km = stripe._decode_strided_parts(krow, keep)
    tv, tm = stripe._decode_strided_parts(trow, keep)
    assert len(kv) <= 512 < n * 0.10
    got = np.asarray(kv)
    assert got.min() <= lo and got.max() >= hi  # superset of the range
    mask = (got >= lo) & (got <= hi)
    assert mask.sum() == hi - lo + 1
    assert tv.to_pylist()[int(np.flatnonzero(mask)[0])] == f"row-{lo}"


def test_stride_stats_roundtrip():
    arr = pa.array(np.arange(1000, dtype=np.int64) * 2)
    row = stripe.encode_column_strided(arr, "int64", 250)
    stats = stripe.stride_stats(row)
    assert len(stats) == 4
    assert [s["min_val"] for s in stats] == ["0", "500", "1000", "1500"]
    assert [int(s["max_val"]) for s in stats] == [498, 998, 1498, 1998]
    assert all(s["n_rows"] == 250 for s in stats)


def test_pipeline_stride_pruned_decode(spark, tmp_path):
    """End-to-end: encode_job with index_rows, decode_job with stripe AND
    stride pruning, exact residual filter — equals the plain filter."""
    df = transcripts.generate(spark, n_convs=80, seed=13)
    df = df.withColumn("row_id", F.monotonically_increasing_id())
    # use event-style table keyed by a sortable int
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stripes = pipeline.encode_dataframe(events, "event_id", None,
                                        sort_keys=["event_id"],
                                        stripe_rows=2048, index_rows=256)
    lo, hi = 3000, 3050
    got = (pipeline.decode_dataframe(
        stripes, columns=["event_id", "event_type", "value"],
        schema=None, stride_range=("event_id", lo, hi))
        .filter(F.col("event_id").between(lo, hi))
        .orderBy("event_id").toPandas())
    exp = (events.select("event_id", "event_type", "value")
           .filter(F.col("event_id").between(lo, hi))
           .orderBy("event_id").toPandas())
    pd.testing.assert_frame_equal(exp.reset_index(drop=True),
                                  got[exp.columns.tolist()].reset_index(drop=True),
                                  check_dtype=False)
