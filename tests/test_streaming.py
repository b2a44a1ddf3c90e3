"""Structured Streaming encode: micro-batched input produces the same
decodable stripes tables as a batch encode, with idempotent lineage."""

import pandas as pd
from pyspark.sql import functions as F

from orc_format_spark import pipeline, streaming, transcripts


def test_stream_encode_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")

    df = transcripts.generate(spark, n_convs=60, seed=3)
    # several files so the stream runs over multiple micro-batches
    df.repartition(6).write.parquet(src)

    stream = streaming.read_transcripts_stream(spark, src, max_files_per_trigger=2)
    q = streaming.encode_stream(stream, out, ckpt, stripe_rows=500, n_buckets=8)
    q.awaitTermination(300)

    lineage = spark.read.parquet(f"{out}/lineage")
    per_stripe = lineage.groupBy("stripe_id").count().collect()
    assert all(r["count"] == 1 for r in per_stripe)
    assert lineage.select("run_id").distinct().count() >= 2, "expected multiple micro-batches"

    got = (pipeline.decode_job(spark, out)
           .orderBy("conv_id", "turn_idx", "ts").toPandas())
    exp = df.orderBy("conv_id", "turn_idx", "ts").toPandas()
    pd.testing.assert_frame_equal(exp.reset_index(drop=True),
                                  got[exp.columns.tolist()].reset_index(drop=True),
                                  check_dtype=False)
    n_rows = df.count()
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] == n_rows
