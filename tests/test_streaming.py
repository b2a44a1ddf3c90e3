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


def test_stateful_conversation_rollup(spark, tmp_path):
    """applyInPandasWithState rollup: the last emitted row per conversation
    must equal the batch aggregate over all turns."""
    from pyspark.sql import functions as F2
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    df = transcripts.generate(spark, n_convs=30, seed=9)
    df.repartition(5).write.parquet(src)

    stream = streaming.read_transcripts_stream(spark, src, max_files_per_trigger=2)
    rollup = streaming.conversation_rollup(stream)
    q = (rollup.writeStream.format("memory").queryName("rollup")
         .option("checkpointLocation", ckpt)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = (spark.table("rollup").toPandas()
           .sort_values(["conv_id", "n_turns"])  # last update = max n_turns
           .groupby("conv_id").last().reset_index())
    exp = (df.groupBy("conv_id").agg(
        F2.count("*").alias("n_turns"),
        F2.sum(F2.length("text")).alias("n_chars"),
        F2.min("ts").alias("first_ts"), F2.max("ts").alias("last_ts"),
        F2.sum(F2.when(F2.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_calls"),
    ).orderBy("conv_id").toPandas())
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()
    assert got["n_tool_calls"].tolist() == exp["n_tool_calls"].tolist()
    assert (got["last_ts"].astype("datetime64[us]").tolist()
            == exp["last_ts"].astype("datetime64[us]").tolist())


def test_stream_encode_nested_table(spark, tmp_path):
    """Streaming encode of a NESTED table (rich tool_calls): the
    foreachBatch encode flattens per micro-batch; decode re-nests and
    matches the batch input."""
    src = str(tmp_path / "rsrc")
    out = str(tmp_path / "renc")
    ckpt = str(tmp_path / "rckpt")

    rich = transcripts.enrich(transcripts.generate(spark, n_convs=40, seed=5))
    rich.repartition(4).write.parquet(src)
    saved = spark.read.parquet(src)  # the exact rows the stream will see

    stream = (spark.readStream.schema(saved.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    q = streaming.encode_stream(stream, out, ckpt, stripe_rows=500,
                                n_buckets=6)
    q.awaitTermination(300)

    lineage = spark.read.parquet(f"{out}/lineage")
    per_stripe = lineage.groupBy("stripe_id").count().collect()
    assert all(r["count"] == 1 for r in per_stripe)

    dec = pipeline.decode_job(spark, out)
    keyed_exp = {(r["conv_id"], r["turn_idx"]): r.asDict(recursive=True)
                 for r in saved.collect()}
    keyed_got = {(r["conv_id"], r["turn_idx"]): r.asDict(recursive=True)
                 for r in dec.select(saved.columns).collect()}
    assert keyed_got == keyed_exp
