"""Structured Streaming encode path.

Transcripts arrive as a stream (file drops / Kafka at real scale); each
micro-batch is encoded through the SAME deterministic stripe pipeline and
committed with lineage, so streaming output is indistinguishable from a
batch encode of the union of batches.

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
invocations; stripe ids are prefixed with the batch id and the commit
anti-joins lineage, so a replayed batch re-derives identical stripe ids and
is skipped (idempotent) — the streaming analog of the batch resume path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline


def encode_stream(stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
                  key_col: str = "conv_id", order_col: str | None = "turn_idx",
                  stripe_rows: int = pipeline.DEFAULT_STRIPE_ROWS,
                  n_buckets: int = 64, trigger_available_now: bool = True):
    """Start a streaming query that encodes each micro-batch into
    ``out_dir``/{stripes,manifest,lineage}. Returns the StreamingQuery."""
    spark = stream_df.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stripes = pipeline.encode_dataframe(
            batch_df, key_col=key_col, order_col=order_col,
            stripe_rows=stripe_rows, n_buckets=n_buckets,
            n_rows=1,  # n_buckets fixed; skip the count
            stripe_prefix=f"b{batch_id:08d}-")
        done = pipeline.completed_stripes(spark, out_dir)
        if done is not None:
            stripes = stripes.join(F.broadcast(done), "stripe_id", "left_anti")
        pipeline.commit(spark, stripes, out_dir, key_col, order_col,
                        run_id=f"stream-b{batch_id}", done=done)

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_transcripts_stream(spark: SparkSession, input_dir: str,
                            max_files_per_trigger: int = 8) -> DataFrame:
    """File-source transcripts stream (schema per BASELINE.json input_hint)."""
    from .transcripts import SCHEMA
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))
