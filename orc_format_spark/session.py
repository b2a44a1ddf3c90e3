"""SparkSession construction with the engine's pinned configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "orc-format-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session with UTC timestamps (bit-identity + DuckDB oracle parity),
    Arrow batching for pandas UDFs, and AQE (skew-join / coalesce) enabled.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    return (
        SparkSession.builder
        .appName(app)
        .master(master)
        # shuffle files on tmpfs: shuffle I/O otherwise serializes on the
        # (slow, shared) sandbox block device and caps scaling
        .config("spark.local.dir", local_dir)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # arena-pinned malloc for Python workers (see orc_format_spark._tune_malloc)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
        .getOrCreate()
    )
