"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by core
count for local testing: AQE on (runtime broadcast conversion + skew
join splitting), Arrow for any pandas-UDF stage, UTC session timezone
so timestamp semantics are stable across engines (the DuckDB oracle
also runs in UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lfes-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # 2x parallelism: small enough to avoid tiny-task overhead at
        # test scale; AQE coalesces further at runtime. On a 1000-exec
        # cluster this would be set ~2-3x total cores instead.
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # lookup snapshots are broadcast; be generous (driver has RAM)
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # sort-free dynamic-partition writes: without this, partitionBy
        # inserts a per-task sort and (with many routes per task) holds
        # one 128MB parquet buffer per open file — measured anti-scaling
        # at 32 threads
        .config("spark.sql.maxConcurrentOutputFileWriters", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("LFES_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
