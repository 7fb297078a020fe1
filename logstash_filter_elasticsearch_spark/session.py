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
        # spill/shuffle scratch on tmpfs when available: sort spills from
        # the fan-out write landed on slow disk and flattened the scaling
        # curve (measured 15.0s -> 12.7s at local[32]); on a real cluster
        # this is the NVMe local-dir equivalent
        .config(
            "spark.local.dir",
            os.environ.get(
                "LFES_LOCAL_DIR",
                "/dev/shm/lfes-spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # lookup snapshots are broadcast; be generous (driver has RAM)
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # snappy: re-measured on the 8M-row fan-out write under honest
        # core pinning (taskset + ActiveProcessorCount): snappy beats
        # zstd at every level (L2 47.4s vs 55.0s, L8 16.4s vs 18.3s
        # best-of-3) AND is stable run-to-run (±5% vs zstd's ±15% —
        # zstd-jni's JNI critical sections interact badly with G1 under
        # many allocating threads). An earlier 2M-row measurement had
        # preferred zstd; the larger honest measurement wins.
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Dynamic-partition writes stay on Spark's default SORT-based
        # writer (maxConcurrentOutputFileWriters=0): concurrent writers
        # hold one untracked ~128MB parquet buffer per open file per
        # task, which OOMs a 4g heap at 32 tasks x many routes (measured:
        # 8M-row fan-out write dies with 16 writers even at 16MB row
        # groups). The per-task sort is spill-safe at any scale.
        #
        # zstd-jni compresses inside JNI critical sections; under 32
        # allocating threads G1's GCLocker can hit its retry limit and
        # kill the task ("Retried waiting for GCLocker too often").
        # Raise the retry budget — costs nothing when uncontended.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100",
        )
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # NOT larger: on this VM class, heap size anti-scales a 32-thread
        # allocation-heavy stage (measured: the same pure-CPU agg took
        # 0.9s at -Xmx4g vs 6.3s at -Xmx16g; -XX:+AlwaysPreTouch needed
        # 49s to first-touch 16 GiB — page faults are ~10x host cost).
        # G1 walking a huge cold heap serializes on memory, so keep the
        # heap small enough that the GC working set stays resident.
        .config("spark.driver.memory", os.environ.get("LFES_DRIVER_MEM", "4g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
