"""SparkSession builder tuned for this engine.

Local mode here stands in for a multi-executor cluster: partition counts,
AQE, and Arrow batch sizing are chosen so the same code scales by changing
only ``master`` / ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "log_analysis_ai_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults target the sandbox (single JVM, ``local[N]``); on a real
    cluster pass ``master=None`` with spark-submit supplying the master and
    executor topology — every other setting below is cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
        shuffle_partitions = max(2 * n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver holds everything; give it headroom but stay
        # below the sandbox cgroup limit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd over snappy: measured at 18M turns / 8 cores, e2e 199s -> 161s
        # (+24% turns/s) and the checkpoint warehouse -38% bytes — the
        # pipeline's data-movement stages are bandwidth-bound, so trading
        # CPU for bytes wins on both wall time and N->4N scaling headroom
        .config("spark.sql.parquet.compression.codec", "zstd")
        # fanout writes: concurrent per-partition writers instead of a
        # per-task sort by partition key (sink fanout is ~6 dirs; the sort
        # of wide rows tripled the routed-stage wall time)
        .config("spark.sql.maxConcurrentOutputFileWriters", "16")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
