"""SparkSession factory with engine defaults.

Local-mode settings tuned for the sandbox (local[N], single JVM); on a real
cluster the same code runs unchanged under spark-submit — only master/memory
come from the cluster conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app_name: str = "knowledgeir_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores locally; on a cluster this should be sized to data volume
        # (target 128-256MB post-shuffle per partition).
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("KIR_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Split size: 128MB (the cluster default) packs this sandbox's small
        # compressed inputs into a handful of splits and starves the cores —
        # scan parallelism, not shuffle width, bounds every map stage.  16MB
        # keeps local[32] saturated; on a real cluster raise it back via env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("KIR_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
