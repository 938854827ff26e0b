"""SparkSession factory.

Scale posture (tuned for local[32] testing, designed for 1000-executor
clusters): AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (pandas-UDF hot path), UTC session timezone (pinned so
DuckDB-oracle timestamp comparisons are stable), shuffle partitions sized to
local cores via env — on a real cluster this would be left to AQE +
`spark.sql.shuffle.partitions` sized to executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-harvesting-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep scans pruned/pushed: defaults are fine, stated for intent
        .config("spark.sql.parquet.filterPushdown", "true")
        # streaming state store: RocksDB provider (bundled with Spark) so
        # large keyed state spills to disk instead of exhausting the heap
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
