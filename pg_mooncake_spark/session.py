"""Engine session factory.

Analog of the reference's extension bootstrap (src/sql/bootstrap.sql:1-3 +
src/lib.rs _PG_init): one place that constructs the SparkSession every other
component shares, with the configuration that matters for a 100 TB OLAP
deployment expressed explicitly so the same factory scales from local[32]
tests to a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pg_mooncake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Scale notes (local[32] test harness vs 1000-executor production):
    - ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
      cluster leave AQE's coalescing to right-size post-shuffle partitions
      (``spark.sql.adaptive.coalescePartitions.enabled``).
    - AQE is always on: runtime join-strategy switching (broadcast when a
      side turns out small), skew-join splitting, partition coalescing.
    - Arrow is on for every pandas_udf / toPandas boundary.
    - Session timezone pinned to UTC so timestamp semantics are stable and
      comparable with the DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffledHashJoinFactor", "3")
        # timestamp[ns] parquet (events.ts) reads as long; queries rebuild
        # a micros timestamp JVM-side (registry.t).  Set here once so the
        # engine session never mutates conf mid-query; registry.t still
        # sets it at runtime for driver-owned sessions built elsewhere.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
