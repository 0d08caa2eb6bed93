"""SparkSession factory tuned for this engine.

Local mode is used for tests/bench; the same configs (AQE, Arrow,
UTC session timezone, sane shuffle partitioning) are what we would
ship to a 1000-executor cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dystonse_gtfs_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # shuffle partitions ~ cores locally; at cluster scale AQE coalesces
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UTC so results are bit-identical to the DuckDB oracle; the engine
        # stores UTC timestamps + explicit service-day columns (fixes the
        # reference's DST bugs, see SURVEY §7 hard parts #1)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver's events table stores TIMESTAMP(NANOS); Spark has no
        # ns timestamp — read as long and convert to µs in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed domain tables hash on trip_id; joins key on supersets
        # (trip_id + stop_sequence, the vehicle key).  Accepting the
        # subset co-partitioning is REQUIRED for the zero-Exchange
        # bucketed joins (sources/bucketed.py) and is set once here,
        # session-wide, rather than mutated mid-query.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
