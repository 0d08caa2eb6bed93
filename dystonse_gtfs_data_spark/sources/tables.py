"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Parquet scans are the scale path: columnar, predicate-pushdown and
column-pruning capable (the reference's MySQL scans S4 with hand-written
WHERE/SELECT pushdown, src/analyser/specific_curves.rs:80-116, become
Catalyst-managed pushdown for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make a caller-provided session (e.g. the driver's) behave like
    ours: ns-parquet readable, UTC semantics for oracle parity, and sane
    local-mode parallelism (the 200-partition default turns the curve
    pipelines into 400+ task stages of mostly scheduler overhead).  All
    runtime-settable SQL confs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, min(64, cores))))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts as TIMESTAMP(NANOS) parquet; with nanosAsLong it arrives
        # as epoch-ns long → truncate to µs (DuckDB's native TIMESTAMP unit,
        # so oracle comparisons CAST(ts AS TIMESTAMP) agree bit-for-bit)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Pandas-written timestamp[us] parquet has isAdjustedToUTC=false, which
    # Spark reads as TIMESTAMP_NTZ.  Normalize to TIMESTAMP_LTZ: the session
    # is UTC-pinned above, so the cast reinterprets the same wall-clock as
    # the same instant and every epoch/interval expression (unix_micros,
    # cast-to-double deltas) keeps the exact semantics DuckDB applies to its
    # tz-less native TIMESTAMP.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


# Ceiling for a *forced* broadcast hint.  Schedule-sized dims (stop_times
# for one feed) fit comfortably; a country-scale merged feed (tens of
# millions of stop_times rows, multi-GB) must NOT be pinned to every
# executor — above this the planner keeps its own strategy (shuffle join,
# the bucketed zero-Exchange path, or an AQE runtime broadcast if the
# filtered side turns out small).
BROADCAST_HINT_MAX_BYTES = 512 << 20


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast hint only when Catalyst's optimized-plan size estimate is
    known and under ``max_bytes`` (default :data:`BROADCAST_HINT_MAX_BYTES`,
    read at call time so tests can shrink it).  Unknown/garbage estimates
    (Long.MaxValue for non-file-backed plans) fall through unhinted."""
    if max_bytes is None:
        max_bytes = BROADCAST_HINT_MAX_BYTES
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return df
    if 0 < size <= max_bytes:
        return F.broadcast(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
