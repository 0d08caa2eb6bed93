"""Bucketed tables: shuffle-free co-located joins for the hot join keys.

The records ↔ stop_times and records ↔ records (pair) joins always key
on trip identity; bucketing both tables on trip_id at write time means
every later join co-locates without an Exchange — at 100 TB that is the
difference between a nightly job and an hourly one.  Requires a
catalog-backed table (saveAsTable), so these helpers manage a named
warehouse table rather than bare parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
