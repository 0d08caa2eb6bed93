"""S8/S9: statistics-tree persistence.

The reference serializes the DelayStatistics tree as MessagePack/JSON
files with directory-per-level granularity (src/types/types.md:13-27).
On Spark the tree is one flat table; persistence is a partitioned
parquet write — the directory levels fall out of partitionBy, and
loading "one route's subtree" is partition pruning, not file plumbing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..curves.udfs import CURVE_DDL  # noqa: F401  (documented curve column shape)

STATISTICS_PARTITIONS = ["scope", "route_id"]


def save_statistics(statistics: DataFrame, path: str) -> None:
    """Write the statistics table partitioned by (scope, route_id) — the
    reference's tree levels (specific/<route_id>/..., types.md:13-27).
    Null route_id (default scope) lands in the hive null partition."""
    statistics.write.mode("overwrite").partitionBy(*STATISTICS_PARTITIONS).parquet(path)


def load_statistics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_statistics(specific_path: str, general_path: str, spark: SparkSession) -> DataFrame:
    """S9: the reference can load specific curves from one file and
    general curves from another (src/main.rs:295-318).  Flat tables make
    this a filtered union."""
    from pyspark.sql import functions as F

    spec = load_statistics(spark, specific_path).filter(
        F.col("scope").isin("specific", "semi_specific")
    )
    gen = load_statistics(spark, general_path).filter(F.col("scope") == "default")
    return spec.unionByName(gen)


def save_predictions(predictions: DataFrame, path: str) -> None:
    """Predictions table partitioned by service day: retention (T4) and
    the monitor's time-window queries both prune on it."""
    predictions.write.mode("overwrite").partitionBy("trip_start_date").parquet(path)


def load_predictions(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
