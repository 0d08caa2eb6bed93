"""The `analyse count` report (A1/A2, src/analyser/count.rs:15-80):
fixed-interval buckets over [min, max] of time_of_recording with row
count and average arrival delay, delays bounded to ±36000 s (F1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.delays import count_valid
from ..functions.time import interval_bucket


def count_report(records: DataFrame, interval_seconds: int = 3600) -> DataFrame:
    valid = records.filter(count_valid(F.col("delay_arrival")))
    return (
        valid.groupBy(
            interval_bucket(F.col("time_of_recording"), interval_seconds).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_records"),
            F.avg("delay_arrival").alias("avg_delay_arrival"),
        )
        .orderBy("bucket")
    )
