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


# The domain pipeline's hot join keys all start with trip_id (J2 stop_time
# match, J4/J5 record self-joins on vehicle identity), so trip_id is the
# bucket column: HashPartitioning(trip_id) satisfies any join clustered on
# a superset of it, with no Exchange on either side.
TRIP_BUCKET_COLS = ["trip_id"]


def _allow_subset_copartition(spark: SparkSession) -> None:
    """Joins key on supersets of the bucket columns (trip_id + seq, the
    vehicle key…); hashing both sides by the trip_id subset is a valid
    co-partitioning, but Spark only accepts it with
    ``spark.sql.requireAllClusterKeysForCoPartition=false``.

    ``session.build_session`` sets that conf once at session setup (it is
    consulted at physical-planning time, so a set/restore around plan
    *construction* would silently lose it).  For caller-provided sessions
    that still require all cluster keys, warn that we are flipping a
    session-wide conf instead of doing it silently."""
    if spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition", "true") != "false":
        import warnings

        warnings.warn(
            "bucketed joins require spark.sql.requireAllClusterKeysForCoPartition"
            "=false; setting it for THE WHOLE SESSION (plan shapes of other "
            "queries may change). Set it at session build time to silence.",
            stacklevel=3,
        )
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")


def write_domain_tables_bucketed(
    records: DataFrame,
    stop_times: DataFrame,
    num_buckets: int = 32,
    prefix: str = "gtfs",
) -> tuple[str, str]:
    """Persist records + stop_times bucketed and sorted on trip identity;
    returns the (records, stop_times) table names."""
    rec_t, st_t = f"{prefix}_records_b", f"{prefix}_stop_times_b"
    write_bucketed(
        records, rec_t, TRIP_BUCKET_COLS, num_buckets,
        sort_cols=["trip_id", "stop_sequence"],
    )
    write_bucketed(
        stop_times, st_t, TRIP_BUCKET_COLS, num_buckets,
        sort_cols=["trip_id", "stop_sequence"],
    )
    return rec_t, st_t


def bucketed_stop_join(
    spark: SparkSession, records_table: str, stop_times_table: str
) -> DataFrame:
    """J2 from bucketed tables: records ⋈ stop_times on (trip_id,
    stop_sequence) with ZERO Exchanges — co-located buckets replace both
    the broadcast (schedule too big) and the shuffle (co-location already
    holds).  The 100 TB shape of enrich_records' join."""
    _allow_subset_copartition(spark)
    r = spark.table(records_table)
    st = spark.table(stop_times_table).select(
        "trip_id", "stop_sequence", "stop_id", "arrival_time", "departure_time"
    )
    return r.drop("stop_id").join(st, ["trip_id", "stop_sequence"])


def bucketed_pair_counts(spark: SparkSession, records_table: str) -> DataFrame:
    """J5/A10 from a bucketed records table: the same-vehicle pair-count
    self-join co-locates on trip_id (subset of the vehicle key), so the
    only Exchange left is the final tiny (start_seq, end_seq) rollup."""
    from pyspark.sql import functions as F

    _allow_subset_copartition(spark)
    key = ["source", "route_id", "trip_id", "trip_start_date", "trip_start_time"]
    rec = spark.table(records_table)
    a = rec.select(*key, F.col("stop_sequence").alias("start_seq"))
    b = rec.select(*key, F.col("stop_sequence").alias("end_seq"))
    return (
        a.join(b, key)
        .filter(F.col("start_seq") < F.col("end_seq"))
        .groupBy("start_seq", "end_seq")
        .agg(F.count("*").alias("n_pairs"))
    )
