"""S2/S3: GTFS-realtime ingestion.

- ``list_feed_files``: distributed file listing with filename-date
  extraction (C4 regex) and the as-of pairing of each rt file to the
  newest schedule whose date <= the rt date (J3,
  src/importer/mod.rs:361-460) — expressed with the generic asof_join
  operator, not a driver walk.
- ``decode_feed_messages``: binaryFile scan → protobuf decode →
  exploded stop_time_update rows (RT_UPDATES schema) via mapInPandas.
  The container has no gtfs-realtime bindings, so the wire decode is
  pluggable: pass any bytes→rows function (e.g. one built on
  `gtfs-realtime-bindings` in production); a deterministic fake decoder
  is provided for tests.  The Spark plumbing — binary scan, Arrow
  batches, explode shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators.asof import asof_join

FILENAME_DATE_RE = r"(\d{4}-\d{2}-\d{2})"
# the reference matches ...THH:MM:SS (src/analyser/mod.rs:191-197); Hadoop
# paths cannot contain ':', so HH-MM-SS is accepted as the on-disk form
FILENAME_DATETIME_RE = r"(\d{4}-\d{2}-\d{2})T(\d{2})[:\-](\d{2})[:\-](\d{2})"


def _filename_timestamp(path):
    date = F.regexp_extract(path, FILENAME_DATETIME_RE, 1)
    hh = F.regexp_extract(path, FILENAME_DATETIME_RE, 2)
    mm = F.regexp_extract(path, FILENAME_DATETIME_RE, 3)
    ss = F.regexp_extract(path, FILENAME_DATETIME_RE, 4)
    assembled = F.concat_ws(" ", date, F.concat_ws(":", hh, mm, ss))
    return F.to_timestamp(F.when(date != "", assembled))


def list_feed_files(spark: SparkSession, rt_dir: str, schedule_dir: str) -> DataFrame:
    """One row per rt file with its filename timestamp and the matching
    schedule file (as-of: newest schedule date <= rt date).  Files whose
    names carry no date are routed out with schedule_file = NULL — the
    caller quarantines them (the reference moves them to failed/,
    src/main.rs:87-121)."""
    def nonempty(col):
        return F.when(col != "", col)

    def listing(d: str, alias: str) -> DataFrame:
        files = spark.read.format("binaryFile").option("pathGlobFilter", "*").load(d)
        return files.select(
            F.col("path").alias(alias),
            _filename_timestamp(F.col("path")).alias(f"{alias}_ts"),
            F.to_date(
                nonempty(F.regexp_extract(F.col("path"), FILENAME_DATE_RE, 1))
            ).alias(f"{alias}_date"),
        )

    rt = listing(rt_dir, "rt_file")
    sched = (
        listing(schedule_dir, "schedule_file")
        .withColumn(
            "sort_ts",
            F.coalesce(
                F.col("schedule_file_ts"), F.col("schedule_file_date").cast("timestamp")
            ),
        )
        .select("schedule_file", "sort_ts")
    )
    rt = rt.withColumn(
        "rt_sort_ts",
        F.coalesce(F.col("rt_file_ts"), F.col("rt_file_date").cast("timestamp")),
    ).withColumn("_k", F.lit(1))
    sched = sched.withColumn("_k", F.lit(1))
    paired = asof_join(
        rt, sched, on=["_k"], left_time="rt_sort_ts", right_time="sort_ts",
        payload_cols=["schedule_file"],
    )
    return paired.drop("_k")


def failed_feed_files(feed_files: DataFrame, decoded: DataFrame) -> DataFrame:
    """Quarantine report: input files that produced no decoded rows — the
    reference moves these to failed/ (src/importer/mod.rs:523-555).  With
    a checkpointed stream the move is unnecessary; this anti-join is the
    audit trail."""
    seen = decoded.select(F.col("feed_file").alias("path")).distinct()
    return feed_files.select("path", "length", "modificationTime").join(
        seen, "path", "left_anti"
    )


def fake_decoder(blob: bytes) -> list[dict]:
    """Deterministic stand-in for a FeedMessage parse: interprets the blob
    as UTF-8 CSV lines `trip_id,start_date,start_time,route_id,stop_id,
    stop_sequence,arrival_delay,departure_delay`.  Real deployments pass
    a protobuf decoder with the same signature."""
    rows = []
    for line in blob.decode("utf-8").strip().splitlines()[1:]:
        f = line.split(",")
        rows.append(
            {
                "trip_id": f[0],
                "start_date": f[1] or None,
                "start_time": f[2] or None,
                "route_id": f[3] or None,
                "stop_id": f[4] or None,
                "stop_sequence": int(f[5]) if f[5] else None,
                "arrival_delay": int(f[6]) if f[6] else None,
                "departure_delay": int(f[7]) if f[7] else None,
            }
        )
    return rows


def protobuf_decoder(blob: bytes) -> list[dict]:  # pragma: no cover - env-gated
    """Wire decoder for real GTFS-rt protobuf feeds.  Requires the public
    `gtfs-realtime-bindings` package (not in this container — S2's decode
    is stubbed per the build contract; the plumbing around it is live)."""
    try:
        from google.transit import gtfs_realtime_pb2  # type: ignore
    except ImportError as e:  # noqa: F841
        raise NotImplementedError(
            "gtfs-realtime-bindings not installed; pass a custom decoder"
        )
    msg = gtfs_realtime_pb2.FeedMessage()
    msg.ParseFromString(blob)
    rows = []
    for entity in msg.entity:
        tu = entity.trip_update
        for stu in tu.stop_time_update:
            rows.append(
                {
                    "trip_id": tu.trip.trip_id,
                    "start_date": tu.trip.start_date or None,
                    "start_time": tu.trip.start_time or None,
                    "route_id": tu.trip.route_id or None,
                    "stop_id": stu.stop_id or None,
                    "stop_sequence": stu.stop_sequence,
                    "arrival_delay": stu.arrival.delay if stu.HasField("arrival") else None,
                    "departure_delay": stu.departure.delay if stu.HasField("departure") else None,
                }
            )
    return rows


def decode_feed_messages(
    feed_files: DataFrame,
    decoder: Callable[[bytes], list[dict]] = fake_decoder,
) -> DataFrame:
    """binaryFile rows (path, modificationTime, content) → RT_UPDATES.
    The decode runs per Arrow batch inside mapInPandas; header_timestamp
    comes from the filename datetime (falling back to mtime), matching
    the reference's header-timestamp extraction
    (src/importer/per_schedule_importer.rs:96-117)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, mtime, content, hdr_ts in zip(
                pdf["path"], pdf["modificationTime"], pdf["content"], pdf["_hdr_ts"]
            ):
                try:
                    rows = decoder(bytes(content))
                except Exception:
                    continue  # failed file → quarantined by absence
                for r in rows:
                    r = dict(r)
                    r["feed_file"] = path
                    r["header_timestamp"] = hdr_ts if pd.notna(hdr_ts) else mtime
                    out.append(r)
            if out:
                df = pd.DataFrame(out)
                yield df[[f.name for f in S.RT_UPDATES.fields]]

    prepared = feed_files.withColumn("_hdr_ts", _filename_timestamp(F.col("path")))
    return prepared.mapInPandas(decode, S.RT_UPDATES)
