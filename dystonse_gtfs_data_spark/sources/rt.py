"""S2/S3: GTFS-realtime ingestion.

- ``list_feed_files``: distributed file listing with filename-date
  extraction (C4 regex) and the as-of pairing of each rt file to the
  newest schedule whose date <= the rt date (J3,
  src/importer/mod.rs:361-460) — expressed with the generic asof_join
  operator, not a driver walk.
- ``decode_feed_messages``: binaryFile scan → protobuf decode →
  exploded stop_time_update rows (RT_UPDATES schema) via mapInPandas.
  The default decoder is ``wire_decoder`` — a dependency-free parser of
  the public protobuf wire format for the FeedMessage → TripUpdate →
  StopTimeUpdate subset (field numbers from the published
  gtfs-realtime.proto), so S2 runs end-to-end on real bytes in any
  environment.  ``protobuf_decoder`` (official bindings, if installed)
  and any custom bytes→rows callable remain pluggable.
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


# --- GTFS-realtime protobuf wire codec (public format) ---------------------
# Field numbers from the published gtfs-realtime.proto:
#   FeedMessage:    1 header, 2 repeated entity
#   FeedHeader:     1 gtfs_realtime_version, 3 timestamp
#   FeedEntity:     1 id, 3 trip_update
#   TripUpdate:     1 trip, 2 repeated stop_time_update
#   TripDescriptor: 1 trip_id, 2 start_time, 3 start_date, 5 route_id
#   StopTimeUpdate: 1 stop_sequence, 2 arrival, 3 departure, 4 stop_id
#   StopTimeEvent:  1 delay (int32), 2 time, 3 uncertainty
# The reference's input path decodes exactly this subset
# (src/importer/per_schedule_importer.rs:96-117).

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf, i: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf):
    """Yield (field_number, wire_type, value) triples from a message body.
    Varint/fixed values come back as ints, length-delimited as bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            val, i = _read_varint(buf, i)
        elif wt == _WT_I64:
            val, i = buf[i : i + 8], i + 8
        elif wt == _WT_LEN:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            val, i = buf[i : i + ln], i + ln
        elif wt == _WT_I32:
            val, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _signed(v: int) -> int:
    """Protobuf int32/int64 negative values arrive as 64-bit two's
    complement varints."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_stop_time_event(buf) -> int | None:
    delay = None
    for fno, wt, val in _iter_fields(buf):
        if fno == 1 and wt == _WT_VARINT:
            delay = _signed(val)
    return delay


def _decode_stop_time_update(buf) -> dict:
    stu = {
        "stop_sequence": None,
        "stop_id": None,
        "arrival_delay": None,
        "departure_delay": None,
    }
    for fno, wt, val in _iter_fields(buf):
        if fno == 1 and wt == _WT_VARINT:
            stu["stop_sequence"] = val
        elif fno == 4 and wt == _WT_LEN:
            stu["stop_id"] = bytes(val).decode("utf-8")
        elif fno in (2, 3) and wt == _WT_LEN:
            which = "arrival_delay" if fno == 2 else "departure_delay"
            stu[which] = _decode_stop_time_event(val)
    return stu


def wire_decoder(blob: bytes) -> list[dict]:
    """Dependency-free FeedMessage parse: one output row per
    (trip_update, stop_time_update), same shape as ``protobuf_decoder``."""
    rows = []
    for fno, wt, ent in _iter_fields(blob):
        if fno != 2 or wt != _WT_LEN:
            continue  # not a FeedEntity
        tu = None
        for efno, ewt, ev in _iter_fields(ent):
            if efno == 3 and ewt == _WT_LEN:
                tu = ev
        if tu is None:
            continue  # vehicle/alert-only entity
        trip = {"trip_id": "", "start_time": None, "start_date": None, "route_id": None}
        stus = []
        for tfno, twt, tv in _iter_fields(tu):
            if tfno == 1 and twt == _WT_LEN:
                for dfno, dwt, dv in _iter_fields(tv):
                    if dwt != _WT_LEN:
                        continue
                    if dfno == 1:
                        trip["trip_id"] = bytes(dv).decode("utf-8")
                    elif dfno == 2:
                        trip["start_time"] = bytes(dv).decode("utf-8")
                    elif dfno == 3:
                        trip["start_date"] = bytes(dv).decode("utf-8")
                    elif dfno == 5:
                        trip["route_id"] = bytes(dv).decode("utf-8")
            elif tfno == 2 and twt == _WT_LEN:
                stus.append(_decode_stop_time_update(tv))
        for stu in stus:
            rows.append(
                {
                    "trip_id": trip["trip_id"],
                    "start_date": trip["start_date"],
                    "start_time": trip["start_time"],
                    "route_id": trip["route_id"],
                    **stu,
                }
            )
    return rows


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's complement, 10-byte encoding
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _f_varint(fno: int, v: int) -> bytes:
    return _varint(fno << 3 | _WT_VARINT) + _varint(v)


def _f_len(fno: int, payload: bytes) -> bytes:
    return _varint(fno << 3 | _WT_LEN) + _varint(len(payload)) + payload


def encode_feed_message(
    rows: list[dict], header_timestamp: int | None = None, version: str = "2.0"
) -> bytes:
    """Inverse of ``wire_decoder`` for building binary test fixtures: each
    row dict (RT_UPDATES field subset) becomes one FeedEntity with a
    single stop_time_update.  Emits spec-compliant wire bytes any
    conforming GTFS-rt consumer can read."""
    header = _f_len(1, version.encode("utf-8"))
    if header_timestamp is not None:
        header += _f_varint(3, int(header_timestamp))
    msg = _f_len(1, header)
    for idx, r in enumerate(rows):
        trip = b""
        if r.get("trip_id"):
            trip += _f_len(1, r["trip_id"].encode("utf-8"))
        if r.get("start_time"):
            trip += _f_len(2, r["start_time"].encode("utf-8"))
        if r.get("start_date"):
            trip += _f_len(3, r["start_date"].encode("utf-8"))
        if r.get("route_id"):
            trip += _f_len(5, r["route_id"].encode("utf-8"))
        stu = b""
        if r.get("stop_sequence") is not None:
            stu += _f_varint(1, r["stop_sequence"])
        if r.get("arrival_delay") is not None:
            stu += _f_len(2, _f_varint(1, r["arrival_delay"]))
        if r.get("departure_delay") is not None:
            stu += _f_len(3, _f_varint(1, r["departure_delay"]))
        if r.get("stop_id"):
            stu += _f_len(4, r["stop_id"].encode("utf-8"))
        tu = _f_len(1, trip) + _f_len(2, stu)
        entity = _f_len(1, str(idx).encode("utf-8")) + _f_len(3, tu)
        msg += _f_len(2, entity)
    return msg


def decode_feed_messages(
    feed_files: DataFrame,
    decoder: Callable[[bytes], list[dict]] = wire_decoder,
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
