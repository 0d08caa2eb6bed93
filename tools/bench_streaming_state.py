"""Streaming state-store rehearsal: default (HDFS-backed, executor-heap)
vs RocksDB provider for the stateful streaming catalog entries, at a
scaled sf dir (default the sf1 replica tools/make_scaled_sf.py builds).

The round-5 sf1 rehearsal measured stream_near_dup scaling 6.4× at 10×
data on the DEFAULT store — state growth, not compute — and the RocksDB
opt-in (streaming/pipeline.py rocksdb_state) existed but was never
benched.  This harness runs each entry under both providers and prints
one JSON line; the committed artifact is BENCH_sf1_state.json.

Round 7 adds STATE-SIZE telemetry (verdict task #8): a
StreamingQueryListener captures every progress event's stateOperators —
numRowsTotal, memoryUsedBytes, and the provider's customMetrics (for
RocksDB: rocksdbSstFileSize = on-disk bytes, rocksdbTotalMemoryUsage) —
so the artifact states the RocksDB story in rows and bytes per batch,
not just wall time.

Usage: python tools/bench_streaming_state.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.streaming.pipeline import rocksdb_state

ENTRIES = ("stream_near_dup", "stream_near_dup_ttl", "basis_stream")

#: RocksDB custom metrics worth publishing (bytes); absent on the
#: default provider, harmlessly skipped
_ROCKSDB_BYTES = ("rocksdbSstFileSize", "rocksdbTotalMemoryUsage")


class _StateMetricsListener(StreamingQueryListener):
    """Collects per-batch state-operator metrics from every streaming
    query progress event (the listener bus is async — drain before
    reading)."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (API naming)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        ops = []
        for so in p.stateOperators:
            rec = {
                "operator": so.operatorName,
                "rows_total": so.numRowsTotal,
                "memory_bytes": so.memoryUsedBytes,
            }
            custom = dict(so.customMetrics or {})
            for key in _ROCKSDB_BYTES:
                if key in custom:
                    rec[key] = int(custom[key])
            ops.append(rec)
        if ops:
            self.batches.append({"batch_id": p.batchId, "state": ops})

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def drain(self, since: int, settle_s: float = 0.3, max_wait_s: float = 10.0):
        """Events recorded after index ``since``, once the async bus has
        gone quiet (no new events for ``settle_s``)."""
        deadline = time.time() + max_wait_s
        last_len = len(self.batches)
        quiet_at = time.time()
        while time.time() < deadline:
            cur = len(self.batches)
            if cur != last_len:
                last_len, quiet_at = cur, time.time()
            elif time.time() - quiet_at >= settle_s:
                break
            time.sleep(0.05)
        return list(self.batches[since:])


def _summarize(batches: list[dict]) -> dict:
    """Maxima across a run's batches (state grows monotonically within
    a run for these entries, so the max is the end-of-run footprint)."""
    out = {
        "batches": len(batches),
        "state_rows_max": 0,
        "state_memory_bytes_max": 0,
    }
    for b in batches:
        for so in b["state"]:
            out["state_rows_max"] = max(out["state_rows_max"], so["rows_total"])
            out["state_memory_bytes_max"] = max(
                out["state_memory_bytes_max"], so["memory_bytes"]
            )
            for key in _ROCKSDB_BYTES:
                if key in so:
                    k = f"{key}_max"
                    out[k] = max(out.get(k, 0), so[key])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session("bench-streaming-state")
    listener = _StateMetricsListener()
    spark.streams.addListener(listener)
    # warm the JVM + parquet footers so rep timings measure the streams
    Q.REGISTRY["stream_dedup"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()

    out: dict[str, dict[str, dict]] = {e: {} for e in ENTRIES}
    for provider in ("default", "rocksdb"):
        for name in ENTRIES:
            fn = Q.REGISTRY[name].fn
            walls, states = [], []
            for _ in range(reps):
                mark = len(listener.batches)
                t0 = time.time()
                if provider == "rocksdb":
                    with rocksdb_state(spark):
                        fn(spark, sf_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                else:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                walls.append(round(time.time() - t0, 3))
                release_persisted()
                batches = listener.drain(mark)
                states.append(
                    {"summary": _summarize(batches), "per_batch": batches}
                )
                print(
                    f"# {provider} {name} {walls[-1]}s "
                    f"state={states[-1]['summary']}",
                    file=sys.stderr,
                    flush=True,
                )
            out[name][provider] = {"wall_s": walls, "state": states}
    # round-10: bucket-WIDTH sweep (verdict task #4) — quantify the
    # √keys rule's value-size trade by running the two near-dup entries
    # at two explicit widths under the RocksDB provider (the bounded-
    # memory production setting).  Fewer/fatter vs more/slimmer rows:
    # the artifact records wall time AND state bytes per width.
    widths: dict[str, dict[str, dict]] = {}
    for n_buckets in (1024, 4096):
        for name in ("stream_near_dup", "stream_near_dup_ttl"):
            fn = getattr(Q, f"q_{name}")
            walls, states = [], []
            for _ in range(reps):
                mark = len(listener.batches)
                t0 = time.time()
                with rocksdb_state(spark):
                    fn(spark, sf_dir, n_buckets=n_buckets).write.format(
                        "noop"
                    ).mode("overwrite").save()
                walls.append(round(time.time() - t0, 3))
                release_persisted()
                batches = listener.drain(mark)
                states.append({"summary": _summarize(batches)})
                print(
                    f"# width={n_buckets} {name} {walls[-1]}s "
                    f"state={states[-1]['summary']}",
                    file=sys.stderr,
                    flush=True,
                )
            widths.setdefault(name, {})[str(n_buckets)] = {
                "wall_s": walls,
                "state": states,
            }
    out["bucket_width_sweep_rocksdb"] = widths
    print(
        json.dumps(
            {
                "metric": "streaming_state_store_wall_time",
                "unit": "sec",
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
