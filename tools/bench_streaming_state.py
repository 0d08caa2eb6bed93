"""Streaming state-store rehearsal: default (HDFS-backed, executor-heap)
vs RocksDB provider for the stateful streaming catalog entries, at a
scaled sf dir (default the sf1 replica tools/make_scaled_sf.py builds).

The round-5 sf1 rehearsal measured stream_near_dup scaling 6.4× at 10×
data on the DEFAULT store — state growth, not compute — and the RocksDB
opt-in (streaming/pipeline.py rocksdb_state) existed but was never
benched.  This harness runs each entry under both providers and prints
one JSON line; the committed artifact is BENCH_sf1_state.json.

Usage: python tools/bench_streaming_state.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.streaming.pipeline import rocksdb_state

ENTRIES = ("stream_near_dup", "stream_near_dup_ttl", "basis_stream")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session("bench-streaming-state")
    # warm the JVM + parquet footers so rep timings measure the streams
    Q.REGISTRY["stream_dedup"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()

    out: dict[str, dict[str, list[float]]] = {e: {} for e in ENTRIES}
    for provider in ("default", "rocksdb"):
        for name in ENTRIES:
            fn = Q.REGISTRY[name].fn
            walls = []
            for _ in range(reps):
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
                print(
                    f"# {provider} {name} {walls[-1]}s",
                    file=sys.stderr,
                    flush=True,
                )
            out[name][provider] = walls
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
