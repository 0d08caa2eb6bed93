"""sf10 spot rehearsal: time the heaviest catalog workloads at 100× of
sf0.1 (two decades above the driver's bench scale) and append one JSON
line per query to a results file, so partial progress survives driver
timeouts.  The committed artifact is BENCH_sf10_spot.json (assembled
from the lines).

Entries (the round-5 verdict's pick of the five heaviest):
- semantic_dedup_sqrtN: the PRODUCTION SemDeDup configuration (k=None
  → √N auto-valve), not the catalog entry's k=8 oracle pin — the
  verdict explicitly warns the pinned entry must not be quoted as a
  scaling datapoint.
- minhash_near_dups_xxhash, curation_funnel, winnow_passage_overlap:
  the catalog fns as-is.
- stream_near_dup_rocksdb: the catalog fn under the RocksDB state
  store (the documented 100 TB setting, measured at sf1 in
  BENCH_sf1_state.json).

Usage: python tools/bench_sf10_spot.py SF_DIR OUT_FILE [name ...]
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
from dystonse_gtfs_data_spark.sources.tables import load_table
from dystonse_gtfs_data_spark.streaming.pipeline import rocksdb_state


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_semantic_sqrtn(spark, sf_dir):
    from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    # same rounds/threshold as the catalog entry; k=None -> sqrt(N) valve
    _noop(semantic_dedup(emb, k=None, rounds=2, threshold=0.4))


def run_stream_near_dup_rocksdb(spark, sf_dir):
    with rocksdb_state(spark):
        _noop(Q.REGISTRY["stream_near_dup"].fn(spark, sf_dir))


SPECIALS = {
    "semantic_dedup_sqrtN": run_semantic_sqrtn,
    "stream_near_dup_rocksdb": run_stream_near_dup_rocksdb,
}

DEFAULT_NAMES = (
    "minhash_near_dups_xxhash",
    "winnow_passage_overlap",
    "curation_funnel",
    "semantic_dedup_sqrtN",
    "stream_near_dup_rocksdb",
)


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    names = sys.argv[3:] or list(DEFAULT_NAMES)
    spark = build_session("bench-sf10-spot")
    for t in ("documents", "embeddings", "events"):
        _noop(load_table(spark, sf_dir, t))  # warm footers/page cache
    for name in names:
        t0 = time.time()
        err = None
        try:
            if name in SPECIALS:
                SPECIALS[name](spark, sf_dir)
            else:
                _noop(Q.REGISTRY[name].fn(spark, sf_dir))
        except Exception as exc:  # record, keep measuring the rest
            err = str(exc)[:300]
        wall = round(time.time() - t0, 2)
        release_persisted()
        line = {"query": name, "sf_dir": sf_dir, "wall_sec": wall, "err": err}
        with open(out_path, "a") as fh:
            fh.write(json.dumps(line) + "\n")
        print(f"# {name} {wall}s err={err}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
