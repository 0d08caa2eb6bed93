"""A/B for the two remaining rolling-kernel families whose output feeds
a self-join (MapInPandas does not canonicalize -> kernel runs per side):

  minhash_near_dups_rolling : persist the kernel signature table
  winnow_passage_overlap_rolling : persist the kernel fingerprint table

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_rollp.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators import dedup as D
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table

_ORIG_MS = D._minhash_signatures_rolling
_ORIG_WF = D.winnow_fingerprints_rolling
VARIANT = "base"


def ms_p(*a, **k):
    out = _ORIG_MS(*a, **k)
    return tracked_persist(out) if VARIANT == "p" else out


def wf_p(*a, **k):
    out = _ORIG_WF(*a, **k)
    return tracked_persist(out) if VARIANT == "p" else out


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    global VARIANT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("profile-rollp")
    D._minhash_signatures_rolling = ms_p
    D.winnow_fingerprints_rolling = wf_p
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    entries = ["minhash_near_dups_rolling", "winnow_passage_overlap_rolling"]
    for e in entries:
        VARIANT = "base"
        a = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
        release_persisted()
        VARIANT = "p"
        b = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
        release_persisted()
        print(f"parity {e}: {a == b} ({len(a)} rows)", flush=True)
        assert a == b
    for e in entries:
        for v in ("base", "p"):
            VARIANT = v
            noop(Q.REGISTRY[e].fn(spark, sf_dir))
            release_persisted()
    for r in range(reps):
        for e in entries:
            for v in ("base", "p"):
                VARIANT = v
                t = noop(Q.REGISTRY[e].fn(spark, sf_dir))
                release_persisted()
                print(f"rep{r} {e} {v}: {t}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
