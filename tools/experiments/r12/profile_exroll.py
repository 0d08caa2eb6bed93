"""A/B: persist the rolling shingle-hash table (id, s:int64) inside
ngram_jaccard_near_duplicates' rolling family — the Arrow kernel output
feeds the L/R self-join sides and the sizes agg, and MapInPandas nodes
do not canonicalize for ReuseExchange.

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_exroll.py [reps]
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

_ORIG = D._shingle_hashes_rolling
VARIANT = "base"


def shr_p(*a, **k):
    out = _ORIG(*a, **k)
    if VARIANT == "pex":
        out = tracked_persist(out)
    return out


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    global VARIANT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session("profile-exroll")
    D._shingle_hashes_rolling = shr_p
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    e = "ngram_jaccard_rolling"
    VARIANT = "base"
    a = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
    release_persisted()
    VARIANT = "pex"
    b = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
    release_persisted()
    print(f"parity {e}: {a == b} ({len(a)} rows)", flush=True)
    assert a == b
    for v in ("base", "pex"):
        VARIANT = v
        noop(Q.REGISTRY[e].fn(spark, sf_dir))
        release_persisted()
    for r in range(reps):
        for v in ("base", "pex"):
            VARIANT = v
            t = noop(Q.REGISTRY[e].fn(spark, sf_dir))
            release_persisted()
            print(f"rep{r} {e} {v}: {t}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
