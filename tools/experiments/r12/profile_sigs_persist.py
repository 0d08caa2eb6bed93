"""A/B: persist the narrow signature tables so the LSH/chunk self-joins
stop recomputing the signature chain twice.

Variants (monkeypatch on dedup module internals):
  base   committed
  psig   minhash: tracked_persist(sigs); simhash: tracked_persist(sig)

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_sigs_persist.py [reps] [entries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators import dedup as D
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table

_ORIG_MH = D.minhash_near_duplicates
_ORIG_SH = D.simhash_near_duplicates


def minhash_near_duplicates_p(
    docs, text_col="text", id_col="doc_id", num_hashes=64,
    num_bands=16, shingle_k=3, threshold=0.8, base_hash="xxhash64",
):
    rows = num_hashes // num_bands
    sigs = tracked_persist(
        D.minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k, base_hash)
    )
    cands = D.minhash_lsh_candidates(sigs, id_col, num_bands, rows)
    return D.ngram_jaccard_pairs(docs, cands, text_col, id_col, shingle_k, threshold)


def simhash_near_duplicates_p(
    docs, text_col="text", id_col="doc_id", max_hamming=3,
    base_hash="xxhash64", hot_bucket_cap=None,
):
    import dystonse_gtfs_data_spark.operators.dedup as DD

    saved = DD.simhash
    try:
        DD.simhash = lambda *a, **k: tracked_persist(saved(*a, **k))
        return _ORIG_SH(docs, text_col, id_col, max_hamming, base_hash, hot_bucket_cap)
    finally:
        DD.simhash = saved


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    entries = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "minhash_near_dups_xxhash,simhash_near_dups_xxhash,minhash_near_dups_rolling"
    ).split(",")
    spark = build_session("profile-sigs-persist")
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    def with_variant(v, fn):
        if v == "psig":
            D.minhash_near_duplicates = minhash_near_duplicates_p
            D.simhash_near_duplicates = simhash_near_duplicates_p
            Q.minhash_near_duplicates = minhash_near_duplicates_p
            Q.simhash_near_duplicates = simhash_near_duplicates_p
        try:
            return fn()
        finally:
            D.minhash_near_duplicates = _ORIG_MH
            D.simhash_near_duplicates = _ORIG_SH
            Q.minhash_near_duplicates = _ORIG_MH
            Q.simhash_near_duplicates = _ORIG_SH

    for e in entries:
        a = with_variant("base", lambda: sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect())))
        release_persisted()
        b = with_variant("psig", lambda: sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect())))
        release_persisted()
        print(f"parity {e}: {a == b} ({len(a)} rows)", flush=True)
        assert a == b
    # warm
    for e in entries:
        for v in ("base", "psig"):
            with_variant(v, lambda: noop(Q.REGISTRY[e].fn(spark, sf_dir)))
            release_persisted()
    for r in range(reps):
        for e in entries:
            for v in ("base", "psig"):
                t = with_variant(v, lambda: noop(Q.REGISTRY[e].fn(spark, sf_dir)))
                release_persisted()
                print(f"rep{r} {e} {v}: {t}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
