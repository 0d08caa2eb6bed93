"""Interleaved A/B: minhash_near_dups_xxhash / simhash_near_dups_xxhash
with the committed JVM signature stage vs the Arrow xxhash64 kernels.

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_sig.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/tmp")

from pyspark.sql import functions as F

from sig_kernels import minhash_signatures_kernel, simhash_kernel

from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark.operators import dedup as D
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table


def minhash_entry(docs, kernel: bool):
    if kernel:
        sigs = minhash_signatures_kernel(docs, "text", "doc_id", 64, 3)
    else:
        sigs = D.minhash_signatures(docs, base_hash="xxhash64")
    cands = D.minhash_lsh_candidates(sigs, "doc_id", 16, 4)
    return D.ngram_jaccard_pairs(docs, cands, "text", "doc_id", 3, 0.5)


def simhash_entry(docs, kernel: bool):
    if kernel:
        sig = simhash_kernel(docs, "text", "doc_id")
    else:
        sig = D.simhash(docs, base_hash="xxhash64")
    # inline of simhash_near_duplicates below the signature stage
    chunks = sig.select(
        F.col("doc_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
    )
    return (
        cand.distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_session("profile-sig")
    spark.sparkContext.addPyFile("/tmp/sig_kernels.py")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    # parity first (collect both, compare sorted)
    for name, fn in (("minhash", minhash_entry), ("simhash", simhash_entry)):
        a = sorted(map(tuple, fn(docs, False).collect()))
        release_persisted()
        b = sorted(map(tuple, fn(docs, True).collect()))
        release_persisted()
        print(f"parity {name}: {a == b} ({len(a)} vs {len(b)} rows)", flush=True)
        assert a == b
    # warm both variants once
    for fn in (minhash_entry, simhash_entry):
        for kern in (False, True):
            noop(fn(docs, kern))
            release_persisted()
    for r in range(reps):
        for name, fn in (("minhash", minhash_entry), ("simhash", simhash_entry)):
            for kern in (False, True):
                t = noop(fn(docs, kern))
                release_persisted()
                print(
                    f"rep{r} {name} {'kernel' if kern else 'jvm'}: {t}s",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
