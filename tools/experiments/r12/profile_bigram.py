"""A/B: bigram_lm_score / perplexity_buckets with vs without a lazy
tracked_persist of the exploded (doc_id, w1, w2) bigram table.

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_bigram.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators.dedup import _spread
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table, maybe_broadcast


def bigram_scored_v(spark, sf_dir, persist_inst):
    d = _spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    inst = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.struct(
                        F.get(F.col("toks"), i).alias("w1"),
                        F.get(F.col("toks"), i + 1).alias("w2"),
                    ),
                )
            ).alias("bi"),
        )
        .select("doc_id", "bi.w1", "bi.w2")
    )
    if persist_inst:
        inst = tracked_persist(inst)
    c2 = inst.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = inst.select(F.countDistinct("w2").alias("v"))
    return (
        inst.join(maybe_broadcast(c2), ["w1", "w2"])
        .join(maybe_broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )


def q_bigram_v(spark, sf_dir, p):
    scored = bigram_scored_v(spark, sf_dir, p)
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp").cast("double").alias("sum_logprob"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias("avg_logprob"),
    )


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("profile-bigram")
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    noop(q_bigram_v(spark, sf_dir, False))  # codegen warm
    release_persisted()
    # result parity check once
    a = q_bigram_v(spark, sf_dir, False).orderBy("doc_id").collect()
    release_persisted()
    b = q_bigram_v(spark, sf_dir, True).orderBy("doc_id").collect()
    release_persisted()
    print("parity:", a == b, flush=True)
    for r in range(reps):
        for name, p in (("base", False), ("persist", True)):
            t = noop(q_bigram_v(spark, sf_dir, p))
            release_persisted()
            print(f"rep{r} bigram {name}: {t}s", flush=True)
    # perplexity_buckets rides the same helper; measure the committed one
    # only as context (its internal change will follow the same shape)
    spark.stop()


if __name__ == "__main__":
    main()
