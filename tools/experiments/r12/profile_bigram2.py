"""A/B: bigram_lm_score base vs 'pc2' — lazy tracked_persist of the
AGGREGATED (w1,w2,c2) count table + vocab derived from c2 instead of
inst.  This cuts the exploded-bigram chain from 4 executions per action
(inst main, c2 join, c1 chain, vocab distinct) to 2 (inst main + one
c2 build that c1/vocab/join all reuse), while persisting only the
vocabulary-sized aggregate instead of the corpus-sized explode (the
r12 'inst persist' variant measured NEGATIVE at sf1: 2.65 -> 3.0+ s).

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_bigram2.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators.dedup import _spread
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table, maybe_broadcast


def bigram_scored_v(spark, sf_dir, variant):
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
    c2 = inst.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    if variant == "pc2":
        c2 = tracked_persist(c2)
        vocab = c2.select(F.countDistinct("w2").alias("v"))
    else:
        vocab = inst.select(F.countDistinct("w2").alias("v"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
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


def q_bigram_v(spark, sf_dir, v):
    scored = bigram_scored_v(spark, sf_dir, v)
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
    spark = build_session("profile-bigram2")
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    noop(q_bigram_v(spark, sf_dir, "base"))
    release_persisted()
    a = q_bigram_v(spark, sf_dir, "base").orderBy("doc_id").collect()
    release_persisted()
    b = q_bigram_v(spark, sf_dir, "pc2").orderBy("doc_id").collect()
    release_persisted()
    print("parity:", a == b, flush=True)
    assert a == b
    for r in range(reps):
        for v in ("base", "pc2"):
            t = noop(q_bigram_v(spark, sf_dir, v))
            release_persisted()
            print(f"rep{r} bigram {v}: {t}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
