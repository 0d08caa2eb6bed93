"""A/B: semantic_dedup_hier (and flat consumers as guard) with kmeans_assign
variants:
  base    committed
  pquant  lazy tracked_persist of the quantized (vid, xq) table
  ppart   persist of quant.repartition("vid") so downstream vid-keyed ops
          reuse one layout

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_hier.py [reps] [entries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators import clustering as C
from dystonse_gtfs_data_spark.operators.dedup import _spread, portable_base_hash
from dystonse_gtfs_data_spark.operators.clustering import KM_SCALE
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table

_ORIG = C.kmeans_assign
VARIANT = "base"


def kmeans_assign_v(
    embeddings, id_col="vec_id", vec_col="embedding", k=8, rounds=2, coarse=None
):
    q = F.transform(
        F.col(vec_col),
        lambda e: F.floor(
            e.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5)
        ).cast("bigint"),
    )
    quant = _spread(embeddings).select(F.col(id_col).alias("vid"), q.alias("xq"))
    if VARIANT == "pquant":
        quant = tracked_persist(quant)
    elif VARIANT == "ppart":
        quant = tracked_persist(quant.repartition("vid"))
    longf = quant.select("vid", F.posexplode("xq").alias("dim", "x"))
    topk = (
        quant.withColumn("_h", portable_base_hash(F.col("vid").cast("string")))
        .orderBy("_h", "vid")
        .limit(k)
    )
    wh = Window.orderBy("_h", "vid")
    seeds = topk.withColumn("cid", F.row_number().over(wh) - 1).drop("_h")

    def _one(col):
        return F.pmod(F.hash(col), F.lit(1))

    cents_arr = seeds.select("cid", F.col("xq").alias("cq")).withColumn(
        "_one", _one(F.col("cid"))
    )

    def _d2(xq, cq):
        return F.aggregate(
            F.zip_with(xq, cq, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + e,
        )

    hier = coarse is not None and 1 < coarse < k

    def _cut_small(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    assign = None
    for _ in range(rounds):
        if hier:
            cents_arr = _cut_small(cents_arr)
            gq_tbl = (
                cents_arr.filter(F.col("cid") < coarse)
                .select(F.col("cid").alias("gid"), F.col("cq").alias("gq"))
                .withColumn("_one", _one(F.col("gid")))
            )
            cell = (
                cents_arr.withColumn("_one", _one(F.col("cid")))
                .join(F.broadcast(gq_tbl), "_one")
                .select(
                    "cid",
                    F.struct(
                        _d2(F.col("cq"), F.col("gq")).alias("d2"), F.col("gid")
                    ).alias("_dg"),
                )
                .groupBy("cid")
                .agg(F.min("_dg").alias("_m"))
                .select("cid", F.col("_m.gid").alias("gid"))
            )
            vcell = (
                quant.withColumn("_one", _one(F.col("vid")))
                .join(F.broadcast(gq_tbl), "_one")
                .select(
                    "vid",
                    "xq",
                    F.struct(
                        _d2(F.col("xq"), F.col("gq")).alias("d2"), F.col("gid")
                    ).alias("_dg"),
                )
                .groupBy("vid", "xq")
                .agg(F.min("_dg").alias("_m"))
                .select("vid", "xq", F.col("_m.gid").alias("gid"))
            )
            fine = cents_arr.join(cell, "cid").select("cid", "cq", "gid")
            pairs = vcell.join(F.broadcast(fine), "gid")
        else:
            pairs = quant.withColumn("_one", _one(F.col("vid"))).join(
                F.broadcast(cents_arr), "_one"
            )
        assign = (
            pairs.select(
                "vid",
                F.struct(_d2(F.col("xq"), F.col("cq")).alias("d2"), F.col("cid")).alias(
                    "_dc"
                ),
            )
            .groupBy("vid")
            .agg(F.min("_dc").alias("_m"))
            .select("vid", F.col("_m.cid").alias("cid"))
        )
        cents_long = (
            longf.join(assign, "vid")
            .groupBy("cid", "dim")
            .agg(
                F.floor(F.sum("x") / F.count("*") + F.lit(0.5))
                .cast("bigint")
                .alias("c")
            )
        )
        cents_arr = (
            cents_long.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("cq")
            )
            .withColumn("_one", _one(F.col("cid")))
        )
    sizes = assign.groupBy("cid").agg(F.count("*").alias("cluster_size"))
    return assign.join(F.broadcast(sizes), "cid").select(
        F.col("vid").alias(id_col), F.col("cid").alias("cluster"), "cluster_size"
    )


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    global VARIANT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    entries = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "semantic_dedup_hier,semantic_dedup,kmeans_clusters,semantic_dedup_windowed"
    ).split(",")
    variants = (sys.argv[3] if len(sys.argv) > 3 else "base,pquant,ppart").split(",")
    spark = build_session("profile-hier")
    C.kmeans_assign = kmeans_assign_v
    load_table(spark, sf_dir, "embeddings").write.format("noop").mode(
        "overwrite"
    ).save()
    # parity once per entry (variant vs orig) then warm
    for e in entries:
        VARIANT = "base"
        C.kmeans_assign = _ORIG
        a = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
        release_persisted()
        C.kmeans_assign = kmeans_assign_v
        for v in variants:
            VARIANT = v
            b = sorted(map(tuple, Q.REGISTRY[e].fn(spark, sf_dir).collect()))
            release_persisted()
            print(f"parity {e} {v}: {a == b}", flush=True)
            assert a == b
    for r in range(reps):
        for e in entries:
            for v in variants:
                VARIANT = v
                t = noop(Q.REGISTRY[e].fn(spark, sf_dir))
                release_persisted()
                print(f"rep{r} {e} {v}: {t}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
