"""Interleaved A/B for the CC convergence probe: committed observe-on-
checkpoint loop (1 action/round) vs the r11 two-action loop (checkpoint
+ scalar agg collect).  Measures the full dedup_clusters catalog entry
and reports job counts.

Usage: SPARK_GRAFT_SF_DIR=... python /tmp/profile_cc.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark.operators import clustering as C
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session


def connected_components_old(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    spark = pairs.sparkSession

    def cut(df: DataFrame) -> DataFrame:
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = cut(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )
    labels = cut(
        edges.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("cluster", F.col("id"))
    )
    _label_sum = F.sum(F.col("cluster").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).collect()[0][0]
    for _ in range(max_iter):
        contrib = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "cluster"
        )
        neigh = (
            contrib.unionByName(labels)
            .groupBy("id")
            .agg(F.min("cluster").alias("cluster"))
            .persist()
        )
        try:
            parent = neigh.select(
                F.col("id").alias("_p_id"),
                F.col("cluster").alias("_p_cluster"),
            )
            labels = cut(
                neigh.join(
                    parent, neigh.cluster == F.col("_p_id"), "left"
                ).select(
                    "id", F.coalesce("_p_cluster", "cluster").alias("cluster")
                )
            )
        finally:
            neigh.unpersist()
        new_sum = labels.agg(_label_sum).collect()[0][0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError("no converge")


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def jobs(spark):
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else v.get()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("profile-cc")
    entry = Q.REGISTRY["dedup_clusters"].fn

    # parity once: swap implementations via monkeypatch
    new_rows = sorted(map(tuple, entry(spark, sf_dir).collect()))
    release_persisted()
    saved = C.connected_components
    C.connected_components = connected_components_old
    try:
        old_rows = sorted(map(tuple, entry(spark, sf_dir).collect()))
    finally:
        C.connected_components = saved
    release_persisted()
    print(f"parity: {new_rows == old_rows} ({len(new_rows)} rows)", flush=True)
    assert new_rows == old_rows

    for r in range(reps):
        for name, impl in (("old", connected_components_old), ("new", saved)):
            C.connected_components = impl
            try:
                j0 = jobs(spark)
                t = noop(entry(spark, sf_dir))
                nj = jobs(spark) - j0
            finally:
                C.connected_components = saved
            release_persisted()
            print(f"rep{r} cc {name}: {t}s jobs={nj}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
