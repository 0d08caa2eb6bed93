"""VERDICT item 7: stream_near_dup repeated same-session measurement with
calibration bracketing, to settle drift-vs-interaction for the r11
start 6.4 s -> end 9.2 s raw move (driver r11 measured 3.68 s)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table


def probe(spark):
    from pyspark.sql import functions as F

    t0 = time.time()
    (
        spark.range(0, 10_000_000, 1, 32)
        .select(
            (F.xxhash64("id") % 100_000).alias("k"),
            (F.xxhash64("id", F.lit(1)) % 1_000).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .agg(F.sum("s"), F.sum("c"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.time() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session("profile-stream")
    load_table(spark, sf_dir, "events").write.format("noop").mode(
        "overwrite"
    ).save()
    probe(spark)
    for r in range(reps):
        c0 = probe(spark)
        t0 = time.time()
        Q.REGISTRY["stream_near_dup"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        t = round(time.time() - t0, 3)
        release_persisted()
        print(f"rep{r} stream_near_dup: {t}s (probe {c0})", flush=True)
    print(f"final probe: {probe(spark)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
