"""Measure-first harness for curation_funnel_fused + exact_substring_dedup:
per-stage noop timings and whole-entry A/B of candidate optimizations.

Variants (env VAR=...):
  V=base    committed code path
  V=occ     persist the narrow (id,pos,gh) occ table inside ExactSubstr
  V=ghpart  repartition occ by gh so hot-agg and cand-join share one exchange

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python /tmp/profile_funnel.py [stage|entry|ab]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.cache import release_persisted, tracked_persist
from dystonse_gtfs_data_spark.operators.dedup import (
    _gram_hash_rows,
    _pos_key,
    _spread,
    decontaminate,
    exact_substring_dedup,
)
from dystonse_gtfs_data_spark.operators.selection import gopher_quality_rules
from dystonse_gtfs_data_spark.queries import (
    _FUNNEL_BENCH_MOD,
    _FUNNEL_MIN_WORDS,
    _FUNNEL_MIN_STOPWORDS,
    _FUNNEL_SEP,
    _FUNNEL_SHINGLE_K,
    _FUNNEL_SUBSTR_LEN,
)
from dystonse_gtfs_data_spark import queries as Q
from dystonse_gtfs_data_spark.queries import Ft
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import load_table, maybe_broadcast


def exact_substring_dedup_v(
    docs, min_len, variant, text_col="text", id_col="doc_id", sep=" "
):
    """Copy of exact_substring_dedup with occ-level experiments."""
    arr = F.split(F.col(text_col), re.escape(sep))
    base = _spread(docs).select(F.col(id_col), arr.alias("_arr"))
    occ = _gram_hash_rows(base, min_len, sep, id_col, "rolling")
    if variant == "occ":
        occ = tracked_persist(occ)
    elif variant == "ghpart":
        occ = occ.repartition("gh")
    hot = occ.groupBy("gh").agg(F.count("*").alias("_c")).filter(F.col("_c") > 1)
    cand = occ.join(hot.select("gh"), "gh").drop("gh")
    withtext = tracked_persist(
        cand.join(base, id_col)
        .select(
            F.col(id_col),
            "pos",
            F.concat_ws(sep, F.slice(F.col("_arr"), F.col("pos") + 1, min_len)).alias(
                "gtext"
            ),
        )
        .withColumn("_pk", _pos_key(id_col, "pos"))
    )
    tstats = withtext.groupBy("gtext").agg(
        F.count("*").alias("_n"), F.min("_pk").alias("_first")
    )
    dups = (
        withtext.join(tstats, "gtext")
        .filter((F.col("_n") > 1) & (F.col("_pk") != F.col("_first")))
        .select(id_col, "pos", (F.col("pos") + min_len).alias("end"))
    )
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_max = F.max("end").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        dups.withColumn(
            "_new", (prev_max.isNull() | (F.col("pos") > prev_max)).cast("int")
        )
        .withColumn(
            "_island", F.sum("_new").over(wd.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy(id_col, "_island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("_ivs"))
    )

    def _keep(tok):
        return ~F.exists("_ivs", lambda v: (tok["i"] >= v["s"]) & (tok["i"] < v["e"]))

    idxed = F.transform(F.col("_arr"), lambda x, i: F.struct(i.alias("i"), x.alias("t")))
    kept = F.filter(idxed, _keep)
    return (
        base.join(islands, id_col, "left")
        .withColumn("_ivs", F.coalesce(F.col("_ivs"), F.array()))
        .select(
            F.col(id_col),
            F.array_join(F.transform(kept, lambda s: s["t"]), sep).alias("clean_text"),
            F.size("_arr").cast("long").alias("n_tokens"),
            (F.size("_arr") - F.size(kept)).cast("long").alias("removed_tokens"),
            F.size("_ivs").cast("long").alias("n_spans"),
        )
    )


def build_funnel(spark, sf_dir, variant):
    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = (
        gopher_quality_rules(
            raw, min_words=_FUNNEL_MIN_WORDS, min_stopwords=_FUNNEL_MIN_STOPWORDS
        )
        .filter("passes_gopher")
        .select("doc_id", "text")
    )
    segs = tracked_persist(
        _spread(g)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), re.escape(_FUNNEL_SEP))).alias(
                "ord", "seg"
            ),
        )
        .withColumn("_pk", _pos_key("doc_id", "ord"))
    )
    bp = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > 2)
        .select("seg")
    )
    kept1 = tracked_persist(segs.join(maybe_broadcast(bp), "seg", "left_anti"))
    firsts = kept1.groupBy("seg").agg(F.min("_pk").alias("_first"))
    kept2 = kept1.join(firsts, "seg").filter(F.col("_pk") == F.col("_first"))
    rebuild = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("ord", "seg"))), lambda x: x["seg"]),
        _FUNNEL_SEP,
    )
    p2 = tracked_persist(kept2.groupBy("doc_id").agg(rebuild.alias("text")))
    if variant == "base":
        e2i = exact_substring_dedup(p2, min_len=_FUNNEL_SUBSTR_LEN)
    else:
        e2i = exact_substring_dedup_v(p2, _FUNNEL_SUBSTR_LEN, variant)
    e2 = tracked_persist(e2i.select("doc_id", F.col("clean_text").alias("text")))
    train = tracked_persist(e2.filter(F.col("doc_id") % _FUNNEL_BENCH_MOD != 0))
    bench = raw.filter(F.col("doc_id") % _FUNNEL_BENCH_MOD == 0)
    clean = train.join(
        decontaminate(train, bench, shingle_k=_FUNNEL_SHINGLE_K).select("doc_id"),
        "doc_id",
        "left_anti",
    )

    def _stage(name, df):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(Ft.ws_token_count(F.col("text"))), F.lit(0)).alias(
                "n_tokens"
            ),
        ).select("stage", "n_docs", "n_tokens")

    b2rep = (
        kept1.groupBy("doc_id")
        .agg(Ft.ws_token_count(rebuild).alias("_t"))
        .agg(
            F.lit("2_boilerplate").alias("stage"),
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("_t"), F.lit(0)).alias("n_tokens"),
        )
        .select("stage", "n_docs", "n_tokens")
    )
    funnel = (
        _stage("0_raw", raw)
        .unionByName(_stage("1_quality", g))
        .unionByName(b2rep)
        .unionByName(_stage("3_paragraph_dedup", p2))
        .unionByName(_stage("4_exact_substring", e2))
        .unionByName(_stage("5_decontaminated", clean))
    )
    return funnel.filter(F.col("n_docs") > 0).orderBy("stage"), {
        "gopher": g,
        "segs": segs,
        "kept1": kept1,
        "p2": p2,
        "e2": e2,
        "clean": clean,
        "b2rep": b2rep,
    }


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def jobs(spark):
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else v.get()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1] if len(sys.argv) > 1 else "entry"
    variants = (sys.argv[2] if len(sys.argv) > 2 else "base,occ,ghpart").split(",")
    reps = int(os.environ.get("REPS", "3"))
    spark = build_session("profile-funnel")
    # warm: parquet footers + codegen
    load_table(spark, sf_dir, "documents").write.format("noop").mode("overwrite").save()
    f, _ = build_funnel(spark, sf_dir, "base")
    noop(f)
    release_persisted()

    if mode == "stage":
        for v in variants:
            f, stages = build_funnel(spark, sf_dir, v)
            out = {}
            for name, df in stages.items():
                j0 = jobs(spark)
                out[name] = (noop(df), jobs(spark) - j0)
            j0 = jobs(spark)
            out["FUNNEL(warm-caches)"] = (noop(f), jobs(spark) - j0)
            release_persisted()
            print(v, {k: v_ for k, v_ in out.items()}, flush=True)
    else:  # entry: interleaved whole-entry A/B
        for r in range(reps):
            for v in variants:
                f, _ = build_funnel(spark, sf_dir, v)
                j0 = jobs(spark)
                t = noop(f)
                nj = jobs(spark) - j0
                release_persisted()
                print(f"rep{r} {v}: {t}s jobs={nj}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
