"""Dataset-assembly operators: decontamination, stratified sampling,
mixture, packing, bigram LM — brute-force / closed-form oracles plus
plan-shape guards (the point of these ops is that the corpus never
shuffles)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.dedup import decontaminate
from dystonse_gtfs_data_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    dataset_mixture,
    hash_stratified_sample,
    pack_sequences,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
    (2, "the quick brown fox jumps over the lazy cat", "en", "a"),
    (3, "completely different text with no overlap here", "en", "b"),
    (4, "der schnelle braune fuchs springt", "de", "b"),
    (5, "the quick brown fox sat still", "en", "a"),
    (6, "tiny", "de", "b"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])


def py_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.strip().lower().split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def py_bucket(key, buckets: int = SAMPLE_BUCKETS) -> int:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    return h % buckets


def test_decontaminate_matches_brute_force(spark):
    d = docs_df(spark)
    bench = d.filter(F.col("doc_id").isin(1, 4))
    train = d.filter(~F.col("doc_id").isin(1, 4))
    got = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(train, bench).collect()
    }
    bench_sh = py_shingles(DOCS[0][1]) | py_shingles(DOCS[3][1])
    want = {}
    for doc_id, text, _, _ in DOCS:
        if doc_id in (1, 4):
            continue
        n = len(py_shingles(text) & bench_sh)
        if n:
            want[doc_id] = n
    assert got == want
    assert 2 in want and 3 not in want  # near-dup flagged, clean doc not


def test_decontaminate_benchmark_side_broadcasts(spark):
    d = docs_df(spark)
    bench = d.filter(F.col("doc_id").isin(1))
    train = d.filter(~F.col("doc_id").isin(1))
    plan = decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_is_exact_bucket_filter(spark):
    d = docs_df(spark)
    rates = {"en": 0.5, "de": 0.25}
    kept = {r["doc_id"] for r in hash_stratified_sample(d, rates).collect()}
    want = {
        doc_id
        for doc_id, _, lang, _ in DOCS
        if py_bucket(doc_id) < round(rates[lang] * SAMPLE_BUCKETS)
    }
    assert kept == want
    # determinism: a second run over a repartitioned input is identical
    kept2 = {
        r["doc_id"]
        for r in hash_stratified_sample(d.repartition(7), rates).collect()
    }
    assert kept2 == kept


def test_stratified_sample_plan_has_no_exchange(spark):
    d = docs_df(spark)
    plan = (
        hash_stratified_sample(d, {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side filter


def test_mixture_keeps_underbudget_sources_whole(spark):
    d = docs_df(spark)
    out = dataset_mixture(d, budget_tokens=10_000)
    assert out.count() == len(DOCS)  # every source far under budget


def test_mixture_matches_integer_inequality(spark):
    d = docs_df(spark)
    budget = 10
    kept = {r["doc_id"] for r in dataset_mixture(d, budget).collect()}
    totals = {}
    for _, text, _, source in DOCS:
        totals[source] = totals.get(source, 0) + len(text.strip().split())
    want = {
        doc_id
        for doc_id, _, _, source in DOCS
        if py_bucket(doc_id) * totals[source] < budget * SAMPLE_BUCKETS
    }
    assert kept == want


def test_pack_sequences_matches_sequential_packer(spark):
    d = docs_df(spark)
    cap = 8
    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["token_sum"])
        for r in pack_sequences(d, cap).collect()
    }
    want: dict = {}
    by_source: dict = {}
    for doc_id, text, _, source in sorted(DOCS):
        by_source.setdefault(source, []).append(len(text.strip().split()))
    for source, toks in by_source.items():
        cum = 0
        for n in toks:
            b = cum // cap
            k = (source, b)
            nd, ts = want.get(k, (0, 0))
            want[k] = (nd + 1, ts + n)
            cum += n
    assert got == want


def test_pack_sequences_bin_invariants(spark):
    # bins start at 0; a bin index is only skipped when the bin before the
    # gap overflowed past the skipped capacity (oversized doc)
    d = docs_df(spark)
    cap = 6
    rows = pack_sequences(d, cap).collect()
    for source in {r["source"] for r in rows}:
        per = sorted(
            (r["bin_id"], r["token_sum"]) for r in rows if r["source"] == source
        )
        assert per[0][0] == 0
        for (b0, t0), (b1, _) in zip(per, per[1:]):
            if b1 > b0 + 1:  # skipped bins ⇒ the earlier bin overflowed
                assert t0 > (b1 - b0) * cap - cap


def test_bigram_lm_score_hand_computed(spark, sf_dir):
    # tiny corpus: "a b a b" + "a b" → bigram counts: (a,b)=3, (b,a)=1
    # contexts: c1(a)=3, c1(b)=1; vocab = distinct w2 = {a, b} → V=2
    from dystonse_gtfs_data_spark.queries import REGISTRY

    tiny = spark.createDataFrame(
        [(1, "a b a b", "en", "s"), (2, "a b", "en", "s")],
        ["doc_id", "text", "lang", "source"],
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        tiny.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in REGISTRY["bigram_lm_score"].fn(spark, td).collect()
        }
    lp_ab = round(math.log((3 + 1.0) / (3 + 2)), 6)
    lp_ba = round(math.log((1 + 1.0) / (1 + 2)), 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_logprob"] == pytest.approx(2 * lp_ab + lp_ba, abs=1e-9)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_logprob"] == pytest.approx(lp_ab, abs=1e-9)


def test_reservoir_bucketizer_monotone_and_bounded(spark):
    # the exactness PROOF rests on two properties of the log-scale
    # bucketizer: weakly DECREASING in hv (so every hash smaller than a
    # survivor's maps to an equal-or-higher bucket and survives with it)
    # and a bounded range (so per-key aggregation state is capped at
    # 3841 entries).  Sweep a dense sample of the 60-bit space plus the
    # exact edges.
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    hvs = sorted(
        {0, 1, 2, (1 << 60) - 1, 1 << 59, (1 << 59) - 1}
        | {rng.randrange(1 << 60) for _ in range(20_000)}
    )
    df = spark.createDataFrame([(v,) for v in hvs], "hv long")
    bucket = F.least(
        F.greatest(
            F.floor(
                F.lit(64.0)
                * (F.lit(60.0) - F.log2(F.col("hv").cast("double") + F.lit(1.0)))
            ),
            F.lit(0),
        ),
        F.lit(60 * 64),
    ).cast("int")
    rows = df.select("hv", bucket.alias("b")).orderBy("hv").collect()
    assert rows[0]["hv"] == 0 and rows[0]["b"] == 3840
    prev = None
    for r in rows:
        assert 0 <= r["b"] <= 3840
        if prev is not None:
            assert r["b"] <= prev, (r["hv"], r["b"], prev)
        prev = r["b"]


class TestDeterministicReservoir:
    def test_exact_k_per_key_and_stable(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        df = spark.createDataFrame(
            [(i, f"k{i % 3}") for i in range(200)], ["doc_id", "lang"]
        )
        out1 = deterministic_reservoir(df, "lang", "doc_id", k=7).collect()
        assert len(out1) == 21
        per_key = {}
        for r in out1:
            per_key.setdefault(r["lang"], []).append((r["rn"], r["doc_id"]))
        assert all(sorted(v)[0][0] == 1 and len(v) == 7 for v in per_key.values())
        # repartitioning the input must not change the sample (the hash
        # permutation, not partition layout, decides membership)
        out2 = deterministic_reservoir(
            df.repartition(13), "lang", "doc_id", k=7
        ).collect()
        assert sorted((r["lang"], r["rn"], r["doc_id"]) for r in out1) == sorted(
            (r["lang"], r["rn"], r["doc_id"]) for r in out2
        )

    def test_adversarial_hash_distribution_still_exact(self, spark):
        # adversarial key: 120 ids chosen (by scanning the salted md5
        # fold) so every hash clusters in the TOP 38% of the hash space
        # — the distribution that clipped the round-5 uniform threshold
        # (T ≈ 0.62·2^60 → zero survivors, driver-probe fallback).  The
        # round-6 histogram cutoff must place its bucket boundary from
        # the key's own histogram and return exactly k, identical to
        # the plain-window answer, with no fallback machinery at all
        import hashlib

        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        def fold(s: str) -> int:
            return int(hashlib.md5(f"rsv:{s}".encode()).hexdigest()[:15], 16)

        k, n = 2, 120
        thresh = int((k + 6 * k**0.5 + 64) / n * (1 << 60)) + 1
        ids, i = [], 0
        while len(ids) < n:
            if fold(str(i)) >= thresh:
                ids.append(i)
            i += 1
        df = spark.createDataFrame([(v, "hot") for v in ids], ["doc_id", "lang"])
        out = deterministic_reservoir(df, "lang", "doc_id", k=k).collect()
        expect = sorted(ids, key=lambda x: (fold(str(x)), x))[:k]
        assert sorted((r["rn"], r["doc_id"]) for r in out) == [
            (j + 1, v) for j, v in enumerate(expect)
        ]

    def test_small_key_returns_all_rows(self, spark):
        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        df = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "lang"])
        assert deterministic_reservoir(df, "lang", "doc_id", k=10).count() == 2


    def test_builds_lazily_with_zero_driver_jobs(self, spark):
        # round-5's exactness probe ran `bad.limit(1).count()` inside the
        # operator — one Spark job on every invocation's critical path
        # before the caller even acted.  The histogram cutoff needs no
        # probe: BUILDING the DataFrame must launch zero jobs (the
        # verdict-#5 "loses one Spark job" assertion), and the single
        # consuming action computes everything.
        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        df = spark.createDataFrame(
            [(i, f"k{i % 5}") for i in range(300)], ["doc_id", "lang"]
        )
        tracker = spark.sparkContext.statusTracker()
        spark.sparkContext.setJobGroup("rsv-lazy", "reservoir build probe")
        try:
            out = deterministic_reservoir(df, "lang", "doc_id", k=3)
            assert tracker.getJobIdsForGroup("rsv-lazy") == []
        finally:
            spark.sparkContext.setJobGroup(None, None)
        assert out.count() == 15

    def test_boundary_bucket_ties_never_lose_topk(self, spark):
        # ids engineered so several hashes share the cutoff BUCKET (the
        # log-scale bucketizer maps them to one index): every same-bucket
        # row must survive the map-side filter together, and the ranking
        # window (hv, then id) must still return the exact global top-k
        import hashlib

        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        def fold(s: str) -> int:
            return int(hashlib.md5(f"rsv:{s}".encode()).hexdigest()[:15], 16)

        ids = list(range(400))
        df = spark.createDataFrame([(v, "one") for v in ids], ["doc_id", "lang"])
        for k in (1, 7, 50):
            out = deterministic_reservoir(df, "lang", "doc_id", k=k).collect()
            expect = sorted(ids, key=lambda x: (fold(str(x)), x))[:k]
            assert sorted((r["rn"], r["doc_id"]) for r in out) == [
                (j + 1, v) for j, v in enumerate(expect)
            ]


class TestWeightedSample:
    def test_bias_toward_heavy_rows_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, 10 if i % 2 else 1000) for i in range(2000)],
            ["doc_id", "w"],
        )
        kept = weighted_sample(df, 0.2, "w")
        rows = kept.collect()
        heavy = sum(1 for r in rows if r["w"] == 1000)
        light = len(rows) - heavy
        # heavy rows are 100x more likely per unit — with mean weight
        # 505, heavy keep-prob ≈ 0.2*1000/505 ≈ 0.4, light ≈ 0.004
        assert heavy > 300 and light < 30, (heavy, light)
        # deterministic: repartitioning must not change the kept set
        again = weighted_sample(df.repartition(7), 0.2, "w").collect()
        assert sorted(r["doc_id"] for r in rows) == sorted(
            r["doc_id"] for r in again
        )

    def test_empty_input(self, spark):
        from dystonse_gtfs_data_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([], "doc_id long, w long")
        assert weighted_sample(df, 0.5, "w").count() == 0


class TestCapPerKey:
    def test_keeps_first_n_best_ranked(self, spark):
        import pyspark.sql.functions as F

        from dystonse_gtfs_data_spark.operators.sampling import cap_per_key

        rows = [(k, i, (i * 7) % 10) for k in ("a", "b") for i in range(8)]
        df = spark.createDataFrame(rows, "k string, id long, q long")
        out = cap_per_key(
            df, ["k"], 3, [F.col("q").desc(), F.col("id")]
        ).toPandas()
        assert sorted(out.groupby("k").size()) == [3, 3]
        for k in ("a", "b"):
            grp = out[out.k == k].sort_values("key_rank")
            best = sorted(
                [r for r in rows if r[0] == k],
                key=lambda r: (-r[2], r[1]),
            )[:3]
            assert list(zip(grp.id, grp.q)) == [(i, q) for _k, i, q in best]
            assert list(grp.key_rank) == [1, 2, 3]

    def test_cap_above_group_size_keeps_all(self, spark):
        import pyspark.sql.functions as F

        from dystonse_gtfs_data_spark.operators.sampling import cap_per_key

        df = spark.createDataFrame([("a", 1), ("a", 2)], "k string, id long")
        assert cap_per_key(df, ["k"], 10, [F.col("id")]).count() == 2
