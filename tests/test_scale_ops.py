"""Scale-path operators: salted skew joins and bucketed co-located joins
— correctness vs the plain equivalents, and the plan property that
justifies them (no Exchange on the bucketed join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.skew import salted_count, salted_join
from dystonse_gtfs_data_spark.plans import formatted_plan, shuffle_count
from dystonse_gtfs_data_spark.sources.bucketed import read_table, write_bucketed
from dystonse_gtfs_data_spark.sources.tables import load_table


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        plain = (
            li.join(orders, "l_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        )
        salted = (
            salted_join(li, orders, "l_orderkey", num_salts=8)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        )
        a = {r["o_orderpriority"]: (r["n"], r["q"]) for r in plain.collect()}
        b = {r["o_orderpriority"]: (r["n"], r["q"]) for r in salted.collect()}
        assert set(a) == set(b)
        for k in a:
            assert a[k][0] == b[k][0]
            assert a[k][1] == pytest.approx(b[k][1])

    def test_identical_duplicate_rows_still_spread(self, spark):
        # adversarial shape from the round-4 verdict: a hot key whose
        # volume is BYTE-IDENTICAL rows.  A columns-only salt hash sends
        # them all to one bucket; the per-row discriminator must spread
        # them near-uniformly across the salts.
        from dystonse_gtfs_data_spark.operators.skew import _row_salt

        dup = (
            spark.range(4000)
            .select(F.lit("hot").alias("k"), F.lit("same payload").alias("v"))
            .repartition(8)
        )
        spread = (
            dup.withColumn("__salt", _row_salt(dup, 16))
            .groupBy("__salt")
            .count()
            .collect()
        )
        sizes = {r["__salt"]: r["count"] for r in spread}
        assert len(sizes) == 16  # every salt bucket used
        assert max(sizes.values()) < 2 * (4000 / 16)  # no funneling
        # and the partial counts still sum exactly
        out = salted_count(dup, "k", num_salts=16).collect()
        assert [(r["k"], r["count"]) for r in out] == [("hot", 4000)]

    def test_salted_count_matches_group_count(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        plain = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").agg(F.count("*").alias("count")).collect()}
        salted = {r["event_type"]: r["count"] for r in salted_count(ev, "event_type", num_salts=8).collect()}
        assert plain == salted


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir, tmp_path_factory):
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity"
        )
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "b_orders",
            ["l_orderkey"],
            num_buckets=8,
        )
        a = read_table(spark, "b_lineitem")
        b = read_table(spark, "b_orders")
        # disable broadcast so the co-location is what's being tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            plan = formatted_plan(joined)
            assert shuffle_count(joined) == 0, plan
            # and it actually answers correctly
            assert joined.count() == li.join(
                orders, li.l_orderkey == orders.o_orderkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.sql("DROP TABLE IF EXISTS b_orders")


class TestBucketedDomainPipeline:
    """VERDICT follow-up: the records⋈stop_times and record-pair joins of
    the DOMAIN pipeline actually running on bucketed tables, shuffle-free."""

    def test_records_stop_join_has_no_exchange(self, spark):
        from dystonse_gtfs_data_spark.operators.monitor import pair_counts
        from dystonse_gtfs_data_spark.sources.bucketed import (
            bucketed_pair_counts,
            bucketed_stop_join,
            write_domain_tables_bucketed,
        )
        from dystonse_gtfs_data_spark.sources.demo import (
            build_records,
            build_schedule,
        )

        records = build_records(spark)
        stop_times = build_schedule(spark)["stop_times"]
        rec_t, st_t = write_domain_tables_bucketed(
            records, stop_times, num_buckets=8, prefix="t_dom"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_stop_join(spark, rec_t, st_t)
            plan = formatted_plan(joined)
            assert shuffle_count(joined) == 0, plan
            assert joined.count() == records.count()  # every record matches J2

            pairs = bucketed_pair_counts(spark, rec_t)
            pplan = formatted_plan(pairs)
            # co-located self-join: the ONLY Exchange is the final rollup
            assert shuffle_count(pairs) == 1, pplan
            # value parity vs the unbucketed operator
            got = {(r["start_seq"], r["end_seq"]): r["n_pairs"] for r in pairs.collect()}
            want = {
                (r["start_seq"], r["end_seq"]): r["n_pairs"]
                for r in pair_counts(records).collect()
            }
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS t_dom_records_b")
            spark.sql("DROP TABLE IF EXISTS t_dom_stop_times_b")


class TestPartitionCountInvariance:
    """The 100 TB claim in miniature: results must be IDENTICAL whether a
    table arrives as one parquet file or as many splits across many
    partitions.  Catches accidental order dependence, per-partition
    state, or explode/window logic that only works on a single split."""

    @pytest.fixture(scope="class")
    def many_split_docs_dir(self, spark, sf_dir, tmp_path_factory):
        base = tmp_path_factory.mktemp("docs16")
        load_table(spark, sf_dir, "documents").repartition(16).write.parquet(
            str(base / "documents.parquet")
        )
        return str(base)

    def _rows(self, df, key_cols):
        return sorted(
            (tuple(r[c] for c in key_cols) for r in df.collect()),
        )

    @pytest.mark.parametrize(
        ("name", "keys"),
        [
            ("ngram_jaccard_dedup", ["id_a", "id_b", "jaccard"]),
            ("minhash_near_dups", ["id_a", "id_b", "jaccard"]),
            ("winnow_passage_overlap", ["id_a", "id_b", "shared_fps"]),
            ("repetition_signals", ["doc_id", "n_bigrams", "top_bigram_frac"]),
            ("clean_corpus", ["doc_id", "quality", "n_tokens"]),
            ("tfidf_terms", ["doc_id", "term", "rank"]),
        ],
    )
    def test_docs_queries_invariant_to_split_count(
        self, spark, sf_dir, many_split_docs_dir, name, keys
    ):
        from dystonse_gtfs_data_spark import queries as Q

        single = self._rows(Q.REGISTRY[name].fn(spark, sf_dir), keys)
        multi = self._rows(Q.REGISTRY[name].fn(spark, many_split_docs_dir), keys)
        assert single == multi, name


class TestSkewStress:
    """Adversarial skew: hot keys / giant groups that would OOM or
    quadratically blow up a naive plan must complete with sane output."""

    def test_ngram_jaccard_hot_shingle_valve(self, spark):
        # 400 docs all sharing one stop-phrase shingle: without the df
        # valve the inverted index joins 400² pairs on that shingle;
        # with it, the hot shingle drops and only real dups surface
        from dystonse_gtfs_data_spark.operators.dedup import (
            ngram_jaccard_near_duplicates,
        )

        docs = [(i, f"common stop phrase unique{i} filler{i} tail{i}") for i in range(398)]
        docs += [(998, "real duplicate pair body text"), (999, "real duplicate pair body text")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = ngram_jaccard_near_duplicates(
            df, threshold=0.5, max_shingle_df=50
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(998, 999)}

    def test_semantic_dedup_one_giant_cluster(self, spark):
        # every vector in ONE k-means cluster (identical directions):
        # the intra-cluster join is the full pair space — must still
        # finish and keep exactly the min id
        from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

        rows = [(i, [1.0 + (i % 7) * 1e-4] * 8) for i in range(300)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semantic_dedup(df, k=4, rounds=1, threshold=0.99).toPandas()
        assert len(out) == 300
        assert sorted(out[out.keep].vec_id)[:1] == [0]

    def test_reservoir_single_hot_key(self, spark):
        # one key holds every row: the threshold prefilter must keep the
        # exchange at ~k rows, and the result is exactly k
        from dystonse_gtfs_data_spark.operators.sampling import (
            deterministic_reservoir,
        )

        df = spark.createDataFrame(
            [(i, "hot") for i in range(20000)], ["doc_id", "lang"]
        )
        out = deterministic_reservoir(df, "lang", "doc_id", k=10).collect()
        assert len(out) == 10
        assert sorted(r["rn"] for r in out) == list(range(1, 11))

    def test_boilerplate_every_line_everywhere(self, spark):
        # pathological corpus: every line is boilerplate → empty output,
        # no crash, no divide-by-zero
        from dystonse_gtfs_data_spark.operators.dedup import (
            boilerplate_line_removal,
        )

        df = spark.createDataFrame(
            [(i, "same\nlines\neverywhere") for i in range(50)],
            ["doc_id", "text"],
        )
        assert boilerplate_line_removal(df, max_df=2).count() == 0

    def test_paragraph_dedup_hot_segment_is_agg_join_not_window(self, spark):
        # a segment present in EVERY document (the case the operator
        # exists for) must flow through a map-side-combined agg + a
        # skew-splittable join — never one giant window partition
        from dystonse_gtfs_data_spark.operators.dedup import paragraph_dedup
        from dystonse_gtfs_data_spark.plans import formatted_plan

        df = spark.createDataFrame(
            [(i, "BANNER#unique%d" % i) for i in range(2000)],
            ["doc_id", "text"],
        )
        out = paragraph_dedup(df, sep="#")
        plan = formatted_plan(out)
        assert "Window" not in plan, "first-occurrence must not be a window"
        assert "partial_min" in plan.lower() or "partial" in plan.lower()
        rows = {r["doc_id"]: r for r in out.collect()}
        assert len(rows) == 2000
        kept_banner = [d for d, r in rows.items() if "BANNER" in r["clean_text"]]
        assert kept_banner == [0]  # exactly the corpus-first survives

    def test_exact_substring_hot_gram_every_doc(self, spark):
        # one sentence repeated across the whole corpus: doc 0 keeps it,
        # every other document has it cut; the frequency tables are
        # aggregated (splittable), not windowed
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_dedup,
        )
        from dystonse_gtfs_data_spark.plans import formatted_plan

        df = spark.createDataFrame(
            [(i, "common phrase repeated verbatim everywhere u%d v%d" % (i, i))
             for i in range(2000)],
            ["doc_id", "text"],
        )
        out = exact_substring_dedup(df, min_len=5)
        plan = formatted_plan(out)
        # the only windows left are the per-document interval merge —
        # bounded by document length; the corpus-frequency decisions
        # (by gram hash / gram text) must be aggregations
        import re

        for w in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "gtext" not in w and "gh" not in w, w
        assert "partial_min" in plan.lower() or "partial" in plan.lower()
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[0]["removed_tokens"] == 0
        assert all(r["removed_tokens"] == 5 for d, r in rows.items() if d > 0)
