"""Tests for the data-selection operators (operators/selection.py):
Gopher quality rules, DSIR importance resampling, perplexity buckets."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.selection import (
    dsir_logweights,
    gopher_quality_rules,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


GOOD = (
    "the quick brown fox jumps over that lazy dog and runs off with "
    "a bone to have some fun in the long green field of grass " * 3
)


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        out = gopher_quality_rules(_docs(spark, [(1, GOOD)])).first()
        assert out.passes_gopher
        assert out.n_words >= 50
        assert 3.0 <= out.mean_word_len <= 10.0

    def test_short_doc_fails_word_count(self, spark):
        out = gopher_quality_rules(_docs(spark, [(1, "too short")])).first()
        assert not out.r_word_count
        assert not out.passes_gopher

    def test_symbol_heavy_fails(self, spark):
        text = " ".join(["the of and that with have be to"] * 8) + " " + "#" * 40
        out = gopher_quality_rules(_docs(spark, [(1, text)])).first()
        assert out.symbol_ratio > 0.1
        assert not out.r_symbol

    def test_bullet_lines_fail(self, spark):
        lines = ["- item %d here" % i for i in range(10)]
        out = gopher_quality_rules(_docs(spark, [(1, "\n".join(lines))])).first()
        assert out.bullet_ratio == 1.0
        assert not out.r_bullet

    def test_ellipsis_lines_counted(self, spark):
        text = "the start of it...\nthe rest is fine\nanother trailer..."
        out = gopher_quality_rules(_docs(spark, [(1, text)])).first()
        assert abs(out.ellipsis_ratio - 2 / 3) < 1e-6
        assert not out.r_ellipsis

    def test_numeric_doc_fails_alpha(self, spark):
        text = " ".join(str(i) for i in range(100))
        out = gopher_quality_rules(_docs(spark, [(1, text)])).first()
        assert out.alpha_ratio == 0.0
        assert not out.r_alpha

    def test_stopword_floor(self, spark):
        text = " ".join(["lorem ipsum dolor sit amet"] * 20)
        out = gopher_quality_rules(_docs(spark, [(1, text)])).first()
        assert out.n_stopwords == 0
        assert not out.r_stopwords

    def test_rule_conjunction_matches_columns(self, spark):
        df = gopher_quality_rules(
            _docs(spark, [(1, GOOD), (2, "tiny"), (3, "#" * 100)])
        )
        rules = [c for c in df.columns if c.startswith("r_")]
        bad = df.filter(
            F.col("passes_gopher")
            != F.expr(" AND ".join(rules))
        )
        assert bad.count() == 0


def _corpus(spark):
    """Target docs talk about wiki-ish things; raw split between
    target-like and junk-like vocabularies."""
    target = [(i, "science history atlas theory physics notes", True) for i in range(20)]
    rawlike = [(100 + i, "science history theory archive", False) for i in range(10)]
    junk = [(200 + i, "buy cheap pills now click here", False) for i in range(10)]
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, is_t=b) for i, t, b in target + rawlike + junk]
    )


class TestDsir:
    def test_target_like_docs_score_higher(self, spark):
        df = _corpus(spark)
        out = dsir_logweights(df, F.col("is_t")).collect()
        scores = {r.doc_id: r.log_weight for r in out}
        # only raw docs are scored
        assert set(scores) == set(range(100, 110)) | set(range(200, 210))
        assert min(scores[i] for i in range(100, 110)) > max(
            scores[i] for i in range(200, 210)
        )

    def test_topk_selection_is_exact_and_deterministic(self, spark):
        df = _corpus(spark)
        a = dsir_logweights(df, F.col("is_t"), top_k=5)
        assert a.filter("selected").count() == 5
        sel_a = {r.doc_id for r in a.filter("selected").collect()}
        sel_b = {
            r.doc_id
            for r in dsir_logweights(df, F.col("is_t"), top_k=5)
            .filter("selected")
            .collect()
        }
        assert sel_a == sel_b

    def test_no_single_partition_window_in_plan(self, spark):
        df = _corpus(spark)
        plan = (
            dsir_logweights(df, F.col("is_t"), top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan  # top-k rides TakeOrderedAndProject
        assert "TakeOrderedAndProject" in plan

    def test_n_features_counts_instances(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b c", is_t=False),
             Row(doc_id=2, text="a", is_t=True)]
        )
        out = {r.doc_id: r.n_features for r in dsir_logweights(df, F.col("is_t")).collect()}
        # 3 unigrams + 2 bigrams
        assert out == {1: 5}


class TestPerplexityBuckets:
    def test_terciles_balanced_and_ordered(self, spark, sf_dir):
        from dystonse_gtfs_data_spark.queries import q_perplexity_buckets

        out = q_perplexity_buckets(spark, sf_dir).collect()
        by_lang: dict[str, list] = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rows in by_lang.items():
            sizes = [
                sum(1 for r in rows if r.tercile == t) for t in (1, 2, 3)
            ]
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)
            heads = [r.avg_logprob for r in rows if r.ppl_bucket == "head"]
            tails = [r.avg_logprob for r in rows if r.ppl_bucket == "tail"]
            assert min(heads) >= max(tails), lang


class TestTwinParity:
    """Randomized cross-engine parity: the DuckDB twins must reproduce
    the Spark outputs on adversarial ASCII corpora (regex-dialect and
    list-function edge cases the fixed testdata can't reach)."""

    ALPHABET = (
        "abcdefghij THE the of and that with have be to #.*-\n0123456789"
    )

    def _random_corpus(self) -> list[str]:
        from hypothesis import given, settings
        from hypothesis import strategies as st

        texts: list[str] = []

        @given(st.text(alphabet=self.ALPHABET, min_size=0, max_size=120))
        @settings(max_examples=80, deadline=None)
        def collect(s):
            texts.append(s)

        collect()
        return texts

    def test_gopher_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.selection import (
            gopher_quality_rules_sql,
        )

        texts = self._random_corpus()
        pdf = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = con.execute(
            gopher_quality_rules_sql() + " ORDER BY doc_id"
        ).df()
        got = (
            gopher_quality_rules(
                spark.createDataFrame(pdf)
            )
            .drop("text")
            .orderBy("doc_id")
            .toPandas()
        )
        got = got[list(want.columns)]
        for c in want.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                assert ((a - b).abs() < 1e-9).all(), c
            else:
                assert (a.astype(object) == b.astype(object)).all(), c

    def test_dsir_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.selection import (
            dsir_logweights,
            dsir_logweights_sql,
        )

        texts = self._random_corpus()
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "src": ["t" if i % 3 == 0 else "r" for i in range(len(texts))],
            }
        )
        con = duckdb.connect()
        con.register("docs", pdf)
        want = con.execute(
            dsir_logweights_sql(
                table="docs", target_pred="src = 't'", top_k=10
            )
            + " ORDER BY doc_id"
        ).df()
        got = (
            dsir_logweights(
                spark.createDataFrame(pdf), F.col("src") == "t", top_k=10
            )
            .orderBy("doc_id")
            .toPandas()
        )
        got = got[list(want.columns)]
        assert len(got) == len(want)
        for c in want.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                assert ((a.astype(float) - b.astype(float)).abs() < 1e-9).all(), c
            else:
                assert (a.astype(object) == b.astype(object)).all(), c
