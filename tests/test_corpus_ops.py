"""Operator-level tests for the round-3 corpus-analysis additions:
PII redaction, passage-level winnowing overlap, and plan-shape guards
for the new catalog queries (oracle parity itself is covered by
test_queries_oracle.py, which auto-picks up every registered entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.functions import text as Ft
from dystonse_gtfs_data_spark.operators.dedup import winnow_passage_overlap


def test_pii_redaction_crafted(spark):
    rows = [
        (0, "mail Alice.Smith+dev@sub.example.co.uk now"),
        (1, "call 12-345-678-9012 or visit 192.168.1.17 today"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io c.d@e.org one quad 8.8.8.8"),
        # phone-like but wrong grammar (3-3-3-4) must NOT match
        (4, "not a phone 123-456-789-0123x"),
    ]
    df = spark.createDataFrame(rows, "id long, raw string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            Ft.pii_counts(F.col("raw"))["email_count"].alias("e"),
            Ft.pii_counts(F.col("raw"))["phone_count"].alias("p"),
            Ft.pii_counts(F.col("raw"))["ipv4_count"].alias("i"),
            Ft.redact_pii(F.col("raw")).alias("red"),
        ).collect()
    }
    assert (out[0]["e"], out[0]["p"], out[0]["i"]) == (1, 0, 0)
    assert out[0]["red"] == "mail <EMAIL> now"
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (0, 1, 1)
    assert out[1]["red"] == "call <PHONE> or visit <IP> today"
    assert (out[2]["e"], out[2]["p"], out[2]["i"]) == (0, 0, 0)
    assert out[2]["red"] == "no pii here at all"
    assert (out[3]["e"], out[3]["i"]) == (2, 1)
    assert out[3]["red"] == "two mails <EMAIL> <EMAIL> one quad <IP>"
    assert out[4]["p"] == 0


def test_winnow_passage_overlap_detects_shared_passage(spark):
    """Docs sharing a substring of length >= kgram + window - 1 form a
    pair (the winnowing guarantee lifted to pair level); an unrelated doc
    pairs with nobody."""
    shared = "a verbatim boilerplate passage reused across both documents"
    docs = spark.createDataFrame(
        [
            (0, "first opens one way " + shared + " then diverges entirely"),
            (1, "second begins differently " + shared + " and wraps up"),
            (2, "completely unrelated content with zero textual overlap xyz"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in winnow_passage_overlap(
            docs, kgram=8, window=4, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in k for k in pairs)
    r = pairs[(0, 1)]
    assert r["shared_fps"] >= 1
    assert 0.0 < r["resemblance"] <= 1.0


def test_winnow_passage_overlap_df_cap_drops_boilerplate(spark):
    """A fingerprint present in ALL docs (boilerplate) is the only link
    between docs 0..3; capping df below the corpus size removes those
    pairs while a genuinely shared private passage survives."""
    boiler = "standard footer text appended to every single document here"
    private = "secret shared paragraph that only these two docs contain"
    docs = spark.createDataFrame(
        [
            (0, "alpha body " + boiler + " " + private),
            (1, "beta content " + boiler + " " + private),
            (2, "gamma words " + boiler + " unrelated tail section"),
            (3, "delta prose " + boiler + " another different ending"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in winnow_passage_overlap(
            docs, kgram=8, window=4, min_shared=1
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in winnow_passage_overlap(
            docs, kgram=8, window=4, min_shared=1, max_fp_df=3
        ).collect()
    }
    # boilerplate links every pair uncapped
    assert uncapped == {(i, j) for i in range(4) for j in range(i + 1, 4)}
    # df cap at 3 kills the 4-doc boilerplate fingerprints; the private
    # passage (df=2) still pairs docs 0 and 1
    assert (0, 1) in capped
    assert (2, 3) not in capped


def test_new_catalog_queries_stay_jvm_side(spark, sf_dir):
    """None of the round-3 corpus queries may fall back to row-at-a-time
    Python evaluation — they are all built-in-expression pipelines."""
    from dystonse_gtfs_data_spark import queries as Q

    for name in (
        "pii_redaction",
        "repetition_signals",
        "url_domains",
        "tfidf_terms",
        "winnow_passage_overlap",
    ):
        plan = Q.REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_tfidf_vocab_join_is_broadcast(spark, sf_dir):
    """The df-per-term vocabulary must reach the tf table as a broadcast
    (vocab ≪ corpus at any scale); the only shuffles are the two
    aggregations and the per-doc ranking window."""
    from dystonse_gtfs_data_spark import queries as Q

    plan = Q.REGISTRY["tfidf_terms"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastHashJoin" in plan


def test_redact_pii_matches_python_re_reference(spark):
    """Property: the JVM regexp_replace chain equals Python re.sub with
    the same patterns on random corpora salted with PII-shaped tokens
    (one Spark round-trip over the whole hypothesis batch)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pii_bits = st.sampled_from(
        [
            "a.b+c@ex-1.example.com",
            "john@x.io",
            "55-123-456-7890",
            "10.0.255.3",
            "1.2.3.4.5",        # 5 quads: first four match
            "12-34-56-78",      # wrong phone grammar
            "not@tld",          # no dot-tld: no match
            "plain words",
        ]
    )
    corpus = st.lists(
        st.one_of(pii_bits, st.text(alphabet=st.characters(codec="ascii"), max_size=12)),
        min_size=0,
        max_size=8,
    ).map(lambda parts: " ".join(parts))

    batches: list[str] = []

    @given(corpus)
    @settings(max_examples=120, deadline=None)
    def collect(s):
        batches.append(s)

    collect()

    def py_redact(s: str) -> str:
        for pat, repl in (
            (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
            (r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
            (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
        ):
            s = re.sub(pat, repl, s)
        return s

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(batches)], "id long, raw string"
    )
    got = {
        r["id"]: r["red"]
        for r in df.select(
            "id", Ft.redact_pii(F.col("raw")).alias("red")
        ).collect()
    }
    for i, s in enumerate(batches):
        assert got[i] == py_redact(s), repr(s)


class TestBpeTrain:
    def test_merge_fold_is_left_to_right_non_overlapping(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.operators.bpe import merge_pair_expr

        df = spark.createDataFrame(
            [(["a", "a", "a"],), (["x", "a", "a", "y"],), (["a"],), ([],)],
            "sym array<string>",
        )
        out = [r.m for r in df.select(merge_pair_expr(F.col("sym"), "a", "a").alias("m")).collect()]
        assert out == [["aa", "a"], ["x", "aa", "y"], ["a"], []]

    def test_rules_match_hand_computed(self, spark):
        from dystonse_gtfs_data_spark.operators.bpe import bpe_train, word_counts

        # corpus: "low low lower" → e,r then l,o then lo,w …
        docs = spark.createDataFrame(
            [(1, "low low lower"), (2, "low lowest")], ["doc_id", "text"]
        )
        rules = bpe_train(spark, word_counts(docs), rounds=3).collect()
        got = [(r["round"], r["lhs"], r["rhs"], r["freq"]) for r in rules]
        # 5 word instances (low×3, lower, lowest) all contain l-o and
        # o-w → tie at 5, lexicographic (l,o) wins; round 2 merges
        # (lo,w)=5; round 3: lower/lowest both start low-e → (low,e)=2
        assert got[0] == (1, "l", "o", 5)
        assert got[1] == (2, "lo", "w", 5)
        assert got[2] == (3, "low", "e", 2)

    def test_empty_corpus_yields_no_rules(self, spark):
        from dystonse_gtfs_data_spark.operators.bpe import bpe_train, word_counts

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert bpe_train(spark, word_counts(docs), rounds=3).count() == 0


class TestBpeFoldProperty:
    def test_merge_fold_matches_python_twin_on_random_arrays(self, spark):
        """Engine fold vs oracle fold, property-tested: for random symbol
        arrays and a random target pair, merge_pair_expr must equal
        merge_word_py exactly (the BPE oracles rest on this equivalence)."""
        import random

        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.operators.bpe import merge_pair_expr
        from dystonse_gtfs_data_spark.sources.demo_oracle_pipeline import (
            merge_word_py,
        )

        rng = random.Random(42)
        alphabet = ["a", "b", "c", "ab", "bc"]
        cases = [
            [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
            for _ in range(120)
        ]
        for a, b in (("a", "b"), ("a", "a"), ("ab", "c"), ("b", "ab")):
            df = spark.createDataFrame(
                [(i, syms) for i, syms in enumerate(cases)],
                "i int, sym array<string>",
            )
            got = {
                r["i"]: r["m"]
                for r in df.select(
                    "i", merge_pair_expr(F.col("sym"), a, b).alias("m")
                ).collect()
            }
            for i, syms in enumerate(cases):
                assert got[i] == merge_word_py(syms, a, b), (syms, a, b)


class TestChunking:
    def test_chunks_reconstruct_the_document(self, spark, sf_dir):
        """Dropping each chunk's overlap prefix (after the first) and
        concatenating must reproduce the original text exactly — no
        gaps, no double-counted seams."""
        from dystonse_gtfs_data_spark import queries as Q
        from dystonse_gtfs_data_spark.queries import _CHUNK_OVERLAP
        from dystonse_gtfs_data_spark.sources.tables import load_table

        chunks = Q.REGISTRY["chunk_documents"].fn(spark, sf_dir).collect()
        texts = {
            r["doc_id"]: r["text"]
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
        }
        by_doc: dict = {}
        for r in chunks:
            by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
        assert set(by_doc) == set(texts)
        for doc_id, parts in by_doc.items():
            parts.sort()
            rebuilt = parts[0][1] + "".join(
                c[_CHUNK_OVERLAP:] for _i, c in parts[1:]
            )
            assert rebuilt == texts[doc_id], doc_id
