"""Segment-level exact dedup + UniMax allocation: hand-verifiable
semantics for paragraph keep-first dedup (MassiveText §A1.2),
ExactSubstr span removal (Lee et al. 2022 §4.1), and water-filling
language budgets (UniMax), plus a seeded Spark↔DuckDB differential
sweep so the SQL twins can't drift from the operators."""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.dedup import (
    exact_substring_dedup,
    exact_substring_dedup_sql,
    paragraph_dedup,
    paragraph_dedup_sql,
)
from dystonse_gtfs_data_spark.operators.sampling import (
    unimax_allocation,
    unimax_oracle_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestParagraphDedup:
    def test_keep_first_semantics(self, spark):
        out = {
            r["doc_id"]: r
            for r in paragraph_dedup(
                _docs(
                    spark,
                    [
                        (1, "A#B#C"),
                        (2, "B#D"),  # B first seen in doc 1 → removed
                        (3, "A#B"),  # everything seen earlier → doc drops
                        (4, "E#E"),  # within-doc dup → second E removed
                    ],
                ),
                sep="#",
            ).collect()
        }
        assert out[1]["clean_text"] == "A#B#C" and out[1]["n_removed"] == 0
        assert out[2]["clean_text"] == "D" and out[2]["n_removed"] == 1
        assert 3 not in out  # fully-duplicated document disappears
        assert out[4]["clean_text"] == "E" and out[4]["n_kept"] == 1

    def test_contrast_with_boilerplate_rule(self, spark):
        # the SAME corpus under C4 boilerplate (df > 2 → drop everywhere)
        # vs keep-first: keep-first always retains one copy
        from dystonse_gtfs_data_spark.operators.dedup import (
            boilerplate_line_removal,
        )

        docs = _docs(spark, [(i, "X#uniq%d" % i) for i in range(5)])
        bp = boilerplate_line_removal(docs, sep="#", max_df=2).collect()
        pd_ = paragraph_dedup(docs, sep="#").collect()
        assert all("X" not in r["clean_text"].split("#") for r in bp)
        assert sum("X" in r["clean_text"].split("#") for r in pd_) == 1


class TestExactSubstringDedup:
    CORPUS = [
        (1, "a b c d e f"),  # source of the repeated windows → untouched
        (2, "x a b c y z"),  # one repeated window mid-document
        (3, "a b c d q r s"),  # two overlapping windows merge to one span
        (4, "u v w"),  # unique → untouched
        (5, "a b c p p b c d"),  # two disjoint spans
        (6, "k l m k l m k l m"),  # self-repetition: period-3 tail cut
    ]

    @pytest.fixture(scope="class")
    def result(self, spark):
        return {
            r["doc_id"]: r
            for r in exact_substring_dedup(
                _docs(spark, self.CORPUS), min_len=3
            ).collect()
        }

    def test_first_occurrence_exempt(self, result):
        assert result[1]["clean_text"] == "a b c d e f"
        assert result[1]["n_spans"] == 0 and result[1]["removed_tokens"] == 0

    def test_single_span_cut(self, result):
        assert result[2]["clean_text"] == "x y z"
        assert result[2]["removed_tokens"] == 3 and result[2]["n_spans"] == 1

    def test_overlapping_windows_merge(self, result):
        # "a b c" and "b c d" both repeat → one maximal span [0, 4)
        assert result[3]["clean_text"] == "q r s"
        assert result[3]["removed_tokens"] == 4 and result[3]["n_spans"] == 1

    def test_untouched_doc_passes_through(self, result):
        assert result[4]["clean_text"] == "u v w"
        assert result[4]["n_tokens"] == 3 and result[4]["n_spans"] == 0

    def test_disjoint_spans(self, result):
        assert result[5]["clean_text"] == "p p"
        assert result[5]["n_spans"] == 2 and result[5]["removed_tokens"] == 6

    def test_self_repetition_removed(self, result):
        # per-gram first occurrences (pos 0..2) survive; the periodic
        # tail [3, 9) is one merged span
        assert result[6]["clean_text"] == "k l m"
        assert result[6]["removed_tokens"] == 6 and result[6]["n_spans"] == 1

    def test_short_docs_skip_gram_stage(self, spark):
        out = exact_substring_dedup(
            _docs(spark, [(1, "a b"), (2, "a b")]), min_len=3
        ).collect()
        assert all(r["removed_tokens"] == 0 for r in out)


class TestUniMax:
    ROWS = [
        # lang A: 10 tokens, B: 100, C: 40  (token = word here)
        ("A", 1, "t " * 5),
        ("A", 2, "t " * 5),
        ("B", 3, "t " * 100),
        ("C", 4, "t " * 40),
    ]

    def _frame(self, spark):
        return spark.createDataFrame(
            [(l, i, t.strip()) for l, i, t in self.ROWS],
            "lang string, doc_id long, text string",
        )

    def test_water_filling_mixed_caps(self, spark):
        # caps at 2 epochs: A=20, C=80, B=200; budget 120 → A capped at
        # 20, the remaining level is (120-20)/2 = 50 for B and C
        out = {
            r["lang"]: r
            for r in unimax_allocation(
                self._frame(spark), budget_tokens=120, max_epochs=2
            ).collect()
        }
        assert out["A"]["alloc_tokens"] == 20 and out["A"]["full_epochs"] == 2
        assert out["B"]["alloc_tokens"] == 50 and out["B"]["full_epochs"] == 0
        assert out["C"]["alloc_tokens"] == 50 and out["C"]["full_epochs"] == 1
        assert sum(r["alloc_tokens"] for r in out.values()) == 120

    def test_budget_exceeding_caps_caps_everyone(self, spark):
        out = unimax_allocation(
            self._frame(spark), budget_tokens=10_000, max_epochs=2
        ).collect()
        assert all(r["alloc_tokens"] == r["cap_tokens"] for r in out)
        assert all(r["full_epochs"] == 2 and r["partial_docs"] == 0 for r in out)

    def test_partial_epoch_is_deterministic(self, spark):
        a = unimax_allocation(self._frame(spark), 120, max_epochs=2).collect()
        b = unimax_allocation(self._frame(spark), 120, max_epochs=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _random_corpus(seed: int, n_docs: int, vocab: int, max_len: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(1, max_len)
        rows.append(
            (i, " ".join("w%d" % rng.randrange(vocab) for _ in range(n)))
        )
    return rows


@pytest.mark.parametrize("seed", [7, 11])
def test_differential_vs_duckdb_twins(spark, seed, tmp_path):
    """Seeded random corpus: tiny vocab forces heavy window collisions,
    exercising merge/exemption paths far beyond the handcrafted cases."""
    import pandas as pd

    rows = _random_corpus(seed, n_docs=60, vocab=6, max_len=25)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)

    s = (
        exact_substring_dedup(docs, min_len=4)
        .orderBy("doc_id")
        .toPandas()
    )
    o = con.execute(
        exact_substring_dedup_sql("documents", min_len=4) + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(s, o, check_dtype=False)

    s2 = paragraph_dedup(docs, sep=" w1 ").orderBy("doc_id").toPandas()
    o2 = con.execute(
        paragraph_dedup_sql("documents", sep=" w1 ") + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(s2, o2, check_dtype=False)


def test_unimax_differential_vs_duckdb(spark):
    import pandas as pd

    rows = _random_corpus(3, n_docs=80, vocab=50, max_len=30)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = ["L%d" % (i % 7) for i in pdf.doc_id]
    docs = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    for budget in (50, 400, 1_000_000):
        s = (
            unimax_allocation(docs, budget, max_epochs=3)
            .orderBy("lang")
            .toPandas()
        )
        o = con.execute(
            unimax_oracle_sql(budget, max_epochs=3) + " ORDER BY lang"
        ).df()
        pd.testing.assert_frame_equal(s, o, check_dtype=False)


def _brute_maximal(rows, k):
    """Reference enumerator of maximal corpus repeats ≥ k tokens: EXT(s)
    by direct occurrence counting, domination filter per doc — the
    O(n²·len) third opinion the Spark and DuckDB paths must both match."""
    from collections import defaultdict

    toks = {d: t.split(" ") for d, t in rows}
    occ = defaultdict(int)
    for d, tt in toks.items():
        for s in range(len(tt)):
            for ln in range(1, len(tt) - s + 1):
                occ[tuple(tt[s : s + ln])] += 1

    def ext(d, s):
        tt, best = toks[d], 0
        for ln in range(1, len(tt) - s + 1):
            if occ[tuple(tt[s : s + ln])] >= 2:
                best = ln
            else:
                break
        return best

    out = []
    for d, tt in toks.items():
        pm = None
        for s in range(len(tt)):
            e = s + ext(d, s)
            if e - s >= k and (pm is None or e > pm):
                out.append((d, s, e, e - s, " ".join(tt[s:e])))
                pm = e if pm is None else max(pm, e)
    return sorted(out)


class TestExactSubstringMaximal:
    CORPUS = [
        (0, "a b c d e f g h i j"),
        (1, "x x a b c d e q r s"),  # shares "a b c d e" with doc0
        (2, "m n c d e f g t u v"),  # shares "c d e f g" with doc0
        (3, "p q r s t u v w a b"),
        (4, "a b c d e f g h i j"),  # full duplicate of doc0
        (5, "z z z a b c z z z a b c"),  # overlapping WITHIN-doc repeat
    ]

    def _spark_rows(self, spark, rows, k):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal,
        )

        out = exact_substring_maximal(_docs(spark, rows), min_len=k).collect()
        return sorted(
            (r["doc_id"], r["s"], r["e"], r["rep_len"], r["rep_text"])
            for r in out
        )

    def test_matches_brute_force_and_duckdb(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal_sql,
        )

        expect = _brute_maximal(self.CORPUS, 3)
        assert self._spark_rows(spark, self.CORPUS, 3) == expect
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({d}, '{t}')" for d, t in self.CORPUS)
            + ") t(doc_id, text)"
        )
        got = sorted(
            tuple(r)
            for r in con.execute(
                exact_substring_maximal_sql("documents", min_len=3)
            ).fetchall()
        )
        assert got == expect
        # the semantics gap the window-union approximation leaves: doc1's
        # "a b c d e" and doc2's "c d e f g" are DISTINCT maximal repeats
        # (each occurs elsewhere); a merged-coverage view of doc0 cannot
        # tell them apart
        assert (1, 2, 7, 5, "a b c d e") in expect
        assert (2, 2, 7, 5, "c d e f g") in expect

    @pytest.mark.parametrize("seed", [5, 19])
    def test_random_corpus_three_way(self, spark, seed):
        # tiny vocab → dense repeat structure: overlapping repeats,
        # within-doc periodicity, staircases — brute force is the law
        rows = _random_corpus(seed, n_docs=25, vocab=4, max_len=18)
        k = 3
        expect = _brute_maximal(rows, k)
        assert self._spark_rows(spark, rows, k) == expect
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal_sql,
        )

        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        got = sorted(
            tuple(r)
            for r in con.execute(
                exact_substring_maximal_sql("documents", min_len=k)
            ).fetchall()
        )
        assert got == expect

    def test_span_union_equals_window_union_coverage(self, spark):
        # pinning the relationship to exact_substring_dedup: the UNION of
        # maximal repeats covers exactly the positions lying in ANY
        # corpus-repeated k-window (the coverage set both semantics agree
        # on; they differ only in structure and keep policy)
        rows = _random_corpus(23, n_docs=20, vocab=4, max_len=16)
        k = 3
        toks = {d: t.split(" ") for d, t in rows}
        from collections import defaultdict

        wocc = defaultdict(int)
        for d, tt in toks.items():
            for s in range(len(tt) - k + 1):
                wocc[tuple(tt[s : s + k])] += 1
        window_cover = {
            d: {
                p
                for s in range(len(tt) - k + 1)
                if wocc[tuple(tt[s : s + k])] >= 2
                for p in range(s, s + k)
            }
            for d, tt in toks.items()
        }
        span_cover = defaultdict(set)
        for d, s, e, _, _ in self._spark_rows(spark, rows, k):
            span_cover[d].update(range(s, e))
        for d in toks:
            assert span_cover[d] == window_cover[d], d

    def test_cap_staircases_but_preserves_coverage(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal,
        )

        rows = [(0, " ".join(f"t{i}" for i in range(12))),
                (1, " ".join(f"t{i}" for i in range(12)))]
        out = exact_substring_maximal(
            _docs(spark, rows), min_len=3, cap=5
        ).collect()
        cover = {r["doc_id"]: set() for r in out}
        for r in out:
            assert r["rep_len"] <= 5  # no span exceeds the cap
            cover[r["doc_id"]].update(range(r["s"], r["e"]))
        assert cover[0] == set(range(12)) and cover[1] == set(range(12))


class TestExactSubstringRanked:
    """Prefix-doubling suffix-rank path: same contract as the capped
    operator, no cap, no staircase (round-6 verdict task #3)."""

    def _ranked_rows(self, spark, rows, k):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal_ranked,
        )

        out = exact_substring_maximal_ranked(_docs(spark, rows), min_len=k).collect()
        return sorted(
            (r["doc_id"], r["s"], r["e"], r["rep_len"], r["rep_text"])
            for r in out
        )

    def test_matches_brute_force_incl_identical_docs(self, spark):
        # doc0/doc4 are FULL duplicates: their suffixes stay tied at
        # every doubling level (the fixpoint-stop + pk-tiebreak + clamp
        # path), and doc5 exercises overlapping within-doc repeats
        expect = _brute_maximal(TestExactSubstringMaximal.CORPUS, 3)
        assert self._ranked_rows(spark, TestExactSubstringMaximal.CORPUS, 3) == expect

    @pytest.mark.parametrize("seed", [5, 19])
    def test_random_corpus_matches_brute_force(self, spark, seed):
        rows = _random_corpus(seed, n_docs=25, vocab=4, max_len=18)
        assert self._ranked_rows(spark, rows, 3) == _brute_maximal(rows, 3)

    def test_repeat_longer_than_cap_is_one_span(self, spark):
        # the capped operator's staircase test, INVERTED: a repeat far
        # beyond _MAXREP_CAP_DEFAULT (1024) must come out as ONE span
        # per document with its full length — three-way: closed form
        # (the fixture's only repeat is the shared 1040-token run),
        # the ranked Spark path, and the DuckDB twin with a raised cap
        import duckdb
        import pandas as pd

        from dystonse_gtfs_data_spark.operators.dedup import (
            _MAXREP_CAP_DEFAULT,
            exact_substring_maximal_sql,
        )

        n = _MAXREP_CAP_DEFAULT + 16
        run = " ".join(f"r{i}" for i in range(n))
        rows = [(0, run + " xx"), (1, run + " yy")]
        expect = [
            (0, 0, n, n, run),
            (1, 0, n, n, run),
        ]
        assert self._ranked_rows(spark, rows, 5) == expect
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        got = sorted(
            tuple(r)
            for r in con.execute(
                exact_substring_maximal_sql("documents", min_len=5, cap=4096)
            ).fetchall()
        )
        assert got == expect

    def test_pure_duplicate_corpus_full_spans(self, spark):
        # regression: a corpus whose ONLY repeats are whole-document
        # duplicates hits the refinement fixpoint at round 1 (every
        # tied group is an identical suffix, nothing ever splits or
        # freezes).  The descend's clamp needs level depth covering the
        # repeat length to snap the tied-pair LCP UP to the suffix
        # length; without the span>=bound guard the build stopped with
        # acc <= 3 and silently returned ZERO spans (latent since the
        # operator landed).  40-token twin docs + unique filler must
        # come out as two full-document spans.
        run = " ".join(f"d{i}" for i in range(40))
        rows = [
            (0, run),
            (1, run),
            (2, " ".join(f"u{i}" for i in range(40))),
        ]
        got = self._ranked_rows(spark, rows, 20)
        assert got == [
            (0, 0, 40, 40, run),
            (1, 0, 40, 40, run),
        ]
        assert got == _brute_maximal(rows, 20)

    def test_no_repeats_short_circuits_empty(self, spark):
        rows = [(0, "a b c"), (1, "d e f")]
        out = self._ranked_rows(spark, rows, 2)
        assert out == []

    def test_parquet_cut_path_matches_checkpoint_path(self, spark):
        # the >16M-position branch routes every iterative cut through
        # parquet (the sf10 GCLocker fix) — force it with threshold=0
        # on a small corpus and pin bit-identical output vs the default
        # localCheckpoint branch
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal_ranked,
        )

        rows = _random_corpus(7, n_docs=20, vocab=4, max_len=16)
        a = sorted(
            tuple(r)
            for r in exact_substring_maximal_ranked(
                _docs(spark, rows), min_len=3
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in exact_substring_maximal_ranked(
                _docs(spark, rows),
                min_len=3,
                checkpoint_positions_threshold=0,
            ).collect()
        )
        assert a == b == _brute_maximal(rows, 3)

    def test_keep_one_ranked_keeps_long_repeat_contiguously(self, spark):
        # keep-one over UNCAPPED spans: for a repeat far beyond the cap,
        # the capped staircase would exempt only the first cap-length
        # step in the keeper doc (later steps of the SAME repeat are
        # non-first spans and get cut) — ranked=True keeps the keeper's
        # full text and removes the other occurrence entirely
        from dystonse_gtfs_data_spark.operators.dedup import (
            _MAXREP_CAP_DEFAULT,
            exact_substring_keep_one,
        )

        n = _MAXREP_CAP_DEFAULT + 16
        run = " ".join(f"r{i}" for i in range(n))
        rows = [(0, run + " xx"), (1, run + " yy")]
        out = {
            r["doc_id"]: r
            for r in exact_substring_keep_one(
                _docs(spark, rows), min_len=5, ranked=True
            ).collect()
        }
        assert out[0]["clean_text"] == run + " xx"  # keeper intact
        assert out[0]["removed_tokens"] == 0
        assert out[1]["clean_text"] == "yy"  # other occurrence cut
        assert out[1]["removed_tokens"] == n
        assert out[1]["n_spans"] == 1  # ONE span, not a staircase


def _brute_keep_one(rows, k):
    """Reference for the paper's keep policy: maximal repeats via
    _brute_maximal-style EXT, keep-first per repeat TEXT by (doc, pos)
    key, cut every other occurrence, merge islands, reassemble."""
    from collections import defaultdict

    toks = {d: t.split(" ") for d, t in rows}
    occ = defaultdict(int)
    for d, tt in toks.items():
        for s in range(len(tt)):
            for ln in range(1, len(tt) - s + 1):
                occ[tuple(tt[s : s + ln])] += 1

    def ext(d, s):
        tt, best = toks[d], 0
        for ln in range(1, len(tt) - s + 1):
            if occ[tuple(tt[s : s + ln])] >= 2:
                best = ln
            else:
                break
        return best

    spans = []
    for d, tt in toks.items():
        pm = None
        for s in range(len(tt)):
            e = s + ext(d, s)
            if e - s >= k and (pm is None or e > pm):
                spans.append((d, s, e, tuple(tt[s:e])))
                pm = e if pm is None else max(pm, e)
    first = {}
    for d, s, e, txt in spans:
        pk = d * 1_000_000 + s
        if txt not in first or pk < first[txt]:
            first[txt] = pk
    cuts = defaultdict(list)
    for d, s, e, txt in spans:
        if d * 1_000_000 + s != first[txt]:
            cuts[d].append((s, e))
    out = []
    for d, tt in toks.items():
        ivs = []
        for s, e in sorted(cuts[d]):
            if ivs and s <= ivs[-1][1]:
                ivs[-1] = (ivs[-1][0], max(ivs[-1][1], e))
            else:
                ivs.append((s, e))
        covered = {p for s, e in ivs for p in range(s, e)}
        kept = [t for i, t in enumerate(tt) if i not in covered]
        out.append((d, " ".join(kept), len(tt), len(tt) - len(kept), len(ivs)))
    return sorted(out)


class TestExactSubstringKeepOne:
    @pytest.mark.parametrize("seed", [13, 29])
    def test_three_way_on_random_corpus(self, spark, seed):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_keep_one,
            exact_substring_keep_one_sql,
        )

        rows = TestExactSubstringMaximal.CORPUS + [
            (10 + i, t)
            for i, (_, t) in enumerate(
                _random_corpus(seed, n_docs=20, vocab=4, max_len=18)
            )
        ]
        k = 3
        expect = _brute_keep_one(rows, k)
        got = sorted(
            tuple(r)
            for r in exact_substring_keep_one(
                _docs(spark, rows), min_len=k
            ).collect()
        )
        assert got == expect
        import pandas as pd

        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        dd = sorted(
            tuple(r)
            for r in con.execute(
                exact_substring_keep_one_sql("documents", min_len=k)
            ).fetchall()
        )
        assert dd == expect

    def test_contiguous_copy_survives_unlike_window_policy(self, spark):
        # the case that motivates the policy: every k-window of doc2's
        # repeat has its global first occurrence in a DIFFERENT doc, so
        # the window-level exemption shreds doc2 while no contiguous
        # copy of anything is preserved there; keep-one must instead
        # keep each repeat's first occurrence whole
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_keep_one,
        )

        rows = [
            (0, "a b c d X Y Z"),   # first occurrence of "a b c d"
            (1, "Q R S b c d e"),   # first occurrence of "b c d e"
            (2, "a b c d e"),       # both repeats overlap here
        ]
        out = {
            r["doc_id"]: r
            for r in exact_substring_keep_one(
                _docs(spark, rows), min_len=4
            ).collect()
        }
        # keepers stay contiguous in their first-occurrence docs
        assert out[0]["clean_text"] == "a b c d X Y Z"
        assert out[1]["clean_text"] == "Q R S b c d e"
        # doc2 loses both overlapping occurrences entirely
        assert out[2]["clean_text"] == ""
        assert out[2]["removed_tokens"] == 5


class TestSegmentDedupHardening:
    def test_maximal_persist_spans_is_value_identical(self, spark):
        # the narrow interval persist keep_one requests
        # (_persist_spans=True) must be invisible in the span set —
        # same rows, same rep_text — vs the default single-pass path
        from dystonse_gtfs_data_spark.cache import release_persisted
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_maximal,
        )

        rows = TestExactSubstringMaximal.CORPUS
        docs = _docs(spark, rows)
        try:
            plain = sorted(
                tuple(r)
                for r in exact_substring_maximal(docs, min_len=3).collect()
            )
            persisted = sorted(
                tuple(r)
                for r in exact_substring_maximal(
                    docs, min_len=3, _persist_spans=True
                ).collect()
            )
        finally:
            # always reclaim the tracked persists — a raising collect()
            # must not leak cached frames into the shared session
            release_persisted()
        assert persisted == plain and len(plain) > 0

    def test_int32_ids_do_not_overflow_pos_key(self, spark):
        # IntegerType ids >= 2148 overflow int32 when multiplied by the
        # 1e6 position base unless the key arithmetic runs in long
        # (ANSI mode raises; legacy silently corrupts keep-first order)
        from dystonse_gtfs_data_spark.operators.dedup import paragraph_dedup

        docs = spark.createDataFrame(
            [(100000, "dup seg"), (2148, "dup seg"), (99, "dup seg")],
            "doc_id int, text string",
        )
        out = {r["doc_id"]: r for r in paragraph_dedup(docs, sep="\n\n").collect()}
        # keep-first by (doc_id, pos): only the LOWEST id keeps the segment
        assert set(out) == {99}
        assert out[99]["n_kept"] == 1

    def test_metachar_separator_is_literal_and_matches_sql_twin(self, spark):
        # sep='|' must split literally (not as an empty regex alternation)
        # and agree with the DuckDB twin byte-for-byte
        import duckdb

        from dystonse_gtfs_data_spark.operators.dedup import (
            paragraph_dedup,
            paragraph_dedup_sql,
        )

        rows = [(1, "a|b"), (2, "b|c"), (3, "a|c")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
            for r in paragraph_dedup(docs, sep="|").collect()
        }
        # doc 3's every segment was seen earlier -> drops out entirely
        assert got == {1: ("a|b", 2, 0), 2: ("c", 1, 1)}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                    + ", ".join(f"({i}, '{t}')" for i, t in rows)
                    + ") t(doc_id, text)")
        oracle = {
            int(r[0]): (r[1], int(r[2]), int(r[3]))
            for r in con.execute(paragraph_dedup_sql("documents", sep="|")).fetchall()
        }
        assert got == oracle


def test_verified_repeat_starts_matches_python_oracle(spark):
    # repurposed from the retired bloom-prune equivalence probe
    # (round-10: the prune option was removed after a negative sf10
    # A/B — see _verified_repeat_starts docstring): the surviving
    # equi-join path is now pinned against a brute-force pure-Python
    # occurs-twice oracle on the same corpus
    import re
    from collections import Counter

    from dystonse_gtfs_data_spark.operators.dedup import (
        _verified_repeat_starts,
    )

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(40)]
    boiler = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for i in range(30):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25)))
        text = f"{body} {boiler}" if i % 3 == 0 else body
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = docs.select(
        "doc_id", F.split(F.col("text"), re.escape(" ")).alias("_arr")
    )
    min_len = 6
    got = {
        (r["doc_id"], r["pos"])
        for r in _verified_repeat_starts(
            base, min_len=min_len, sep=" ", id_col="doc_id"
        ).collect()
    }
    grams: Counter = Counter()
    positions = []
    for i, text in rows:
        toks = text.split(" ")
        for p in range(len(toks) - min_len + 1):
            g = " ".join(toks[p : p + min_len])
            grams[g] += 1
            positions.append((i, p, g))
    expected = {(i, p) for i, p, g in positions if grams[g] > 1}
    assert got == expected
    assert got  # the boilerplate suffix repeats across 10 docs


class TestGramStageParity:
    """Round-11 rolling Karp-Rabin gram-hash kernel: the gh swap must be
    output-IDENTICAL (gh is prefilter-only; identity and keep-first are
    decided on verified gram text), across unicode, short docs, empty
    tokens, and multi-char separators."""

    CORPUS = [
        (0, "a b c d e f g h i j a b c d e f g h i j x"),
        (1, "z y a b c d e f g h i j a b c d e f g h i j"),
        (2, "tiny"),
        (3, ""),
        (4, "ü ö ä ß € 試 験 ü ö ä ß € 試 験 one two three four"),
        (5, "a  b   c d e f g h i j a  b   c d e f g h i j"),  # empty toks
    ]

    @pytest.mark.parametrize("min_len", [3, 5])
    def test_verified_starts_identical(self, spark, min_len):
        from dystonse_gtfs_data_spark.operators.dedup import (
            _spread,
            _verified_repeat_starts,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        base = _spread(docs).select(
            F.col("doc_id"), F.split("text", " ").alias("_arr")
        )
        jvm = sorted(
            (r.doc_id, r.pos)
            for r in _verified_repeat_starts(
                base, min_len, " ", "doc_id", gram_stage="jvm"
            ).collect()
        )
        rolling = sorted(
            (r.doc_id, r.pos)
            for r in _verified_repeat_starts(
                base, min_len, " ", "doc_id", gram_stage="rolling"
            ).collect()
        )
        assert jvm == rolling
        assert jvm  # the fixture does contain repeats

    def test_full_operators_identical(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_dedup,
            exact_substring_keep_one,
            exact_substring_maximal,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        for op in (
            exact_substring_dedup,
            exact_substring_maximal,
            exact_substring_keep_one,
        ):
            a = sorted(
                map(tuple, op(docs, min_len=5, gram_stage="jvm").collect())
            )
            b = sorted(
                map(tuple, op(docs, min_len=5, gram_stage="rolling").collect())
            )
            assert a == b, op.__name__

    def test_kernel_hash_equals_equal_windows(self, spark):
        """Equal token windows must hash equal in the kernel (the only
        property the prefilter needs): doc 0 and doc 1 share the
        'a b … j' run — their window hashes at the aligned offsets
        must coincide."""
        from dystonse_gtfs_data_spark.operators.dedup import (
            _gram_hash_rows_rolling,
        )

        docs = spark.createDataFrame(
            self.CORPUS[:2], "doc_id: long, text: string"
        )
        base = docs.select(
            F.col("doc_id"), F.split("text", " ").alias("_arr")
        )
        rows = _gram_hash_rows_rolling(base, 5, " ", "doc_id").collect()
        h = {(r.doc_id, r.pos): r.gh for r in rows}
        # doc0 tokens: a..j a..j x ; doc1: z y a..j a..j — window of 5
        # starting at doc0 pos 0 == doc1 pos 2
        for off in range(8):
            assert h[(0, off)] == h[(1, off + 2)]

    def test_rejects_unknown_gram_stage(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            exact_substring_dedup,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        with pytest.raises(ValueError):
            exact_substring_dedup(docs, gram_stage="typo").collect()
