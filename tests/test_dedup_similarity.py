"""Dedup + similarity operators vs Python oracles.

MinHash/SimHash have no SQL oracle (xxhash64 isn't portable to DuckDB),
so we verify their *semantics* here: candidate generation recall against
an exact all-pairs Jaccard/cosine computation on a small corpus, and the
final verified outputs against exact similarity values.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from dystonse_gtfs_data_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    lsh_topk,
)


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


@pytest.fixture(scope="module")
def doc_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    # family 0: exact dup + tiny edits of `base`
    rows.append((0, base))
    rows.append((1, base))  # exact dup
    rows.append((2, base.replace("today", "tonight")))  # near dup
    rows.append((3, base.replace("quick", "slow").replace("dog", "cat")))
    # unrelated docs
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    for i in range(4, 24):
        rows.append((i, " ".join(rng.choice(vocab, 20))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(doc_corpus):
    out = exact_duplicates(doc_corpus).collect()
    assert len(out) == 1
    assert out[0]["canonical_id"] == 0
    assert out[0]["dup_count"] == 2


def test_minhash_finds_near_dups(doc_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_duplicates(doc_corpus, threshold=0.5).collect()
    }
    # exact dup pair must be found with jaccard 1.0
    assert pairs.get((0, 1)) == pytest.approx(1.0)
    # near-dup (one word changed) must be found
    assert (0, 2) in pairs and (1, 2) in pairs
    # reported jaccard values must equal the exact set jaccard
    texts = {r["doc_id"]: r["text"] for r in doc_corpus.collect()}
    for (a, b), j in pairs.items():
        exact = _jaccard(_shingle_set(texts[a]), _shingle_set(texts[b]))
        assert j == pytest.approx(exact, abs=1e-6)
        assert exact >= 0.5


def test_minhash_no_false_positives_below_threshold(doc_corpus):
    pairs = minhash_near_duplicates(doc_corpus, threshold=0.8).collect()
    texts = {r["doc_id"]: r["text"] for r in doc_corpus.collect()}
    for r in pairs:
        exact = _jaccard(_shingle_set(texts[r["id_a"]]), _shingle_set(texts[r["id_b"]]))
        assert exact >= 0.8  # verify stage guarantees no false positives


def test_simhash_deterministic_and_close_for_near_dups(doc_corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(doc_corpus).collect()}
    assert sigs[0] == sigs[1]  # identical docs → identical signature
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    # one-token edit moves few bits; unrelated docs move many
    unrelated = [bin(sigs[0] ^ sigs[i]).count("1") for i in range(4, 24)]
    assert ham_near < min(unrelated)


def test_simhash_near_duplicates_pairs(doc_corpus):
    out = {(r["id_a"], r["id_b"]) for r in simhash_near_duplicates(doc_corpus, max_hamming=10).collect()}
    assert (0, 1) in out


@pytest.fixture(scope="module")
def vec_corpus(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    # rows 0 and 1 nearly identical
    base[1] = base[0] + rng.normal(scale=0.01, size=16).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), base


def _cos_matrix(base: np.ndarray) -> np.ndarray:
    n = base / np.linalg.norm(base, axis=1, keepdims=True)
    return n @ n.T


def test_cosine_topk_exact(vec_corpus):
    df, base = vec_corpus
    out = cosine_topk(df.filter(F.col("vec_id") < 3), df, k=3, round_digits=None).collect()
    cm = _cos_matrix(base.astype(np.float64))
    for r in out:
        assert r["cosine"] == pytest.approx(cm[r["query_id"], r["neighbor_id"]], abs=1e-6)
    # rank-1 neighbor of 0 must be 1 (the near-identical vector)
    top = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert top[0] == 1 and top[1] == 0


def test_lsh_topk_recall(vec_corpus):
    df, base = vec_corpus
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    }
    # few planes + many tables for a tiny corpus: collision probability per
    # table (1 − θ/π)^planes must stay well above 0 for near-orthogonal pairs
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            df.filter(F.col("vec_id") < 5), df, k=3, dim=16, n_planes=3, n_tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # approximate, but must be far better than random
    # the portable integer plane family (SQL-reproducible buckets) must be
    # an equally valid LSH family, not just a hash gimmick
    portable = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            df.filter(F.col("vec_id") < 5), df, k=3, dim=16, n_planes=3,
            n_tables=8, plane_family="portable",
        ).collect()
    }
    assert len(exact & portable) / len(exact) >= 0.5


def test_ivf_topk_recall(vec_corpus):
    from dystonse_gtfs_data_spark.operators.similarity import ivf_topk, train_centroids

    df, base = vec_corpus
    cents = train_centroids(df, k=4, iterations=2)
    assert len(cents) == 4 and len(cents[0]) == 16
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df.filter(F.col("vec_id") < 5), df, cents, k=3, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # 3 of 4 lists probed → high recall on a tiny corpus
    # the planted near-identical pair must never be missed
    assert (0, 1) in approx


def test_embedding_near_duplicates_finds_planted_pair(vec_corpus):
    df, base = vec_corpus
    out = embedding_near_duplicates(df, threshold=0.99, dim=16).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 1) for r in out)
    cm = _cos_matrix(base.astype(np.float64))
    for r in out:
        assert r["cosine"] == pytest.approx(cm[r["id_a"], r["id_b"]], abs=1e-6)


def test_ngram_jaccard_exact_vs_brute_force(spark):
    """The inverted-index join must find EXACTLY the pairs a brute-force
    per-pair Jaccard computation finds (threshold 0.3 keeps several)."""
    from dystonse_gtfs_data_spark.operators.dedup import (
        ngram_jaccard_near_duplicates,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",       # near-dup of 0
        "pack my box with five dozen liquor jugs",
        "pack my box with five dozen brandy jugs today",   # near-dup of 2
        "completely unrelated text about spark catalyst",
        "the quick brown fox jumps over the lazy dog",     # exact dup of 0
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_near_duplicates(docs, threshold=0.3).collect()
    }

    def sh_set(t, k=3):
        toks = t.lower().split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sh_set(texts[i]), sh_set(texts[j])
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                expect[(i, j)] = jac
    assert set(got) == set(expect)
    for pair, jac in expect.items():
        assert got[pair] == pytest.approx(jac, abs=1e-12)
    assert got[(0, 5)] == 1.0  # the exact duplicate


def test_ngram_jaccard_shingle_df_cap_prunes_hot_keys(spark):
    """max_shingle_df is the documented skew valve: shingles shared by
    more than df documents stop generating candidate pairs.  Docs whose
    ONLY overlap is an ultra-common shingle lose that pair; genuinely
    near-duplicate pairs (many private shared shingles) survive."""
    from dystonse_gtfs_data_spark.operators.dedup import (
        ngram_jaccard_near_duplicates,
    )

    boiler = "terms of service apply here"
    texts = [
        f"alpha beta gamma delta {boiler}",
        f"alpha beta gamma delta epsilon {boiler}",  # true near-dup of 0
        f"one two three four five six {boiler}",     # only boilerplate shared
        f"seven eight nine ten eleven {boiler}",     # only boilerplate shared
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(docs, threshold=0.05).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(
            docs, threshold=0.05, max_shingle_df=2
        ).collect()
    }
    # every doc pair overlaps via the boilerplate → all 6 pairs uncapped
    assert uncapped == {(i, j) for i in range(4) for j in range(i + 1, 4)}
    # cap at df<=2: the 4-doc boilerplate shingles stop pairing docs, so
    # only the genuine near-dup (private shared shingles) remains
    assert capped == {(0, 1)}


def test_winnowing_guarantee_and_prune(spark):
    """Schleimer et al.'s guarantee: documents sharing a substring of
    length >= kgram + window - 1 share at least one fingerprint; and
    winnowing keeps far fewer than all k-gram hashes."""
    from dystonse_gtfs_data_spark.operators.dedup import winnow_fingerprints

    shared = "an identical plagiarized passage threaded through both essays"
    docs = spark.createDataFrame(
        [
            (0, "first document opens differently " + shared + " and then ends"),
            (1, "second one starts another way " + shared + " closing remarks"),
            (2, "third text shares absolutely nothing with the others at all"),
        ],
        "doc_id long, text string",
    )
    k, w = 8, 4
    assert len(shared) >= k + w - 1
    fps = winnow_fingerprints(docs, kgram=k, window=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared passage must share a fingerprint"
    # density: winnowing keeps ~2/w of the k-gram hashes, never all
    n0 = len("first document opens differently " + shared + " and then ends") - k + 1
    assert len(by_doc[0]) < n0 / 2


def test_winnow_xxhash_replica_parity_edge_whitespace(spark, tmp_path):
    """The pure-Python xxhash replica oracle (expected_winnow_xxhash)
    must match the Spark operator on documents with NON-SPACE edge
    whitespace: F.trim strips only ASCII spaces, so a trailing newline
    or tab is k-gram content — a replica using bare str.strip() would
    silently drop it and diverge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dystonse_gtfs_data_spark.operators.dedup import winnow_passage_overlap
    from dystonse_gtfs_data_spark.sources.demo_oracle_pipeline import (
        expected_winnow_xxhash,
    )

    shared = "an identical plagiarized passage threaded through essays"
    rows = [
        (0, "  first document opens thus " + shared + " and ends\n"),
        (1, "\tsecond begins otherwise " + shared + " closing\t\n"),
        (2, "third text shares nothing with the others whatsoever\n"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    k, w, ms, cap = 8, 4, 2, 20
    exp = expected_winnow_xxhash(
        str(tmp_path), kgram=k, window=w, min_shared=ms, max_fp_df=cap
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["shared_fps"], r["resemblance"])
        for r in winnow_passage_overlap(
            docs, kgram=k, window=w, min_shared=ms, max_fp_df=cap,
            base_hash="xxhash64",
        ).collect()
    }
    want = {
        (int(r.id_a), int(r.id_b)): (int(r.shared_fps), float(r.resemblance))
        for r in exp.itertuples()
    }
    assert got == want and (0, 1) in got


def test_winnow_fingerprints_rejects_unknown_hash_family(spark):
    import pytest as _pytest

    from dystonse_gtfs_data_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="base_hash"):
        winnow_fingerprints(docs, base_hash="xxh64")


def test_winnow_matches_reference_implementation_on_random_text(spark):
    """Property: the Spark HOF pipeline equals an independent pure-Python
    winnowing implementation on random ASCII corpora (hypothesis drives
    the text; one Spark round-trip over the whole batch)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dystonse_gtfs_data_spark.operators.dedup import winnow_fingerprints

    k, w = 5, 3

    def py_winnow(text: str) -> set[int]:
        # strip(' ') mirrors F.trim (ASCII spaces only) — bare strip()
        # would also eat the tabs/newlines the alphabet now includes
        t = text.strip(" ").lower()
        grams = (
            [t[i : i + k] for i in range(max(len(t) - k + 1, 1))]
            if len(t) > k
            else [t]
        )
        def h(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        hs = [h(g) for g in grams]
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    texts = st.lists(
        st.text(
            # \t and \n in the alphabet exercise the trim-vs-strip edge:
            # F.trim strips only ASCII spaces, so edge tabs/newlines are
            # k-gram CONTENT and replica/engine must agree on them
            alphabet="abcdefghij Z0123456789\t\n", min_size=1, max_size=60
        ).filter(lambda s: s.strip()),
        min_size=1,
        max_size=8,
    )

    @given(texts)
    @settings(max_examples=12, deadline=None)
    def check(batch):
        docs = spark.createDataFrame(
            list(enumerate(batch)), "doc_id long, text string"
        )
        got = {}
        for r in winnow_fingerprints(docs, kgram=k, window=w).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for i, t in enumerate(batch):
            assert got[i] == py_winnow(t), (i, t)

    check()


def test_ivfpq_topk_recall_and_code_compression(vec_corpus):
    from dystonse_gtfs_data_spark.operators.similarity import (
        ivfpq_topk,
        pq_encode,
        train_centroids,
        train_pq_codebooks,
    )

    df, base = vec_corpus
    cents = train_centroids(df, k=4, iterations=2)
    # ksub=8: with the shared hash-ordered sample (round-10, matching
    # train_centroids) the Lloyd seeding changed; 4 codes/subspace on
    # this 16-dim random fixture quantizes too coarsely for a stable
    # recall bound, 8 gives margin (measured 0.53 vs the 0.4 bar)
    books = train_pq_codebooks(df, m_sub=4, ksub=8, iterations=2)
    assert len(books) == 4 and all(len(c) == 4 for b in books for c in b)
    # codes are small ints — the ~30x payload cut the layout exists for
    codes = pq_encode(df, books).collect()
    assert all(0 <= r[f"code_{m}"] < 8 for r in codes for m in range(4))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            df.filter(F.col("vec_id") < 5), df, cents, books, k=3, n_probe=3
        ).collect()
    }
    # quantized scoring: lower bar than raw IVF, but far better than
    # random (3 of 20 by chance ≈ 0.15), and the planted near-identical
    # pair must survive quantization
    assert len(exact & approx) / len(exact) >= 0.4
    assert (0, 1) in approx


def test_ivfpq_empty_corpus(spark):
    from dystonse_gtfs_data_spark.operators.similarity import ivfpq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ivfpq_topk(empty, empty, [], [], k=3).count() == 0


class TestPureXxhash64:
    def test_matches_spark_all_length_branches(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.functions.xxh import xxhash64

        cases = [
            "", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
            "w" * 32, "q" * 100, "Grüße ünïcödé ✓",
            "the quick brown fox " * 20,
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(cases)], ["i", "s"]
        )
        got = {
            r["i"]: r["h"]
            for r in df.select("i", F.xxhash64("s").alias("h")).collect()
        }
        for i, s in enumerate(cases):
            assert xxhash64(s.encode("utf-8")) == got[i], repr(s[:20])

    def test_signed_range_and_abs_edge(self):
        from dystonse_gtfs_data_spark.functions.xxh import (
            spark_abs_xxhash64,
            xxhash64,
        )

        vals = [xxhash64(f"probe{i}".encode()) for i in range(200)]
        assert all(-(1 << 63) <= v < (1 << 63) for v in vals)
        assert any(v < 0 for v in vals)  # signed reinterpretation happens
        assert all(spark_abs_xxhash64(f"probe{i}") >= 0 for i in range(200))


class TestBandingPlan:
    """LSH banding planner: S-curve expectations measured over a pair
    frame (MMDS §3.4)."""

    def test_combos_cover_the_budget(self):
        from dystonse_gtfs_data_spark.operators.dedup import banding_combos

        combos = banding_combos(64)
        assert combos[0] == (64, 1) and combos[-1] == (1, 64)
        assert all(b * r == 64 for b, r in combos) and len(combos) == 7

    def test_collision_sql_matches_closed_form(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            banding_collision_sql,
        )

        import pyspark.sql.functions as F

        df = spark.range(1).select(
            *[
                F.expr(
                    banding_collision_sql(b, r, sim=f"CAST({s} AS DOUBLE)")
                ).alias(f"p_{b}_{r}_{i}")
                for i, s in enumerate([0.2, 0.5, 0.8, 0.95])
                for b, r in [(16, 4), (8, 8), (4, 16)]
            ]
        )
        row = df.collect()[0]
        for i, s in enumerate([0.2, 0.5, 0.8, 0.95]):
            for b, r in [(16, 4), (8, 8), (4, 16)]:
                expect = 1.0 - (1.0 - s**r) ** b
                assert abs(row[f"p_{b}_{r}_{i}"] - expect) < 1e-12

    def test_plan_expectations_on_known_pairs(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            banding_combos,
            banding_plan,
        )

        sims = [0.9, 0.7, 0.55, 0.4, 0.2]
        pairs = spark.createDataFrame([(s,) for s in sims], ["jaccard"])
        out = {
            (r["bands"], r["rows_per_band"]): r
            for r in banding_plan(pairs, 64, dup_threshold=0.5).collect()
        }
        for b, r in banding_combos(64):
            hits = [
                round((1.0 - (1.0 - s**r) ** b) * 1e6) for s in sims if s >= 0.5
            ]
            fps = [
                round((1.0 - (1.0 - s**r) ** b) * 1e6) for s in sims if s < 0.5
            ]
            got = out[(b, r)]
            assert got["true_pairs"] == 3 and got["near_miss_pairs"] == 2
            assert got["expected_recall"] == round(sum(hits) / 1e6 / 3, 6)
            assert got["expected_near_miss_candidates"] == round(
                sum(fps) / 1e6, 4
            )

    def test_wider_banding_trades_recall_for_waste(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import banding_plan

        pairs = spark.createDataFrame(
            [(0.6,), (0.55,), (0.45,), (0.3,)], ["jaccard"]
        )
        rows = {
            r["bands"]: r for r in banding_plan(pairs, 64, 0.5).collect()
        }
        # more bands (fewer rows each) = flatter S-curve: catches more
        # true pairs AND wastes more verification on near-misses
        assert rows[64]["expected_recall"] >= rows[1]["expected_recall"]
        assert (
            rows[64]["expected_near_miss_candidates"]
            >= rows[1]["expected_near_miss_candidates"]
        )

    def test_empty_pairs_frame(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import banding_plan

        pairs = spark.createDataFrame([], "jaccard double")
        # no observed pairs -> no plan rows (degenerate-input contract)
        assert banding_plan(pairs, 64, 0.5).count() == 0


def test_hot_bucket_cap_star_preserves_clusters(spark):
    # the 100 TB valve: a band bucket with n members normally emits
    # n(n-1)/2 candidate pairs (mass-duplicated boilerplate -> job
    # death); with hot_bucket_cap set, hot buckets emit a star to the
    # min-id representative instead.  For the case that CREATES hot
    # buckets (identical texts -> identical signatures) every star edge
    # verifies at J=1, so transitive clusters are unchanged.
    from dystonse_gtfs_data_spark.operators.clustering import dedup_clusters
    from dystonse_gtfs_data_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    run = " ".join(f"w{i % 7}" for i in range(60))
    rows = [(i, run) for i in range(40)]  # one 40-clique
    rows += [(100, "a b c d e f g h i j"), (101, "a b c d e f g h i j")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = minhash_signatures(docs)

    full = minhash_lsh_candidates(sigs)
    star = minhash_lsh_candidates(sigs, hot_bucket_cap=8)
    n_full = full.count()
    n_star = star.count()
    # the clique collapses from C(40,2)=780 pairs to a 39-edge star;
    # the small (100,101) bucket stays exact all-pairs
    assert n_full == 780 + 1
    assert n_star == 39 + 1
    assert star.exceptAll(full).count() == 0  # star edges are a subset

    cf = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(full).collect()}
    cs = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(star).collect()}
    assert cf == cs  # identical transitive clusters


def test_hot_bucket_cap_none_is_exact_default(doc_corpus):
    from dystonse_gtfs_data_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    sigs = minhash_signatures(doc_corpus)
    a = {tuple(r) for r in minhash_lsh_candidates(sigs).collect()}
    # a cap larger than every bucket must reproduce the exact pair set
    b = {tuple(r) for r in minhash_lsh_candidates(sigs, hot_bucket_cap=10_000).collect()}
    assert a == b


def test_simhash_hot_bucket_cap_preserves_clusters(spark):
    from dystonse_gtfs_data_spark.operators.clustering import dedup_clusters
    from dystonse_gtfs_data_spark.operators.dedup import simhash_near_duplicates

    run = " ".join(f"w{i % 7}" for i in range(60))
    rows = [(i, run) for i in range(40)]  # identical simhash -> 4 hot chunks
    rows += [(100, "a b c d e f g h i j"), (101, "a b c d e f g h i j")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    full = simhash_near_duplicates(docs)
    star = simhash_near_duplicates(docs, hot_bucket_cap=8)
    assert full.count() == 780 + 1
    assert star.count() == 39 + 1
    assert star.exceptAll(full).count() == 0  # subset, hamming values equal

    cf = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(full.select("id_a", "id_b")).collect()}
    cs = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(star.select("id_a", "id_b")).collect()}
    assert cf == cs


def test_simhash_hot_bucket_cap_none_is_exact_default(doc_corpus):
    from dystonse_gtfs_data_spark.operators.dedup import simhash_near_duplicates

    a = {tuple(r) for r in simhash_near_duplicates(doc_corpus).collect()}
    b = {tuple(r) for r in simhash_near_duplicates(doc_corpus, hot_bucket_cap=10_000).collect()}
    assert a == b


def test_embedding_hot_bucket_cap_star_preserves_clusters(spark):
    # identical embeddings share every bucket of every LSH table: a
    # vector duplicated n times is ~n²/2 · n_tables candidate rows.
    # With the cap, hot buckets emit a star to the min-id rep; star
    # edges rescore at cosine 1.0, so transitive clusters are unchanged.
    from dystonse_gtfs_data_spark.operators.clustering import dedup_clusters

    rng = np.random.default_rng(5)
    hot = [float(x) for x in rng.normal(size=16)]
    other = [float(x) for x in rng.normal(size=16)]
    rows = [(i, hot) for i in range(30)]  # 30 identical vectors
    rows += [(100, other), (101, [x * 1.0001 for x in other])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    full = embedding_near_duplicates(df, threshold=0.99, dim=16)
    star = embedding_near_duplicates(df, threshold=0.99, dim=16, hot_bucket_cap=8)
    pf = {(r["id_a"], r["id_b"]) for r in full.collect()}
    ps = {(r["id_a"], r["id_b"]) for r in star.collect()}
    assert {(a, b) for a, b in pf if a < 30} == {
        (a, b) for a, b in itertools.combinations(range(30), 2)
    }
    assert {(a, b) for a, b in ps if a < 30} == {(0, b) for b in range(1, 30)}
    assert ps <= pf  # star edges are a subset with identical cosines

    cf = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(full.select("id_a", "id_b")).collect()}
    cs = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(star.select("id_a", "id_b")).collect()}
    assert cf == cs


def test_embedding_hot_bucket_cap_none_is_exact_default(vec_corpus):
    df, _ = vec_corpus
    a = {tuple(r) for r in embedding_near_duplicates(df, threshold=0.9, dim=16).collect()}
    b = {
        tuple(r)
        for r in embedding_near_duplicates(
            df, threshold=0.9, dim=16, hot_bucket_cap=10_000
        ).collect()
    }
    assert a == b


def test_semantic_dedup_collapse_identical_is_output_exact(spark):
    # the SemDeDup mass-duplication valve collapses byte-identical
    # vectors before the intra-cluster pair join; the output (id,
    # cluster, keep) must be IDENTICAL to the uncollapsed run — the
    # collapse is exact, not an approximation.
    from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(9)
    dup_a = [float(x) for x in rng.normal(size=8)]
    dup_b = [float(x) for x in rng.normal(size=8)]
    rows = [(i, dup_a) for i in range(12)]           # 12 identical copies
    rows += [(20 + i, dup_b) for i in range(5)]      # 5 identical copies
    rows += [(40 + i, [float(x) for x in rng.normal(size=8)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    base = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semantic_dedup(df, k=3, rounds=2, threshold=0.9).collect()
    }
    fast = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semantic_dedup(
            df, k=3, rounds=2, threshold=0.9, collapse_identical=True
        ).collect()
    }
    assert base == fast


def test_edit_distance_collapse_and_block_cap(spark):
    # identical prefixes: n copies of one text are n(n-1)/2 dist-0 DP
    # pairs; the collapse valve emits a dist-0 star to the min-id rep
    # and runs blocking/DP on representatives only — cluster-exact by
    # construction (every blocking key is a function of the group key).
    from dystonse_gtfs_data_spark.operators.clustering import dedup_clusters
    from dystonse_gtfs_data_spark.operators.dedup import (
        edit_distance_near_duplicates,
    )

    boiler = " ".join(f"tok{i % 5}" for i in range(30))
    rows = [(i, boiler) for i in range(25)]  # 25 exact copies
    rows += [(100, boiler + " extraone"), (200, "zz " + " ".join(f"u{i}" for i in range(28)))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    full = edit_distance_near_duplicates(docs, prefix_len=200, max_dist=20)
    star = edit_distance_near_duplicates(
        docs, prefix_len=200, max_dist=20, collapse_identical_prefix=True
    )
    pf = {(r["id_a"], r["id_b"], r["dist"]) for r in full.collect()}
    ps = {(r["id_a"], r["id_b"], r["dist"]) for r in star.collect()}
    # the copy clique collapses from C(25,2) dist-0 pairs to a 24-edge star
    assert len([p for p in pf if p[0] < 100 and p[1] < 100]) == 300
    assert {p for p in ps if p[0] < 100 and p[1] < 100} == {
        (0, b, 0) for b in range(1, 25)
    }
    assert ps <= pf
    cf = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(full.select("id_a", "id_b")).collect()}
    cs = {(r["doc_id"], r["cluster"]) for r in dedup_clusters(star.select("id_a", "id_b")).collect()}
    assert cf == cs

    # block purging: cap below the clique size drops the hot block's
    # pairs entirely (documented recall trade), small blocks unaffected
    purged = edit_distance_near_duplicates(
        docs, prefix_len=200, max_dist=20, hot_block_cap=10
    )
    pp = {(r["id_a"], r["id_b"], r["dist"]) for r in purged.collect()}
    assert not [p for p in pp if p[0] < 100 and p[1] < 100]
    assert pp <= pf


def test_edit_distance_operator_default_matches_catalog_shape(doc_corpus):
    # the catalog entry calls the operator with defaults; defaults must
    # be the exact all-pairs setting (valves off)
    from dystonse_gtfs_data_spark.operators.dedup import (
        edit_distance_near_duplicates,
    )

    out = edit_distance_near_duplicates(doc_corpus, prefix_len=200, max_dist=20)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert got[(0, 1)] == 0  # the exact-dup pair at distance 0
    assert all(0 <= d <= 20 for d in got.values())


def test_ann_topk_collapse_identical_is_output_exact(spark):
    # the ANN mass-duplication valve: a vector duplicated n times puts
    # n identical entries in every probed list/bucket (Q × n scored
    # rows for content that can only contribute k ranks).  Scoring one
    # representative per distinct vector and expanding with the k+1
    # smallest member ids must reproduce the EXACT top-k under the
    # (cosine desc, id asc) tie-break — including the case where the
    # query itself is one of the k+1 smallest ids of its own group.
    from dystonse_gtfs_data_spark.operators.similarity import (
        ivf_topk,
        lsh_topk,
        train_centroids,
    )

    rng = np.random.default_rng(17)
    dim = 16
    hot = [float(x) for x in rng.normal(size=dim)]
    rows = [(i, hot) for i in range(40)]  # ids 0..39 identical
    rows += [(100 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # queries include id 0 and id 3 (members of the hot group: the
    # self-filter must not cost a rank) and two distinct vectors
    qs = df.filter(F.col("vec_id").isin([0, 3, 100, 101]))

    cents = train_centroids(df, k=4, iterations=2)
    base = {
        tuple(r)
        for r in ivf_topk(qs, df, cents, k=5, n_probe=2).collect()
    }
    fast = {
        tuple(r)
        for r in ivf_topk(
            qs, df, cents, k=5, n_probe=2, collapse_identical=True
        ).collect()
    }
    assert base == fast

    base_l = {
        tuple(r)
        for r in lsh_topk(qs, df, k=5, dim=dim, round_digits=4).collect()
    }
    fast_l = {
        tuple(r)
        for r in lsh_topk(
            qs, df, k=5, dim=dim, round_digits=4, collapse_identical=True
        ).collect()
    }
    assert base_l == fast_l


def test_ivfpq_topk_collapse_identical_is_output_exact(spark):
    from dystonse_gtfs_data_spark.operators.similarity import (
        ivfpq_topk,
        train_centroids,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(23)
    dim = 16
    hot = [float(x) for x in rng.normal(size=dim)]
    rows = [(i, hot) for i in range(40)]
    rows += [(100 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id").isin([0, 3, 100, 101]))
    cents = train_centroids(df, k=4, iterations=2)
    books = train_pq_codebooks(df, m_sub=4, ksub=4, iterations=2)

    base = {
        tuple(r)
        for r in ivfpq_topk(qs, df, cents, books, k=5, n_probe=2).collect()
    }
    fast = {
        tuple(r)
        for r in ivfpq_topk(
            qs, df, cents, books, k=5, n_probe=2, collapse_identical=True
        ).collect()
    }
    assert base == fast


def test_ngram_jaccard_collapse_identical_fixes_df_cap_blind_spot(spark):
    # max_shingle_df alone DROPS every pair between byte-identical docs
    # under mass duplication (they share all shingles, so every shingle
    # exceeds the cap) — the most-duplicated content loses all pairs.
    # collapse_identical emits a jaccard-1.0 star per identical-text
    # group and runs the index on representatives: cluster-exact, since
    # jaccard is a function of the two texts.
    from dystonse_gtfs_data_spark.operators.clustering import dedup_clusters
    from dystonse_gtfs_data_spark.operators.dedup import (
        ngram_jaccard_near_duplicates,
    )

    boiler = " ".join(f"tok{i % 6}" for i in range(24))
    near = boiler + " extra trailing words here"
    rows = [(i, boiler) for i in range(30)]       # 30 identical copies
    rows += [(100, near), (200, "zz " + " ".join(f"u{i}" for i in range(20)))]
    rows += [(300, "a b"), (301, "a b")]          # shorter than k: one whole-text shingle
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    full = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(docs, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(
            docs, threshold=0.3, max_shingle_df=10
        ).collect()
    }
    coll = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(
            docs, threshold=0.3, collapse_identical=True
        ).collect()
    }
    # the df-cap blind spot: identical-copy pairs all gone
    assert not [p for p in capped if p[0] < 100 and p[1] < 100]
    # full has the C(30,2) clique; collapse has the 29-edge star
    assert len([p for p in full if p[0] < 100 and p[1] < 100]) == 435
    assert {p for p in coll if p[0] < 100 and p[1] < 100} == {
        (0, b) for b in range(1, 30)
    }
    # short identical twins still pair in BOTH modes: shingles() maps a
    # doc shorter than k tokens to one whole-text shingle, never an
    # empty set, so the star semantics match the inverted index exactly
    assert (300, 301) in full and (300, 301) in coll
    # cluster-exact: identical transitive components
    cf = {
        (r["doc_id"], r["cluster"])
        for r in dedup_clusters(
            spark.createDataFrame(sorted(full), ["id_a", "id_b"])
        ).collect()
    }
    cc = {
        (r["doc_id"], r["cluster"])
        for r in dedup_clusters(
            spark.createDataFrame(sorted(coll), ["id_a", "id_b"])
        ).collect()
    }
    assert cf == cc


def test_xxhash64_long_matches_jvm(spark):
    # the codebook-sampling order key: the pure-Python replica must
    # reproduce F.xxhash64(bigint) exactly (little-endian
    # two's-complement long, seed 42, signed result) or the IVF
    # differential oracles drift off the engine's sample
    from dystonse_gtfs_data_spark.functions.xxh import xxhash64_long

    ids = [0, 1, 5, 499, 4096, 123456789, -7, -(1 << 63), (1 << 63) - 1]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = {
        r["vec_id"]: r["h"]
        for r in df.select("vec_id", F.xxhash64("vec_id").alias("h")).collect()
    }
    assert got == {i: xxhash64_long(i) for i in ids}


def test_train_centroids_survives_mass_duplicated_low_ids(spark):
    # the hazard the hash-order sampling exists for: ids 0..sample_size
    # all one vector.  Under id-order sampling Lloyd saw ONE point,
    # every centroid collapsed onto it, and the whole corpus landed in
    # a single inverted list (ivf_topk silently degraded to brute
    # force, measured 4x).  Hash-order sampling must keep the codebook
    # diverse and the inverted lists populated.
    from dystonse_gtfs_data_spark.operators.similarity import (
        ivf_assign,
        train_centroids,
    )

    rng = np.random.default_rng(23)
    dim = 16
    hot = [float(x) for x in rng.normal(size=dim)]
    rows = [(i, hot) for i in range(200)]  # low-id mass duplication
    rows += [
        (1000 + i, [float(x) for x in rng.normal(size=dim)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = train_centroids(df, k=4, iterations=2, sample_size=150)
    # codebook not collapsed: centroids pairwise distinct
    as_tuples = {tuple(round(x, 9) for x in c) for c in cents}
    assert len(as_tuples) == 4
    # and the corpus spreads over >1 inverted list
    lists = {
        r["centroid_id"] for r in ivf_assign(df, cents).collect()
    }
    assert len(lists) > 1


def test_ngram_collapse_composes_with_df_cap(spark):
    # the documented PRODUCTION combination: collapse_identical=True
    # closes the df-cap's identical-doc blind spot, max_shingle_df
    # stays as the recall trade for genuinely-distinct hot phrases.
    # With both ON, identical-copy groups must keep their full stars
    # even when every shingle they contain busts the cap.
    from dystonse_gtfs_data_spark.operators.dedup import (
        ngram_jaccard_near_duplicates,
    )

    boiler = "alpha beta gamma delta epsilon zeta"
    rows = [(i, boiler) for i in range(10)]  # identical group, hot shingles
    # distinct docs that merely share the hot phrase (the intended
    # df-cap casualty)
    rows += [(100 + i, f"{boiler} unique{i} tail{i} word{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_near_duplicates(
            docs, threshold=0.5, max_shingle_df=3, collapse_identical=True
        ).collect()
    }
    # the star survives the cap: all 9 copy edges to the min-id rep
    assert {(0, b) for b in range(1, 10)} <= got
    # and the capped inverted index drops the hot-phrase-only pairs
    # among DISTINCT docs (the documented recall trade)
    assert not [p for p in got if p[0] >= 100]


def test_semantic_dedup_collapse_composes_with_sqrtn_valve(spark):
    # both production valves ON (k=None -> sqrt(N) clusters +
    # collapse_identical): output must still equal the base run with
    # the same derived k — the two valves are independent by design
    # (k sizing sees the FULL corpus count; collapse only bounds the
    # pair join)
    from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(41)
    hot = [float(x) for x in rng.normal(size=8)]
    rows = [(i, hot) for i in range(30)]
    rows += [(100 + i, [float(x) for x in rng.normal(size=8)]) for i in range(70)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k_auto = max(8, round(df.count() ** 0.5))  # the valve's own formula
    coarse_auto = max(2, round(k_auto ** 0.5))  # round-10: valve is two-level
    base = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semantic_dedup(
            df, k=k_auto, rounds=2, threshold=0.9, coarse=coarse_auto
        ).collect()
    }
    fast = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semantic_dedup(
            df, k=None, rounds=2, threshold=0.9, collapse_identical=True
        ).collect()
    }
    assert base == fast


def test_semantic_dedup_collapse_keeps_null_embeddings(spark):
    # round-9 ADVICE fix: rows with a NULL embedding must survive the
    # collapse expansion (eqNullSafe join + keep coalesce) exactly as
    # the base path classifies them (keep=True: null cosine never
    # reaches the threshold filter)
    from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    v = [float(x) for x in rng.normal(size=4)]
    rows = [(0, v), (1, v), (2, None), (3, None),
            (4, [float(x) for x in rng.normal(size=4)])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = {
        (r["vec_id"], r["keep"])
        for r in semantic_dedup(df, k=2, rounds=1, threshold=0.9).collect()
    }
    fast = {
        (r["vec_id"], r["keep"])
        for r in semantic_dedup(
            df, k=2, rounds=1, threshold=0.9, collapse_identical=True
        ).collect()
    }
    assert base == fast
    assert len(fast) == len(base)


def test_winnow_xxhash_family_matches_pure_python(spark):
    # round-10 production hash family: engine fingerprints under
    # base_hash='xxhash64' must equal a pure-Python winnow over the
    # validated xxh twin — the same guarantee the replica oracle
    # (sources/demo_oracle_pipeline.expected_winnow_xxhash) builds on
    from dystonse_gtfs_data_spark.functions.xxh import xxhash64
    from dystonse_gtfs_data_spark.operators.dedup import winnow_fingerprints

    k, w = 5, 3

    def py_winnow_xx(text: str) -> set[int]:
        t = text.strip().lower()
        grams = (
            [t[i : i + k] for i in range(len(t) - k + 1)]
            if len(t) - k + 1 >= 1
            else [t[:k]]
        )
        hs = [xxhash64(g.encode("utf-8")) for g in grams]
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "  Mixed CASE with   spaces  ",
        "short",
        "ab",  # below kgram: the single substring(t, 1, k) branch
        "répétition unicode çà et là",  # multi-byte utf-8 kgrams
        "aaaaaaaaaaaaaaaaaaaa",  # constant text: one distinct fingerprint
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(
        docs, kgram=k, window=w, base_hash="xxhash64"
    ).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == py_winnow_xx(t), (i, t)


def test_winnow_rolling_matches_horner_replica_on_random_text(spark):
    """Property: the vectorized inverse-power Karp-Rabin kernel equals
    the independent Horner-loop replica on random corpora including
    unicode and edge whitespace (different algorithm shapes — an
    algebra slip in either surfaces here)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dystonse_gtfs_data_spark.operators.dedup import (
        winnow_fingerprints_rolling,
    )
    from dystonse_gtfs_data_spark.sources.demo_oracle_pipeline import (
        py_winnow_rolling,
    )

    k, w = 5, 3
    texts = st.lists(
        st.text(
            alphabet="abcdefghij Z0123456789\t\nüλ中",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )

    @given(texts)
    @settings(max_examples=12, deadline=None)
    def check(batch):
        docs = spark.createDataFrame(
            list(enumerate(batch)), "doc_id long, text string"
        )
        got = {}
        for r in winnow_fingerprints_rolling(docs, kgram=k, window=w).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for i, t in enumerate(batch):
            assert got.get(i, set()) == py_winnow_rolling(t, k, w), (i, t)

    check()


def test_winnow_rolling_guarantee_and_family_dispatch(spark):
    """The winnowing guarantee is digest-agnostic: shared substrings of
    length >= kgram + window - 1 share a rolling fingerprint too; and
    base_hash='rolling' dispatches through winnow_fingerprints."""
    from dystonse_gtfs_data_spark.operators.dedup import winnow_fingerprints

    shared = "an identical plagiarized passage threaded through both essays"
    docs = spark.createDataFrame(
        [
            (0, "first document opens differently " + shared + " and then ends"),
            (1, "second one starts another way " + shared + " closing remarks"),
            (2, "third text shares absolutely nothing with the others at all"),
        ],
        "doc_id long, text string",
    )
    k, w = 8, 4
    by_doc = {}
    for r in winnow_fingerprints(docs, kgram=k, window=w, base_hash="rolling").collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared passage must share a fingerprint"
    assert not (by_doc[0] & by_doc[1] & by_doc[2])
    n0 = len("first document opens differently " + shared + " and then ends") - k + 1
    assert len(by_doc[0]) < n0 / 2  # winnowing density, not all hashes


def test_soft_dedup_weights_exact_groups_and_cluster_mode(spark):
    """alpha semantics: a group of m copies carries weight m^(-alpha)
    per member (alpha=1 sums to 1, alpha=0 leaves everything at 1);
    cluster mode honors a provided near-dup clustering and keeps
    unclustered docs at weight 1 via the left join."""
    from dystonse_gtfs_data_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "ccc")],
        "doc_id long, text string",
    )
    w1 = {r["doc_id"]: (r["dup_count"], r["weight"])
          for r in soft_dedup_weights(docs, alpha=1.0).collect()}
    assert w1[0] == (3, round(1 / 3, 6)) == w1[1] == w1[2]
    assert w1[3] == (1, 1.0) and w1[4] == (1, 1.0)
    w0 = {r["doc_id"]: r["weight"]
          for r in soft_dedup_weights(docs, alpha=0.0).collect()}
    assert all(v == 1.0 for v in w0.values())
    # near-dup cluster mode: 0+3 clustered together despite different
    # text; 4 missing from the table entirely -> singleton weight 1
    clusters = spark.createDataFrame(
        [(0, 7), (3, 7), (1, 9), (2, 9)], "doc_id long, cluster long"
    )
    wc = {r["doc_id"]: (r["dup_count"], r["weight"])
          for r in soft_dedup_weights(docs, alpha=0.5, clusters=clusters).collect()}
    assert wc[0] == (2, round(2 ** -0.5, 6)) == wc[3]
    assert wc[1] == (2, round(2 ** -0.5, 6)) == wc[2]
    assert wc[4] == (1, 1.0)
    assert len(wc) == 5  # every input row present exactly once


class TestRollingShingleFamily:
    """Round-11 rolling Karp-Rabin shingle family for ngram Jaccard."""

    CORPUS = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy cat today"),
        (2, "a completely different document about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "short"),
        (5, "short"),
    ]

    def test_matches_text_family_on_plain_corpus(self, spark):
        """On plain-ASCII text (identical tokenization both paths and
        no 64-bit collisions), the hash family must reproduce the text
        family's pairs and jaccard values exactly."""
        from dystonse_gtfs_data_spark.operators.dedup import (
            ngram_jaccard_near_duplicates,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        text = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_near_duplicates(
                docs, threshold=0.3, shingle_family="text"
            ).collect()
        )
        rolling = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_near_duplicates(
                docs, threshold=0.3, shingle_family="rolling"
            ).collect()
        )
        assert text == rolling
        assert (0, 3, 1.0) in rolling  # identical docs
        assert (4, 5, 1.0) in rolling  # shorter-than-k whole-text shingle

    def test_collapse_identical_composes(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            ngram_jaccard_near_duplicates,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        out = ngram_jaccard_near_duplicates(
            docs,
            threshold=0.3,
            shingle_family="rolling",
            collapse_identical=True,
        ).collect()
        pairs = {(r.id_a, r.id_b): r.jaccard for r in out}
        assert pairs[(0, 3)] == 1.0 and pairs[(4, 5)] == 1.0
        assert (0, 1) in pairs  # near-dup still found via representatives

    def test_rejects_unknown_family(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            ngram_jaccard_near_duplicates,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        with pytest.raises(ValueError):
            ngram_jaccard_near_duplicates(docs, shingle_family="typo")


class TestRollingMinhashFamily:
    """Round-11 rolling base-hash family: whole signatures from the
    Arrow kernel."""

    CORPUS = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again too"),
        (2, "an entirely different body of text with no overlap at all"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
    ]

    def test_signature_properties_and_pairs(self, spark):
        from dystonse_gtfs_data_spark.operators.dedup import (
            minhash_near_duplicates,
            minhash_signatures,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        sigs = {
            r.doc_id: tuple(r.signature)
            for r in minhash_signatures(docs, base_hash="rolling").collect()
        }
        assert len(sigs) == 4 and all(len(s) == 64 for s in sigs.values())
        assert sigs[0] == sigs[3]  # identical docs, identical signature
        assert sigs[0] != sigs[2]
        # doc1 = doc0 + one appended word: J = 10/11 ≈ 0.91 →
        # E[agreement] ≈ 58/64, far above the unrelated pair's ~0
        agree = sum(a == b for a, b in zip(sigs[0], sigs[1]))
        agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
        assert agree > 44 > agree_far
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in minhash_near_duplicates(
                docs, threshold=0.5, base_hash="rolling"
            ).collect()
        }
        assert pairs[(0, 3)] == 1.0
        assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
        assert not any(2 in p for p in pairs)

    def test_matches_replica_signature_math(self, spark):
        """Kernel signature == pure-Python Horner + affine minima (the
        oracle's candidate-stage math), bit for bit."""
        from dystonse_gtfs_data_spark.operators.dedup import (
            MERSENNE_P,
            _hash_family,
            minhash_signatures,
        )

        docs = spark.createDataFrame(self.CORPUS, "doc_id: long, text: string")
        sigs = {
            r.doc_id: list(r.signature)
            for r in minhash_signatures(docs, base_hash="rolling").collect()
        }
        fam = _hash_family(64)
        KR_BASE, mask = 1_000_003, (1 << 64) - 1
        import re

        for did, text in self.CORPUS:
            toks = re.split(r"\s+", text.strip(" ").lower())
            sh = (
                {" ".join(toks)}
                if len(toks) < 3
                else {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            )
            hs = set()
            for s in sh:
                h = 0
                for c in s:
                    h = (h * KR_BASE + ord(c)) & mask
                hs.add(h % MERSENNE_P)
            want = [min((h * a + b) % MERSENNE_P for h in hs) for a, b in fam]
            assert sigs[did] == want
