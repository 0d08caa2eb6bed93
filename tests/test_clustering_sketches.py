"""Connected-components dedup clustering + portable HLL sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
)
from dystonse_gtfs_data_spark.operators.sketches import HLL_M, hll_estimate


def pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_transitive_chain_collapses(spark):
    # A~B, B~C, plus an unrelated D~E: two components
    p = pairs_df(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r["id"]: r["cluster"] for r in connected_components(p).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-12: worst case for min-label propagation
    p = pairs_df(spark, [(i, i + 1) for i in range(12)])
    got = {r["id"]: r["cluster"] for r in connected_components(p).collect()}
    assert got == {i: 0 for i in range(13)}


def test_clusters_mark_canonical_survivor(spark):
    p = pairs_df(spark, [(5, 2), (2, 9), (7, 8)])
    rows = {r["doc_id"]: r for r in dedup_clusters(p).collect()}
    assert rows[2]["keep"] and rows[2]["cluster_size"] == 3
    assert not rows[5]["keep"] and rows[5]["cluster"] == 2
    assert rows[7]["keep"] and rows[7]["cluster_size"] == 2
    kept = [r for r in rows.values() if r["keep"]]
    assert len(kept) == 2  # one survivor per component


def test_components_partitioning_invariant(spark):
    p = pairs_df(spark, [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)])
    a = sorted(map(tuple, connected_components(p).collect()))
    b = sorted(map(tuple, connected_components(p.repartition(13)).collect()))
    assert a == b


def test_deep_chain_converges_under_default_max_iter(spark):
    # 61-node path (diameter 60): plain neighbor-min needs 60 rounds and
    # RAISED under the default max_iter=25 before the pointer-jump step;
    # with label-of-label shortcutting the reach doubles per round, so
    # this converges in ~7 rounds.  LSH graphs over gradual-drift text
    # produce exactly this chain shape at corpus scale.
    p = pairs_df(spark, [(i, i + 1) for i in range(60)])
    got = {r["id"]: r["cluster"] for r in connected_components(p).collect()}
    assert got == {i: 0 for i in range(61)}


def test_max_iter_raises_loudly(spark):
    p = pairs_df(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(p, max_iter=2)


def test_empty_pairs_returns_empty_labels(spark):
    # degenerate input for the observe-on-checkpoint convergence probe
    # (round 12): sum over ZERO label rows is NULL on both sides of the
    # fixpoint comparison — the loop must terminate (not hang waiting
    # for metrics and not spin to max_iter) and return an empty frame
    p = spark.createDataFrame([], "id_a long, id_b long")
    rows = connected_components(p).collect()
    assert rows == []


def test_hll_estimate_accuracy(spark):
    # 256 registers → relative error ~1.04/sqrt(256) ≈ 6.5%; assert 3σ
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = hll_estimate(df, "v", ["g"]).collect()[0]["hll_distinct"]
    assert abs(est - n) / n < 0.20


def test_hll_small_range_uses_linear_counting(spark):
    # far fewer distincts than registers → linear counting, near-exact
    df = spark.createDataFrame(
        [("g", i % 7) for i in range(100)], ["g", "v"]
    )
    est = hll_estimate(df, "v", ["g"]).collect()[0]["hll_distinct"]
    assert abs(est - 7) < 1.0


def test_hll_is_value_set_function(spark):
    # same distinct set, different multiplicities/partitioning → same sketch
    a = spark.createDataFrame([("g", i) for i in range(50)], ["g", "v"])
    b = spark.createDataFrame(
        [("g", i) for i in range(50)] * 3, ["g", "v"]
    ).repartition(11)
    ea = hll_estimate(a, "v", ["g"]).collect()[0]["hll_distinct"]
    eb = hll_estimate(b, "v", ["g"]).collect()[0]["hll_distinct"]
    assert ea == eb


# ---------------------------------------------------------------------------
# Relational k-means
# ---------------------------------------------------------------------------


class TestKmeans:
    def test_separable_blobs_recovered(self, spark):
        from dystonse_gtfs_data_spark.operators.clustering import kmeans_assign

        # two tight, well-separated blobs in 4-D: ids 0..19 near -1,
        # ids 20..39 near +1 (deterministic jitter)
        rows = [
            (i, [(-1.0 if i < 20 else 1.0) + ((i * 7) % 5) * 0.01] * 4)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = kmeans_assign(df, k=2, rounds=2).toPandas()
        assert len(out) == 40
        by_side = out.assign(side=out.vec_id < 20).groupby("side").cluster.nunique()
        # each blob maps to exactly one cluster, and the two differ
        assert (by_side == 1).all()
        assert out[out.vec_id < 20].cluster.iloc[0] != out[out.vec_id >= 20].cluster.iloc[0]
        assert set(out.cluster_size) == {20}

    def test_assignment_join_is_broadcast_hash_not_bnlj(self, spark):
        # the `_one = pmod(hash(col), 1)` constant equi-key relies on the
        # optimizer NOT constant-folding it; a Spark version that folds
        # pmod(x, 1) to 0 would silently degrade the assignment join to
        # BroadcastNestedLoopJoin.  Catch that at pytest time, not only
        # in the ~20-min gate's plan-lint stage (round-6 advice item).
        from dystonse_gtfs_data_spark.operators.clustering import kmeans_assign
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        plan = kmeans_assign(emb, k=4, rounds=1)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_deterministic_across_runs(self, spark):
        from dystonse_gtfs_data_spark.operators.clustering import kmeans_assign
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        a = kmeans_assign(emb).toPandas().sort_values("vec_id").reset_index(drop=True)
        b = (
            kmeans_assign(emb.repartition(7))
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        # partitioning-invariant: exact integer distance sums make the
        # assignment independent of row order
        assert a.equals(b)
        assert a.cluster.nunique() <= 8

    def test_semantic_dedup_keeps_min_id_within_cluster(self, spark):
        from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

        # two separable blobs; within each blob every vector is a
        # near-perfect cosine duplicate of every other (same direction),
        # so SemDeDup must keep exactly the min id per blob
        rows = [
            (i, [(-1.0 if i < 10 else 1.0) * (1.0 + (i % 3) * 0.001)] * 4)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semantic_dedup(df, k=2, rounds=2, threshold=0.9).toPandas()
        assert len(out) == 20
        kept = sorted(out[out.keep].vec_id)
        assert kept == [0, 10]
        # cross-blob cosine is -1 (< threshold): blob membership must not
        # leak dups across clusters
        assert out.groupby("cluster").keep.sum().tolist() == [1, 1]

    def test_semantic_dedup_auto_k_matches_explicit_sqrt_n(self, spark):
        from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

        # 100 vectors in 10 duplicate-blobs; k=None must resolve to
        # max(8, round(sqrt(100))) = 10 with the two-level assignment on
        # (coarse = round(sqrt(10)) = 3, round-10 default for the valve)
        # and give the same keep decisions as the explicit parameters
        rows = [
            (i, [1.0 if j == i % 10 else 0.001 * (i % 3) for j in range(10)])
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        auto = semantic_dedup(df, k=None, rounds=2, threshold=0.95).toPandas()
        explicit = semantic_dedup(
            df, k=10, rounds=2, threshold=0.95, coarse=3
        ).toPandas()
        key = lambda p: p.sort_values("vec_id")[["vec_id", "keep"]].reset_index(drop=True)
        assert key(auto).equals(key(explicit))
        assert not auto.keep.all() and auto.keep.any()

    def test_kmeans_hier_coarse_degenerate_values_equal_flat(self, spark):
        # coarse=1 (one cell holds every fine centroid) and coarse>=k
        # must reproduce the flat assignment bit-for-bit — the guard
        # that the two-level rewrite cannot drift the base semantics
        from dystonse_gtfs_data_spark.operators.clustering import kmeans_assign
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        key = lambda df: (
            df.toPandas().sort_values("vec_id").reset_index(drop=True)
        )
        flat = key(kmeans_assign(emb, k=8, rounds=2, coarse=None))
        assert key(kmeans_assign(emb, k=8, rounds=2, coarse=1)).equals(flat)
        assert key(kmeans_assign(emb, k=8, rounds=2, coarse=8)).equals(flat)

    def test_kmeans_hier_matches_duckdb_twin(self, spark):
        import duckdb

        from dystonse_gtfs_data_spark.operators.clustering import (
            kmeans_assign,
            kmeans_assign_sql,
        )

        rows = [
            (i, [float(((i * 13 + j * 7) % 19) - 9) for j in range(8)])
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: (r["cluster"], r["cluster_size"])
            for r in kmeans_assign(df, k=12, rounds=2, coarse=3).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(
                f"({i}, {list(map(float, v))}::FLOAT[])" for i, v in rows
            )
            + ") x(vec_id, embedding)"
        )
        want = {
            int(r[0]): (int(r[1]), int(r[2]))
            for r in con.execute(
                kmeans_assign_sql("t", k=12, rounds=2, coarse=3)
            ).fetchall()
        }
        assert got == want
        # the two-level assignment must actually use >1 coarse cell on
        # spread-out data (not a degenerate single-cell fallback)
        assert len({c for c, _ in got.values()}) > 1

    def test_kmeans_hier_assignment_joins_stay_broadcast(self, spark):
        from dystonse_gtfs_data_spark.operators.clustering import kmeans_assign
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        plan = (
            kmeans_assign(emb, k=8, rounds=1, coarse=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_semantic_dedup_all_unique_when_orthogonal(self, spark):
        from dystonse_gtfs_data_spark.operators.similarity import semantic_dedup

        # orthogonal unit vectors: cosine 0 everywhere, nothing dropped
        rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semantic_dedup(df, k=2, rounds=1, threshold=0.5).toPandas()
        assert out.keep.all()

    def test_negative_values_quantize_consistently(self, spark):
        from dystonse_gtfs_data_spark.operators.clustering import KM_SCALE, kmeans_assign

        rows = [(0, [-0.5, 0.5]), (1, [-0.5, 0.5]), (2, [0.5, -0.5])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = kmeans_assign(df, k=2, rounds=1).toPandas()
        # identical vectors land in the same cluster
        assert out[out.vec_id == 0].cluster.iloc[0] == out[out.vec_id == 1].cluster.iloc[0]


def test_hll_merge_invariant_to_sharding(spark):
    """Register-set union-merge must reproduce the whole-set sketch for
    ANY partition of the input — the roll-up property."""
    import pyspark.sql.functions as F

    from dystonse_gtfs_data_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1100).alias("v"),
    )
    direct = {
        r["g"]: r["hll_distinct"]
        for r in hll_estimate(df, "v", ["g"]).collect()
    }
    for shards in (2, 7):
        # shard by row id, NOT by value: duplicates of the same value
        # must land in different shards for the merge to be exercised
        sharded = df.withColumn("shard", F.pmod(F.col("id"), F.lit(shards)))
        regs = hll_registers(sharded, "v", ["g", "shard"])
        merged = {
            r["g"]: r["hll_distinct"]
            for r in hll_estimate_from_registers(
                hll_merge_registers(regs, ["g"]), ["g"]
            ).collect()
        }
        assert merged == direct, shards


class TestKeepBestPerCluster:
    def test_highest_score_wins_ties_min_id(self, spark):
        from dystonse_gtfs_data_spark.operators.clustering import (
            keep_best_per_cluster,
        )

        members = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
            "doc_id long, cluster long",
        )
        quality = spark.createDataFrame(
            [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
            "doc_id long, score long",
        )
        out = keep_best_per_cluster(members, quality).toPandas()
        kept = sorted(out[out.keep].doc_id)
        # cluster 1: score tie 9 between 2 and 3 -> min id 2;
        # cluster 10: tie 4 -> min id 10
        assert kept == [2, 10]
        assert out.groupby("cluster").keep.sum().tolist() == [1, 1]
        assert len(out) == 5


class TestKeepBestUnscored:
    def test_unscored_members_survive_the_join(self, spark):
        # a member missing from the quality frame must stay visible
        # (keep=false, null score) — and win only when NO scored member
        # exists in its cluster
        from dystonse_gtfs_data_spark.operators.clustering import (
            keep_best_per_cluster,
        )

        members = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20)], "doc_id long, cluster long"
        )
        quality = spark.createDataFrame([(2, 0.9)], "doc_id long, score double")
        out = {r["doc_id"]: r for r in keep_best_per_cluster(members, quality).collect()}
        assert set(out) == {1, 2, 3}  # nobody silently dropped
        assert out[2]["keep"] and not out[1]["keep"]  # scored member wins
        assert out[1]["score"] is None
        assert out[3]["keep"]  # sole (unscored) member still survives


class TestSemanticDedupWindowed:
    def test_wide_window_equals_exact(self, spark):
        # window >= max cluster size covers every intra-cluster pair, so
        # the valve must reproduce exact SemDeDup verbatim — the
        # equivalence that anchors the approximation
        from dystonse_gtfs_data_spark.operators.similarity import (
            semantic_dedup,
            semantic_dedup_windowed,
        )
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        key = lambda df: (
            df.toPandas()
            .sort_values("vec_id")[["vec_id", "cluster", "keep"]]
            .reset_index(drop=True)
        )
        exact = key(semantic_dedup(emb, k=8, rounds=2, threshold=0.4))
        wide = key(
            semantic_dedup_windowed(
                emb, k=8, rounds=2, threshold=0.4, window=1_000_000
            )
        )
        assert exact.equals(wide)

    def test_narrow_window_is_subset_no_false_dups(self, spark):
        # a narrow window can only MISS duplicates, never invent them:
        # every windowed dup must be an exact-run dup
        from dystonse_gtfs_data_spark.operators.similarity import (
            semantic_dedup,
            semantic_dedup_windowed,
        )
        from dystonse_gtfs_data_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        exact_dups = {
            r["vec_id"]
            for r in semantic_dedup(emb, k=8, rounds=2, threshold=0.4)
            .filter("NOT keep")
            .collect()
        }
        win_dups = {
            r["vec_id"]
            for r in semantic_dedup_windowed(
                emb, k=8, rounds=2, threshold=0.4, window=4
            )
            .filter("NOT keep")
            .collect()
        }
        assert win_dups <= exact_dups
        assert win_dups  # the narrow window still catches something

    def test_planted_near_dups_rank_adjacent_full_recall(self, spark):
        # the triangle-inequality rationale made concrete: plant 30
        # duplicate PAIRS (jittered copies) among 200 background
        # vectors; each pair's two members have near-identical distance
        # to any centroid, so they rank adjacently and a SMALL window
        # reaches full recall on the planted pairs
        import random

        from dystonse_gtfs_data_spark.operators.similarity import (
            semantic_dedup,
            semantic_dedup_windowed,
        )

        rng = random.Random(11)
        rows = []
        for i in range(200):  # background: well-spread random vectors
            rows.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
        for p in range(30):  # planted: near-identical pairs
            base = [rng.uniform(-1, 1) for _ in range(16)]
            rows.append((1000 + 2 * p, base))
            rows.append(
                (1001 + 2 * p, [x + rng.uniform(-1e-4, 1e-4) for x in base])
            )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = semantic_dedup(df, k=16, rounds=2, threshold=0.99)
        exact_dups = {
            r["vec_id"] for r in exact.filter("NOT keep").collect()
        }
        # at threshold .99 only the planted copies are dups
        assert exact_dups == {1001 + 2 * p for p in range(30)}
        win = semantic_dedup_windowed(
            df, k=16, rounds=2, threshold=0.99, window=2
        )
        win_dups = {r["vec_id"] for r in win.filter("NOT keep").collect()}
        # window=2 (vs cluster sizes ~16) already achieves FULL recall:
        # near-identical vectors are rank-neighbors by construction
        assert win_dups == exact_dups


# ---------------------------------------------------------------------------
# Leakage-safe splits
# ---------------------------------------------------------------------------


def test_cluster_safe_splits_no_pair_spans_splits(spark):
    from dystonse_gtfs_data_spark.operators.clustering import (
        cluster_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id: long"
    )
    # chain 0~1~2, pair 10~11, plus transitive 20~21, 21~22, 22~23
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a: long, id_b: long",
    )
    out = cluster_safe_splits(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 50
    for a, b in [(0, 1), (1, 2), (0, 2), (10, 11), (20, 23)]:
        assert by_id[a].split == by_id[b].split  # incl. transitive pairs
        assert by_id[a].cluster == by_id[b].cluster
    # singletons are their own cluster
    assert by_id[30].cluster == 30
    # roughly 8/1/1 over many singleton clusters: all three splits occur
    assert {r.split for r in out} == {"train", "val", "test"}


def test_cluster_safe_splits_stable_under_growth(spark):
    """A new disjoint document must not move existing assignments —
    the hash is of the cluster label, not of corpus position."""
    from dystonse_gtfs_data_spark.operators.clustering import (
        cluster_safe_splits,
    )

    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id: long")
    pairs = spark.createDataFrame([(3, 7)], "id_a: long, id_b: long")
    before = {
        r.doc_id: (r.cluster, r.bucket, r.split)
        for r in cluster_safe_splits(docs, pairs).collect()
    }
    grown = docs.unionByName(
        spark.createDataFrame([(1000,)], "doc_id: long")
    )
    after = {
        r.doc_id: (r.cluster, r.bucket, r.split)
        for r in cluster_safe_splits(grown, pairs).collect()
    }
    assert all(after[i] == before[i] for i in range(30))
    assert 1000 in after
