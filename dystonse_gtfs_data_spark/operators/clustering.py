"""Connected-components clustering for dedup pipelines.

Every near-dup family in :mod:`.dedup` emits PAIRS, but an actual
training pipeline needs CLUSTERS: transitively-connected duplicate
groups with one canonical survivor each (A~B and B~C must collapse to
one kept doc even when A~C was never scored).  This is the standard
min-label-propagation ("hash-min") connected components on the pair
graph, expressed as DataFrame joins.

Deterministic: the component label is the minimum doc id in the
component, independent of iteration order or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the pair graph with the min id reachable from
    it.  Returns ``(id, cluster)`` for every id appearing in ``pairs``.

    Min-label propagation WITH pointer jumping: each round every node
    takes the min of its own label and its neighbors' labels, then
    replaces that label by the label's OWN current label (every label
    is the id of a node in the graph, so the lookup is a self-join on
    the label table).  The jump squares the propagation distance per
    round, so convergence is O(log diameter) rounds — dup clusters are
    near-cliques (diameter 2-3, 3-4 rounds either way), but LSH graphs
    over gradual-drift content form CHAINS, and plain neighbor-min is
    O(diameter) there: a 61-node path needed >25 rounds before the
    jump, 7 after (and 2^25 diameter headroom under ``max_iter``).
    ``max_iter`` is a loud safety bound, not a silent truncation:
    exceeding it raises.

    Scale shape per round: ONE shuffle join of labels onto the
    pre-partitioned edge list (edges are hash-partitioned by ``src``
    once, outside the loop, so only the label side moves), ONE
    union + min-groupBy (map-side combine), and ONE pointer-jump
    self-join of the min-labels onto themselves (cluster == id) —
    three exchanges per round, no left-join row loss (the jump join
    is left+coalesce but its key always resolves).  Lineage is CUT
    eagerly at the loop boundary and
    every round (checkpoint) — without this, each round's logical plan
    re-nests the full upstream pair-mining plan several times over
    (edges appears in both join inputs) and Catalyst's analyze/optimize
    time grows geometrically: on a 256-pair minhash graph, round 1
    alone cost 9.5 s of pure driver-side planning before the cut,
    0.3 s after.  The convergence probe rides a scalar aggregate:
    labels only ever DECREASE, so the label sum is strictly monotone
    and two equal consecutive sums mean a fixpoint — no old⋈new change
    join.  The probe is delivered by ``observe()`` ON the checkpoint
    job itself (round 12): the eager cut already executes the full
    round plan, so a CollectMetrics node piggybacks the sum onto that
    job and the loop runs ONE action per round instead of a checkpoint
    plus a separate scalar-agg collect — at demo scale the per-action
    driver/AQE machinery dominates each round, and at cluster scale it
    removes one scheduler round trip per iteration for free.
    """
    spark = pairs.sparkSession

    def cut(df: DataFrame) -> DataFrame:
        # reliable checkpoint when the caller configured a dir (cluster
        # path: survives executor loss); localCheckpoint otherwise
        # (local/test path: executor-local blocks, fine in one JVM)
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = cut(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )
    # decimal(38,0): sum of ~n²/2 int64 node ids overflows (and silently
    # wraps under non-ANSI Spark) past ~4e9 nodes; decimal128 keeps the
    # monotone-sum convergence argument exact at any node count
    _label_sum = F.sum(F.col("cluster").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = cut(
        edges.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("cluster", F.col("id"))
        .observe(obs0, _label_sum)
    )
    prev_sum = obs0.get["s"]
    for _ in range(max_iter):
        contrib = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "cluster"
        )
        neigh = (
            contrib.unionByName(labels)
            .groupBy("id")
            .agg(F.min("cluster").alias("cluster"))
            # persist (not checkpoint): the jump join reads neigh twice;
            # one cut per round materializes the composed step below
            .persist()
        )
        try:
            # pointer jump: label ids are node ids, so neigh(label)
            # exists for every label — replace cluster by its label's
            # label.  The left join + coalesce is belt-and-braces for
            # the (impossible by construction) missing-parent case
            # rather than dropping rows on an inner join.
            parent = neigh.select(
                F.col("id").alias("_p_id"),
                F.col("cluster").alias("_p_cluster"),
            )
            obs = Observation()
            labels = cut(
                neigh.join(
                    parent, neigh.cluster == F.col("_p_id"), "left"
                )
                .select(
                    "id", F.coalesce("_p_cluster", "cluster").alias("cluster")
                )
                .observe(obs, _label_sum)
            )
        finally:
            neigh.unpersist()
        new_sum = obs.get["s"]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathological chain graph? raise max_iter)"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Collapse near-dup pairs into clusters: one row per clustered doc
    with its canonical representative (min id in the transitive
    component) and the component size.  ``keep`` marks the survivor.
    """
    from ..sources.tables import maybe_broadcast

    cc = connected_components(pairs, id_a, id_b)
    # sizes is one row per cluster — small for near-dup graphs, but NOT
    # bounded at corpus scale, so the hint is size-guarded
    sizes = cc.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(maybe_broadcast(sizes), "cluster")
        .select(
            F.col("id").alias("doc_id"),
            "cluster",
            "cluster_size",
            (F.col("id") == F.col("cluster")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# K-means over embedding columns (dataset-curation clustering)
# ---------------------------------------------------------------------------

KM_SCALE = 1 << 20  #: fixed-point quantization for cross-engine-exact sums


def kmeans_assign(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    coarse: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means over an ``array<float>`` column,
    expressed entirely as DataFrame ops — no UDF, no driver-side
    numpy.  Returns (id, cluster, cluster_size).

    Determinism across engines (the point — the DuckDB twin must land
    on identical assignments): float sums are order-dependent, so every
    vector element is quantized to a 2^20 fixed-point BIGINT first.
    Squared distances are then exact int64 sums (64 dims × (2^22)^2
    < 2^51), centroid sums stay below 2^53 so even the double division
    in the mean is exact-input, and the re-quantized centroid is
    floor(mean + 0.5).  Ties break on the lower centroid id.

    Init is KMV-style: the k vectors with the smallest portable hash of
    their id seed the centroids (a deterministic, engine-independent
    analog of random init).  ``rounds`` Lloyd iterations run as one
    loop with the k-row centroid table eagerly CHECKPOINTED at each
    round top (round 11): the unrolled lineage made every construction
    re-analyze a geometrically nested plan (6.7-11.6 s of driver time
    at rounds=2/coarse=4 before the cut) and made each hier reference
    re-execute the upstream round; the cut costs one k-row
    materialization per round — a pass the consuming action paid
    anyway — and is value-identical (deterministic int64 terms).

    Scale shape per round (reworked round 6 after the sf10 rehearsal):
    the assignment is an id × k row space — each vector row meets the
    broadcast k-row centroid-ARRAY table on a constant equi-key
    (BroadcastHashJoin, not a nested loop) and the squared distance is
    one JVM ``zip_with``/``aggregate`` fold per pair, so dim never
    multiplies the shuffled row count.  The previous long-form shape
    (join on ``dim`` → id × k × dim rows through a (id, cid) groupBy)
    allocated 5.7 B rows at sf10 (N=200 k, k=√N=447, dim=64) and
    GC-thrashed; the fold shape shuffles 64× fewer rows and replaces
    the per-id window with a map-side-combinable ``min(struct(d2,
    cid))``.  The centroid update stays long-form (id × dim rows,
    k-free).  Numbers are bit-identical: the same exact int64 terms
    are summed either way, and min(struct) ties break on the lower
    centroid id exactly like the old (d2, cid) window order.

    ``coarse`` (round-10) switches the assignment to an IVF-style
    TWO-LEVEL quantizer — the fix for the N·k = N^1.5 assignment cost
    that flat Lloyd pays at SemDeDup's k≈√N.  Per round, the first
    ``coarse`` fine centroids (by cid) act as the coarse codebook:
    every fine centroid and every vector first picks its nearest
    coarse cell (k·coarse + N·coarse folds), then each vector scores
    only the fine centroids of ITS cell (N·k/coarse folds on average).
    With coarse≈√k total work is N·2√k — N^1.25 at k=√N — and the
    fine-candidate join stays a broadcast (k rows).  This is a
    DIFFERENT (approximate) clustering from flat Lloyd — a vector's
    true nearest fine centroid may sit in another cell — which is
    exactly the SemDeDup trade (clustering is a blocking structure,
    not the answer); it remains fully deterministic and the SQL twin
    replays it bit-for-bit (same int64 terms, same lower-id
    tie-breaks at both levels).  A vector can never land in a fine-less
    cell: fine centroid g has d2=0 to coarse g, so cell(g)≠g requires
    an identical lower-id coarse twin g', and the shared tie-break
    then sends every vector that would pick g to g' as well.
    ``coarse=None`` (default) and ``coarse>=k`` keep the flat
    single-level assignment bit-identical to previous rounds.
    """
    from .dedup import _spread, portable_base_hash
    from pyspark.sql import Window

    q = F.transform(
        F.col(vec_col),
        lambda e: F.floor(e.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    # the assignment folds run map-side ABOVE this scan (broadcast join,
    # no shuffle below them): a one-split parquet input would pin the
    # whole N x k distance work on ONE core — the sf10 rehearsal
    # measured exactly that (single task at 93% of one core for 20 min)
    quant = _spread(embeddings).select(F.col(id_col).alias("vid"), q.alias("xq"))
    longf = quant.select(
        "vid", F.posexplode("xq").alias("dim", "x")
    )

    # TakeOrderedAndProject (orderBy + limit), not a global window: the
    # k-seed pick must not funnel every id through one sort partition
    topk = (
        quant.withColumn(
            "_h", portable_base_hash(F.col("vid").cast("string"))
        )
        .orderBy("_h", "vid")
        .limit(k)
    )
    wh = Window.orderBy("_h", "vid")  # k rows only — trivial sort
    seeds = topk.withColumn("cid", F.row_number().over(wh) - 1).drop("_h")
    # k rows of (cid, centroid ARRAY) — the broadcast side of every
    # assignment round.  `_one` keys the constant equi-join so the
    # planner picks BroadcastHashJoin; it must be NON-FOLDABLE (derived
    # from a column) — a literal folds away and the join degrades to
    # BroadcastNestedLoopJoin, which the plan lint rightly flags
    def _one(col):
        return F.pmod(F.hash(col), F.lit(1))

    cents_arr = seeds.select("cid", F.col("xq").alias("cq")).withColumn(
        "_one", _one(F.col("cid"))
    )

    def _d2(xq, cq):
        return F.aggregate(
            F.zip_with(xq, cq, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + e,
        )

    hier = coarse is not None and 1 < coarse < k

    def _cut_small(df: DataFrame) -> DataFrame:
        # k rows × dim — an eager checkpoint SEVERS the unrolled-round
        # lineage (LogicalRDD leaf), which a lazy persist cannot: the
        # cache dedups execution but every downstream transformation
        # still re-ANALYZES the full nested round plan.  Measured at
        # sf0.1 (round 11): kmeans_assign(k=16, rounds=2, coarse=4)
        # construction 6.7-11.6 s of pure driver analysis before the
        # cut, and the hier round's 3 references re-ran 50 parquet
        # scans before the round-10 persist — the cut fixes both for
        # the cost of materializing one k-row table per round (a pass
        # the consuming action paid anyway).  Reliable checkpoint when
        # the caller configured a dir (cluster path), executor-local
        # otherwise — the same branch as connected_components.
        spark = df.sparkSession
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    assign = None
    for _ in range(rounds):
        if hier:
            # cut at round top: covers the seed pick before round 1 and
            # the previous round's centroid update after — the LAST
            # round's update (dead code below the returned `assign`)
            # stays lazy and is never executed.  HIER ONLY: with 3
            # references per round the uncut hier plan grew to 481
            # Exchange / 159 parquet-scan nodes at rounds=2, now 84/12
            # (measured sf0.1 A/B, min over noisy co-tenant sessions:
            # 7.7 → 5.2 s); the flat path's
            # single-reference nesting stays small (48 Exchange) and
            # the same eager cut REGRESSED it (serialized corpus
            # passes that one action otherwise shares: semantic_dedup
            # 4.83 → 6.30 s, windowed 4.92 → 17.9 s) — measured, so
            # flat stays fully lazy.
            cents_arr = _cut_small(cents_arr)
            # coarse codebook: the first `coarse` fine centroids
            gq_tbl = (
                cents_arr.filter(F.col("cid") < coarse)
                .select(F.col("cid").alias("gid"), F.col("cq").alias("gq"))
                .withColumn("_one", _one(F.col("gid")))
            )
            # fine centroid → coarse cell (k × coarse rows, tiny)
            cell = (
                cents_arr.withColumn("_one", _one(F.col("cid")))
                .join(F.broadcast(gq_tbl), "_one")
                .select(
                    "cid",
                    F.struct(
                        _d2(F.col("cq"), F.col("gq")).alias("d2"),
                        F.col("gid"),
                    ).alias("_dg"),
                )
                .groupBy("cid")
                .agg(F.min("_dg").alias("_m"))
                .select("cid", F.col("_m.gid").alias("gid"))
            )
            # vector → coarse cell: N × coarse folds; xq rides the
            # groupBy key (constant per vid) so no second N-row join
            # is needed to recover it for the fine stage
            vcell = (
                quant.withColumn("_one", _one(F.col("vid")))
                .join(F.broadcast(gq_tbl), "_one")
                .select(
                    "vid",
                    "xq",
                    F.struct(
                        _d2(F.col("xq"), F.col("gq")).alias("d2"),
                        F.col("gid"),
                    ).alias("_dg"),
                )
                .groupBy("vid", "xq")
                .agg(F.min("_dg").alias("_m"))
                .select("vid", "xq", F.col("_m.gid").alias("gid"))
            )
            # fine candidates restricted to the vector's cell:
            # N × (k/coarse avg) folds through a broadcast equi-join
            fine = cents_arr.join(cell, "cid").select("cid", "cq", "gid")
            pairs = vcell.join(F.broadcast(fine), "gid")
        else:
            pairs = quant.withColumn("_one", _one(F.col("vid"))).join(
                F.broadcast(cents_arr), "_one"
            )
        assign = (
            pairs.select(
                "vid",
                F.struct(
                    _d2(F.col("xq"), F.col("cq")).alias("d2"), F.col("cid")
                ).alias("_dc"),
            )
            .groupBy("vid")
            .agg(F.min("_dc").alias("_m"))
            .select("vid", F.col("_m.cid").alias("cid"))
        )
        cents_long = (
            longf.join(assign, "vid")
            .groupBy("cid", "dim")
            .agg(
                F.floor(
                    F.sum("x") / F.count("*") + F.lit(0.5)
                ).cast("bigint").alias("c")
            )
        )
        cents_arr = (
            cents_long.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("cq")
            )
            .withColumn("_one", _one(F.col("cid")))
        )
    sizes = assign.groupBy("cid").agg(F.count("*").alias("cluster_size"))
    return (
        assign.join(F.broadcast(sizes), "cid")
        .select(
            F.col("vid").alias(id_col),
            F.col("cid").alias("cluster"),
            "cluster_size",
        )
    )


def kmeans_assign_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    coarse: int | None = None,
) -> str:
    """DuckDB twin of :func:`kmeans_assign` — same quantization, init,
    unrolled rounds, and tie-breaks; with ``coarse`` set, the same
    two-level assignment (coarse cell by lowest (d2, gid), then fine
    centroids of that cell only)."""
    from .dedup import portable_base_hash_sql

    fold = portable_base_hash_sql(
        f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)"
    )
    hier = coarse is not None and 1 < coarse < k
    parts = [
        f"""
    longf AS MATERIALIZED (
      SELECT {id_col} AS vid,
             generate_subscripts({vec_col}, 1) - 1 AS dim,
             CAST(floor(CAST(unnest({vec_col}) AS DOUBLE)
                        * {float(KM_SCALE)!r} + 0.5) AS BIGINT) AS x
      FROM {table}
    ),
    seeds AS MATERIALIZED (
      SELECT vid, rn - 1 AS cid FROM (
        SELECT {id_col} AS vid,
               row_number() OVER (ORDER BY ({fold}), {id_col}) AS rn
        FROM {table}
      ) WHERE rn <= {k}
    ),
    cents0 AS MATERIALIZED (
      SELECT s.cid, l.dim, l.x AS c FROM seeds s JOIN longf l USING (vid)
    )"""
    ]
    prev = "cents0"
    for r in range(1, rounds + 1):
        if hier:
            parts.append(f"""
    fcd{r} AS MATERIALIZED (
      SELECT f.cid, g.cid AS gid, sum((f.c - g.c) * (f.c - g.c)) AS d2
      FROM {prev} f JOIN {prev} g ON g.dim = f.dim AND g.cid < {coarse}
      GROUP BY 1, 2
    ),
    cell{r} AS MATERIALIZED (
      SELECT cid, gid FROM (
        SELECT cid, gid,
               row_number() OVER (PARTITION BY cid ORDER BY d2, gid) AS rn
        FROM fcd{r}
      ) WHERE rn = 1
    ),
    vcd{r} AS MATERIALIZED (
      SELECT l.vid, g.cid AS gid, sum((l.x - g.c) * (l.x - g.c)) AS d2
      FROM longf l JOIN {prev} g ON g.dim = l.dim AND g.cid < {coarse}
      GROUP BY 1, 2
    ),
    vg{r} AS MATERIALIZED (
      SELECT vid, gid FROM (
        SELECT vid, gid,
               row_number() OVER (PARTITION BY vid ORDER BY d2, gid) AS rn
        FROM vcd{r}
      ) WHERE rn = 1
    ),
    dists{r} AS MATERIALIZED (
      SELECT l.vid, c.cid, sum((l.x - c.c) * (l.x - c.c)) AS d2
      FROM longf l
      JOIN vg{r} v USING (vid)
      JOIN cell{r} m ON m.gid = v.gid
      JOIN {prev} c ON c.cid = m.cid AND c.dim = l.dim
      GROUP BY 1, 2
    ),
    assign{r} AS MATERIALIZED (
      SELECT vid, cid FROM (
        SELECT vid, cid,
               row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
        FROM dists{r}
      ) WHERE rn = 1
    ),
    cents{r} AS MATERIALIZED (
      SELECT a.cid, l.dim,
             CAST(floor(sum(l.x) / count(*) + 0.5) AS BIGINT) AS c
      FROM longf l JOIN assign{r} a USING (vid)
      GROUP BY 1, 2
    )""")
        else:
            parts.append(f"""
    dists{r} AS MATERIALIZED (
      SELECT l.vid, c.cid, sum((l.x - c.c) * (l.x - c.c)) AS d2
      FROM longf l JOIN {prev} c USING (dim)
      GROUP BY 1, 2
    ),
    assign{r} AS MATERIALIZED (
      SELECT vid, cid FROM (
        SELECT vid, cid,
               row_number() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
        FROM dists{r}
      ) WHERE rn = 1
    ),
    cents{r} AS MATERIALIZED (
      SELECT a.cid, l.dim,
             CAST(floor(sum(l.x) / count(*) + 0.5) AS BIGINT) AS c
      FROM longf l JOIN assign{r} a USING (vid)
      GROUP BY 1, 2
    )""")
        prev = f"cents{r}"
    return (
        "WITH " + ",".join(parts) + f""",
    sizes AS (
      SELECT cid, count(*) AS cluster_size FROM assign{rounds} GROUP BY 1
    )
    SELECT a.vid AS {id_col}, a.cid AS cluster, s.cluster_size
    FROM assign{rounds} a JOIN sizes s USING (cid)
    """
    )


def keep_best_per_cluster(
    members: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware survivor selection: keep the HIGHEST-quality member
    of each near-dup cluster instead of :func:`dedup_clusters`' min-id
    canonical (RefinedWeb/C4-style curation keeps the longest or
    best-scored variant of a template family, not the one with the
    smallest crawl id).  Ties break on min id so the choice is total and
    engine-independent.

    ``members``: (id, cluster) from :func:`dedup_clusters` (or any
    blocking structure); ``quality``: (id, score).  Output: one row per
    member with its score and a ``keep`` flag.  Members MISSING from
    ``quality`` (a scoring stage that filtered or failed some docs) are
    NOT silently dropped: the join is left-outer and null scores rank
    last, so an unscored member survives only when its cluster has no
    scored member at all — and it stays visible (keep=false, score
    null) either way.

    Scale shape: an equi-join on id then one window over the cluster
    shuffle — both keyed, no pair space, no driver state.
    """
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col)
    )
    return (
        members.join(quality, id_col, "left")
        .withColumn("_rk", F.row_number().over(w))
        .select(
            id_col,
            cluster_col,
            score_col,
            (F.col("_rk") == 1).alias("keep"),
        )
    )


def cluster_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 10,
    val_buckets: int = 1,
    test_buckets: int = 1,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by near-dup
    CLUSTER, not by document.

    Per-document hash splits are the classic eval-leakage bug — two
    near-duplicates land on opposite sides of the train/test fence and
    the benchmark silently measures memorization.  Here every document
    inherits the split of its transitive near-dup component (singletons
    are their own component), so by construction NO pair — scored or
    merely transitively implied — can span splits.

    Assignment is the portable md5 fold of ``"split:{seed}:" +
    cluster`` mod ``n_buckets``: train gets the low buckets, val the
    next ``val_buckets``, test the top ``test_buckets``.  Hash-of-
    cluster (rather than modulo of the label) keeps the assignment
    uncorrelated with doc-id order and stable when the corpus grows —
    a new crawl only RE-splits components whose membership changed.

    Scale shape: components via :func:`connected_components`
    (O(log diameter) pointer-jumping rounds), then one left join of the
    corpus against the (small) clustered-id table and a map-only hash —
    no new shuffles beyond the CC itself.

    Output: (id, cluster, bucket, split) — one row per document.
    """
    from .dedup import portable_base_hash

    cc = connected_components(pairs)
    labeled = (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
        )
    )
    bucket = (
        portable_base_hash(
            F.concat(
                F.lit(f"split:{seed}:"), F.col("cluster").cast("string")
            )
        )
        % n_buckets
    )
    train_hi = n_buckets - val_buckets - test_buckets
    return labeled.withColumn("bucket", bucket).select(
        F.col(id_col),
        F.col("cluster"),
        F.col("bucket"),
        F.when(F.col("bucket") < train_hi, F.lit("train"))
        .when(F.col("bucket") < train_hi + val_buckets, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
