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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the pair graph with the min id reachable from
    it.  Returns ``(id, cluster)`` for every id appearing in ``pairs``.

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels; converges in O(graph diameter)
    rounds (dup clusters are near-cliques — diameter 2-3 in practice,
    so 3-4 rounds).  ``max_iter`` is a loud safety bound, not a silent
    truncation: exceeding it raises.

    Scale shape per round: ONE shuffle join of labels onto the
    pre-partitioned edge list (edges are hash-partitioned by ``src``
    once, outside the loop, so only the label side moves) and ONE
    union + min-groupBy (map-side combine) — two exchanges per round,
    no left join.  Lineage is CUT eagerly at the loop boundary and
    every round (checkpoint) — without this, each round's logical plan
    re-nests the full upstream pair-mining plan several times over
    (edges appears in both join inputs) and Catalyst's analyze/optimize
    time grows geometrically: on a 256-pair minhash graph, round 1
    alone cost 9.5 s of pure driver-side planning before the cut,
    0.3 s after.  The convergence probe rides a scalar aggregate:
    labels only ever DECREASE, so the label sum is strictly monotone
    and two equal consecutive sums mean a fixpoint — no old⋈new change
    join.
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
    labels = cut(
        edges.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("cluster", F.col("id"))
    )
    prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]
    for _ in range(max_iter):
        contrib = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "cluster"
        )
        labels = cut(
            contrib.unionByName(labels)
            .groupBy("id")
            .agg(F.min("cluster").alias("cluster"))
        )
        new_sum = labels.agg(F.sum("cluster")).collect()[0][0]
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
