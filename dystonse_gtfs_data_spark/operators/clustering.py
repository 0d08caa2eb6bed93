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

    Scale shape per round: one shuffle join of labels onto the edge
    list + one min-groupBy (map-side combine) — both partitioned by
    node id, and AQE coalesces as labels stabilize.  Each round's
    labels are persisted and the previous round unpersisted, so lineage
    stays O(1) deep instead of O(iterations) (the classic iterative-
    DataFrame blowup).  The convergence probe is ``isEmpty()`` on the
    changed-rows frame — a bounded existence check, not a full count.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .persist()
    )
    cached = labels  # persisted frame backing the current `labels`
    try:
        for it in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("cluster").alias("nmin"))
            )
            new_labels = labels.join(neighbor_min, "id", "left").select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("nmin", F.col("cluster"))
                ).alias("cluster"),
                (F.coalesce("nmin", F.col("cluster")) < F.col("cluster")).alias(
                    "__changed"
                ),
            )
            # Every few rounds, cut the logical plan entirely (the cached
            # round still nests all prior rounds' plans — analyzer cost
            # grows per round even when the physical scan hits the cache).
            # localCheckpoint is safe HERE, unlike in a lazy builder: the
            # loop materializes it immediately and the operator owns the
            # frame's whole lifetime.
            if (it + 1) % 5 == 0:
                new_labels = new_labels.localCheckpoint(eager=False)
            new_labels = new_labels.persist()
            converged = new_labels.filter("__changed").isEmpty()  # materializes
            old = cached
            cached = new_labels
            labels = new_labels.drop("__changed")
            old.unpersist()
            if converged:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological chain graph? raise max_iter)"
        )
    finally:
        edges.unpersist()


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
