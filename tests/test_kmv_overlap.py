"""KMV / theta-sketch corpus overlap (operators/sketches.kmv_overlap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.sketches import (
    kmv_overlap,
    kmv_sketch,
)


def _corpus(spark, ids, prefix="v"):
    return spark.createDataFrame(
        [(f"{prefix}{i}",) for i in ids], "val: string"
    )


def test_exact_when_under_k(spark):
    """Distinct counts below k: every estimate is exact set algebra."""
    a = _corpus(spark, range(0, 60, 2))  # 30 distinct
    b = _corpus(spark, range(0, 60, 3))  # 20 distinct
    row = kmv_overlap(a, b, "val", k=256).collect()[0]
    assert row.m_a == 30 and row.m_b == 20
    inter = len({*range(0, 60, 2)} & {*range(0, 60, 3)})  # mult. of 6
    union = len({*range(0, 60, 2)} | {*range(0, 60, 3)})
    assert row.inter_in_sketch == inter
    assert row.est_union == float(union)
    assert row.est_intersection == float(inter)
    assert row.jaccard_est == pytest.approx(inter / union, abs=1e-6)
    assert row.containment_a == pytest.approx(inter / 30, abs=1e-6)


def test_duplicates_collapse(spark):
    """The sketch is over DISTINCT values — replication changes nothing."""
    a1 = _corpus(spark, range(40))
    a3 = a1.unionAll(a1).unionAll(a1)
    r1 = kmv_overlap(a1, a1, "val", k=64).collect()[0]
    r3 = kmv_overlap(a3, a3, "val", k=64).collect()[0]
    assert r1 == r3
    assert r1.jaccard_est == pytest.approx(1.0, abs=1e-6)


def test_estimate_within_sketch_error(spark):
    """k=256 on 3000/2000-distinct corpora with 1000 shared: estimates
    within ~4 standard errors (σ ≈ est/√k)."""
    a = _corpus(spark, range(0, 3000))
    b = _corpus(spark, range(2000, 4000))
    row = kmv_overlap(a, b, "val", k=256).collect()[0]
    se = 4 / 256**0.5  # relative
    assert row.est_union == pytest.approx(4000, rel=se)
    assert row.est_a == pytest.approx(3000, rel=se)
    assert row.est_b == pytest.approx(2000, rel=se)
    # intersection has both union-estimate and ρ binomial error
    assert row.est_intersection == pytest.approx(1000, rel=2 * se)


def test_sketch_is_mergeable(spark):
    """bottom-k of a union == bottom-k of the concatenated sketches —
    the property that lets shard sketches combine without re-scanning."""
    x = _corpus(spark, range(0, 500))
    y = _corpus(spark, range(300, 800))
    direct = kmv_sketch(x.unionAll(y), "val", k=64).collect()
    merged = (
        kmv_sketch(x, "val", k=64)
        .unionAll(kmv_sketch(y, "val", k=64))
        .distinct()
        .orderBy("h")
        .limit(64)
        .collect()
    )
    assert [r.h for r in direct] == [r.h for r in merged]


def test_nulls_ignored_and_empty_safe(spark):
    a = spark.createDataFrame([("x",), (None,)], "val: string")
    empty = spark.createDataFrame([], "val: string")
    row = kmv_overlap(a, empty, "val", k=16).collect()[0]
    assert row.m_a == 1 and row.m_b == 0
    assert row.est_b == 0.0
    assert row.est_intersection == 0.0
    assert row.jaccard_est == 0.0
    assert row.containment_b == 0.0


def test_partitioning_invariance(spark):
    """TakeOrdered per-partition bottom-k must be partition-count
    independent."""
    a = _corpus(spark, range(1500))
    b = _corpus(spark, range(700, 2500))
    rows = {
        kmv_overlap(
            a.repartition(p), b.repartition(13 - p), "val", k=128
        ).collect()[0]
        for p in (1, 4, 8)
    }
    assert len(rows) == 1
