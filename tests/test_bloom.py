"""Bloom-filter semi-join prune: exactness under heavy false-positive
pressure, the no-false-negative construction guarantee, and the
fixed-size-summary property that makes the operator the 100 TB answer
to a non-broadcastable semi join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.bloom import (
    BLOOM_M_BITS,
    bloom_build,
    bloom_dense,
    bloom_might_contain,
    bloom_semi_join,
)


def _corpus(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("payload")
    )


def _dense(spark_words, m_bits):
    return bloom_dense(spark_words.collect(), m_bits)


def test_bloom_semi_join_equals_exact_semi_join_under_fp_pressure(spark):
    """A deliberately undersized filter (256 bits for 150 keys, k=2 →
    false-positive rate way past any sane deployment) must still return
    exactly the true semi join: the verify stage owns correctness, the
    Bloom stage only prunes."""
    large = _corpus(spark)
    keys = spark.range(150).select((F.col("id") * 3).alias("kk"))
    got = bloom_semi_join(large, keys, "k", "kk", m_bits=256, k=2)
    expect = large.join(
        keys.withColumnRenamed("kk", "k").distinct(), "k", "left_semi"
    )
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in expect.collect()
    )


def test_bloom_probe_has_no_false_negatives(spark):
    """Every inserted key must pass the probe — the property the whole
    operator rests on (a miss would silently drop true join matches)."""
    keys = _corpus(spark, 300).select("k")
    for base_hash in ("xxhash64", "md5"):
        words = _dense(
            bloom_build(keys, "k", m_bits=1024, k=4, base_hash=base_hash), 1024
        )
        survivors = keys.filter(
            bloom_might_contain(
                F.col("k"), F.lit(words), m_bits=1024, k=4, base_hash=base_hash
            )
        ).count()
        assert survivors == 300, base_hash


def test_bloom_filter_is_fixed_size_and_merges(spark):
    """The summary is m/64 words regardless of key count, and word
    tables built on disjoint shards OR together into the filter of the
    union — the associativity that makes a 1000-executor build a plain
    two-level aggregation (and per-day filters roll up like sketches)."""
    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(200, 400).select(F.col("id").alias("k"))
    m = 2048
    wa = _dense(bloom_build(a, "k", m_bits=m), m)
    wb = _dense(bloom_build(b, "k", m_bits=m), m)
    # relational merge: union the sparse word tables, bit_or per widx
    merged_df = (
        bloom_build(a, "k", m_bits=m)
        .union(bloom_build(b, "k", m_bits=m))
        .groupBy("widx")
        .agg(F.bit_or("word").alias("word"))
    )
    wu = _dense(bloom_build(a.union(b), "k", m_bits=m), m)
    assert len(wa) == len(wb) == len(wu) == m // 64
    assert [x | y for x, y in zip(wa, wb)] == wu
    assert _dense(merged_df, m) == wu


def test_bloom_prune_actually_prunes(spark):
    """With a properly sized filter, non-member rows are dropped by the
    map-only probe (selectivity reaches the exchange, not the full
    table): probing 500 rows against 50 members leaves ≈50 survivors."""
    large = _corpus(spark)
    keys = spark.range(50).select((F.col("id") * 10).alias("kk"))
    words = _dense(bloom_build(keys, "kk"), BLOOM_M_BITS)
    survivors = large.filter(
        bloom_might_contain(F.col("k"), F.lit(words))
    ).count()
    assert 50 <= survivors < 80, survivors


def test_portable_hash_positions_are_pinned(spark):
    """Golden constants for the md5-fold position family: the DuckDB
    twins regenerate these positions from the literal formula, so a
    silent change to the fold (substr width, salt format, modulus)
    would break every portable oracle.  Derived independently:
    int(md5(f"{i}:42")[:15], 16) % 1024."""
    from dystonse_gtfs_data_spark.operators.bloom import _bloom_pos

    df = spark.range(1).select(F.lit(42).alias("k"))
    got = df.select(
        *[_bloom_pos(F.col("k"), i, 1024, "md5").alias(f"p{i}") for i in range(4)]
    ).collect()[0]
    assert [got[f"p{i}"] for i in range(4)] == [917, 585, 608, 885]


def test_bloom_words_literal_single_literal_matches_per_element_lit(spark):
    # the count-sized-filter path: one compact ArrayType(LongType)
    # Literal via the JVM's lit(Array[Long]) must probe identically to
    # the per-element F.lit (which is only safe at small widths — a
    # 306k-word filter OOMed executors on per-element literals)
    import random

    from dystonse_gtfs_data_spark.operators.bloom import (
        bloom_words_literal,
    )

    rng = random.Random(7)
    # > 4096 words forces the JVM single-literal path; mix in negative
    # longs (bit_or outputs are SIGNED int64)
    words = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(5000)]
    probe = spark.range(0, 2000).select(
        (F.col("id") % 5000 + 1).cast("int").alias("idx")
    )
    got = probe.select(
        F.element_at(bloom_words_literal(spark, words), F.col("idx")).alias("w")
    ).collect()
    assert [r["w"] for r in got] == [words[i % 5000] for i in range(2000)]


def test_bloom_words_literal_small_path_is_bigint(spark):
    # all-zero word lists must still probe as array<bigint> (getbit
    # rejects positions >= 32 on int elements)
    from dystonse_gtfs_data_spark.operators.bloom import (
        bloom_might_contain,
        bloom_words_literal,
    )

    lit0 = bloom_words_literal(spark, [0] * 2048)
    n = (
        spark.range(0, 100)
        .filter(bloom_might_contain(F.col("id"), lit0, 1 << 17))
        .count()
    )
    assert n == 0
