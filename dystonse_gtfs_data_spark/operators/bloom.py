"""Bloom-filter semi-join pruning: cut a big-table shuffle down to the
join's true selectivity with a fixed-size broadcast bit array.

Scale shape (the reason this operator exists): a semi join
``large ⋉ keys`` where ``keys`` is too large for a broadcast hash
relation normally shuffles EVERY row of ``large`` on the join key.  A
Bloom filter of the key set is a fixed ``m``-bit summary (8 KiB–16 MiB
regardless of key count) that CAN be broadcast; probing it is a
map-only filter over ``large``, so only the rows that might match — the
true matches plus an ``(1 - e^{-kn/m})^k`` false-positive sliver — ever
reach the exchange.  At 100 TB this turns "shuffle 100 TB" into
"shuffle selectivity × 100 TB".  Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
idea inside equi-joins; this operator makes it available explicitly —
composable, portable (md5-fold hash family reproducible in any SQL
engine), and with the verify stage visible in the plan.

Exactness: the Bloom probe is a PRUNE, not the answer.  Survivors go
through an exact semi join, so false positives never reach the output;
a false NEGATIVE is impossible by construction (every inserted key sets
exactly the bits the probe tests).  The catalog query's oracle is the
plain relational semi join — any bit-math defect that drops a true
match breaks the driver's exact hash.

Build is fully relational — no driver-side collect: positions explode
to (word, bit) pairs, ``bit_or`` folds them per word (map-side
combine, ≤ m/64 rows shuffled), and one ``map_from_entries`` +
``transform(sequence(...))`` densifies the words into a single-row
``array<bigint>`` that a 1-row broadcast nested-loop join attaches to
every probe partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _base_hash_col

BLOOM_M_BITS = 1 << 17  #: default filter width (16 KiB)
BLOOM_K = 6  #: default hash count (fp ≈ 0.9% at n = m/10)


def _bloom_pos(key: Column, i: int, m_bits: int, base_hash: str) -> Column:
    """Position of hash row ``i`` for ``key``: ``h('i:key') mod m``."""
    return F.pmod(
        _base_hash_col(F.concat(F.lit(f"{i}:"), key.cast("string")), base_hash),
        F.lit(m_bits),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Fold a key set into a SPARSE Bloom word table (widx → word,
    little-endian bit order within each 64-bit word; only nonzero words
    appear).  Associative by construction: word tables built on shards
    merge with a ``bit_or`` groupBy, so a 1000-executor build is the
    two-level aggregation Spark already runs here, and per-day filters
    roll up like any sketch.  Densify with :func:`bloom_dense` at the
    point of use (a map-typed relational densify measured 1.7 s of
    per-element map scans for a 16 KiB filter — the sparse rows are the
    right storage AND transfer format).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    hs = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
    pairs = keys.select(F.col(key_col).cast("string").alias("_k"), hs).select(
        F.pmod(
            _base_hash_col(
                F.concat(F.col("i").cast("string"), F.lit(":"), F.col("_k")),
                base_hash,
            ),
            F.lit(m_bits),
        ).alias("pos")
    )
    return (
        pairs.select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("widx"),
            # pyspark's shiftleft() takes only a literal count; the SQL
            # form accepts a column expression (same trick as the HLL
            # register fold in sketches.py)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_dense(word_rows, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Sparse (widx, word) rows → the dense m/64-long word list the
    probe expression indexes.  Bounded driver data: 16 KiB at the
    default width, the same budget class as the IVF codebook sample."""
    words = [0] * (m_bits >> 6)
    for r in word_rows:
        words[r["widx"]] |= r["word"]
    return words


def bloom_words_literal(spark, words: list[int]) -> Column:
    """The dense word list as ONE ArrayType(LongType) Literal.

    ``F.lit(list)`` lowers to ``array(lit, lit, …)`` — one child
    expression PER ELEMENT — which OOMs codegen/task-deserialization
    once a count-sized filter reaches hundreds of thousands of words
    (found live: the sf10 repeat prefilter at n=1.2 M keys → 306 k
    words → executor heap death), and even at the 2 k-word default
    width costs one py4j round trip per element (measured 2-4 s of
    driver chatter per construction — round-11 profiling found it the
    single largest cost of the bloom_semi_prune entry).  Packing the
    words into a byte buffer and calling the JVM's public
    ``functions.lit(Array[Long])`` yields a single compact Literal:
    one py4j transfer, one plan node, one task-binary broadcast — used
    at EVERY width.  Constant folding collapses the old
    ``array(lit, …)`` form to the same Literal, so executed plans are
    identical (plan-pinned).  Falls back to ``F.lit`` only if the
    gateway shape ever changes."""
    import struct

    try:
        sc = spark.sparkContext
        jvm = sc._jvm
        data = struct.pack(f">{len(words)}q", *words)
        jarr = sc._gateway.new_array(jvm.long, len(words))
        jvm.java.nio.ByteBuffer.wrap(bytearray(data)).asLongBuffer().get(jarr)
        jcol = jvm.org.apache.spark.sql.functions.lit(jarr)
        from pyspark.sql.classic.column import Column as _Column

        return _Column(jcol)
    except Exception as exc:
        # the gateway internals above are absent under Spark Connect —
        # degrading a >4096-word filter to array(lit, …) is exactly the
        # per-element codegen-OOM path the compact Literal exists to
        # avoid, so make the degradation loud before the heap does
        import warnings

        warnings.warn(
            f"bloom_words_literal: compact JVM Array[Long] literal "
            f"unavailable ({type(exc).__name__}: {exc}); falling back to "
            f"per-element F.lit for {len(words)} words — expect codegen/"
            f"task-binary blowup at this width",
            RuntimeWarning,
            stacklevel=2,
        )
        return F.lit(words).cast("array<bigint>")


def bloom_might_contain(
    key: Column,
    bloom: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    base_hash: str = "xxhash64",
) -> Column:
    """Membership probe: all ``k`` bits set.  Pure JVM expressions
    (``getbit`` over the broadcast array) — stays inside whole-stage
    codegen, no Python, no shuffle."""
    # a literal word list whose values all fit in int32 (e.g. an EMPTY
    # filter: all zeros) infers array<int>, and getbit then rejects bit
    # positions >= 32 — pin the element type the probe math assumes
    bloom = bloom.cast("array<bigint>")
    cond = F.lit(True)
    for i in range(k):
        pos = _bloom_pos(key, i, m_bits, base_hash)
        word = F.element_at(bloom, F.shiftright(pos, 6).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(pos, F.lit(64))) == 1)
    return cond


def bloom_semi_join(
    large: DataFrame,
    keys: DataFrame,
    large_key: str,
    keys_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """``large ⋉ keys`` with a Bloom pre-prune: map-only probe filters
    ``large`` down to near-selectivity before the exact semi join sees
    it.  The exact join guarantees the output equals the plain semi
    join bit-for-bit; the Bloom stage only reduces how many rows reach
    its exchange.  No broadcast hint on the verify join: at test scale
    Spark broadcasts ``keys`` on its own, at 100 TB AQE picks the
    shuffle strategy — the Bloom prune is what keeps that shuffle
    small either way."""
    # ship the filter as a LITERAL array, not a joined column: a 1-row
    # broadcast join copies the m/64-word array into every probe row's
    # buffer (16 KiB × rows of pure memcpy — measured 3× the whole
    # query); a driver-collected literal constant-folds once per task.
    words = bloom_dense(
        bloom_build(keys, keys_key, m_bits, k, base_hash).collect(), m_bits
    )
    probed = large.filter(
        bloom_might_contain(
            F.col(large_key),
            bloom_words_literal(large.sparkSession, words),
            m_bits,
            k,
            base_hash,
        )
    )
    return probed.join(
        keys.select(F.col(keys_key).alias("__bk")).distinct(),
        probed[large_key] == F.col("__bk"),
        "left_semi",
    )
