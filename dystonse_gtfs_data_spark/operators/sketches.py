"""Portable distinct-counting sketch (HyperLogLog) built from exact
integer arithmetic, reproducible in any SQL engine.

At 100 TB an exact ``count(distinct x)`` per group shuffles every
distinct value; an HLL register set is a fixed 2^b-bucket summary that
merges associatively — the standard scale answer.  Spark has
``approx_count_distinct`` (native HLL++), but its register hashing is
JVM-private, so its estimates cannot be verified by an independent
engine.  This implementation pins every step to portable primitives:

- hash: the md5 fold (:func:`..operators.dedup.portable_base_hash`,
  60 bits)
- register index: ``h % m``; remainder ``w = h // m`` (52 bits)
- rank: ``rho = 53 - bitlength(w)`` with ``bitlength`` computed by
  STRING ops (``length(ltrim(bin(w), '0'))``) — identical unpadded
  ``bin`` semantics in Spark and DuckDB, no float log2 anywhere
- the harmonic sum is kept in EXACT int64: ``Z · 2^53 =
  Σ 2^(53 − M_j)`` ≤ m · 2^53 < 2^63, so engines agree bit-for-bit
  and only the final ``alpha · m² · 2^53 / Z_scaled`` division is
  floating point (one correctly-rounded op on identical operands).

Estimator: raw HLL with the standard linear-counting small-range
correction (Flajolet et al. 2007).  Outputs are rounded to 4 dp to
absorb any last-ulp ln() divergence in the correction branch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_base_hash, portable_base_hash_sql

HLL_B = 8  #: register index bits
HLL_M = 1 << HLL_B  #: number of registers
_WBITS = 53  #: max rank (60-bit hash − 8 index bits → 52-bit remainder, +1)


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col``.

    Two-level aggregation: (group, register) → max rank, then group →
    exact integer harmonic sum.  Both levels get map-side combine, and
    the second level's shuffle carries at most m=256 rows per group —
    the fixed-size-summary property that makes HLL the right shape for
    a 1000-executor distinct count.
    """
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols), group_cols
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The per-group register set (reg → max rank): the ≤m-row summary
    that IS the mergeable sketch state — persist these per day/source
    and union-merge later instead of re-reading raw data."""
    h = portable_base_hash(F.col(value_col).cast("string"))
    # h // m MUST be integer arithmetic: double division would round
    # above 2^53 and disagree with the SQL twin's exact `//`
    w = F.shiftright(h, HLL_B)
    # bin() is unpadded on both engines, so bitlength(w) is just
    # length(bin(w)) — except w=0, whose bin is the 1-char string "0"
    rho = F.when(w == 0, F.lit(_WBITS)).otherwise(
        F.lit(_WBITS) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, (h % HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-merge sharded register sets: element-wise max — the
    associativity that lets per-day sketches roll up to any window
    without touching raw data."""
    return regs.groupBy(*group_cols, "reg").agg(
        F.max("mrho").alias("mrho")
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Registers → estimate (exact-int harmonic sum, one float division,
    linear-counting small-range correction)."""
    zsum = regs.groupBy(*group_cols).agg(
        # pyspark's shiftleft() only takes a literal bit count; the SQL
        # form accepts a column expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_WBITS} - mrho)"))
        .alias("z_present"),
        F.count("*").alias("n_regs"),
    )
    z_scaled = F.col("z_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(
        1 << _WBITS
    )
    raw = F.lit(_alpha(HLL_M) * HLL_M * HLL_M * float(1 << _WBITS)) / z_scaled
    zeros = F.lit(HLL_M) - F.col("n_regs")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return zsum.select(*group_cols, F.round(est, 4).alias("hll_distinct"))


def hll_estimate_sql(
    table: str,
    value_expr: str,
    group_cols: list[str],
) -> str:
    """DuckDB twin of :func:`hll_estimate` (same integer registers)."""
    g = ", ".join(group_cols)
    fold = portable_base_hash_sql(
        f"substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15)"
    )
    alpha_num = _alpha(HLL_M) * HLL_M * HLL_M * float(1 << _WBITS)
    return f"""
    WITH hashed AS (
      SELECT {g}, ({fold}) % {HLL_M} AS reg,
             {_WBITS} - length(ltrim(bin(CAST(({fold}) // {HLL_M} AS BIGINT)),
                                     '0')) AS rho
      FROM {table}
    ),
    regs AS (
      SELECT {g}, reg, max(rho) AS mrho FROM hashed GROUP BY {g}, reg
    ),
    zsum AS (
      SELECT {g},
             CAST(sum(CAST(1 AS BIGINT) << ({_WBITS} - mrho)) AS BIGINT)
               AS z_present,
             count(*) AS n_regs
      FROM regs GROUP BY {g}
    )
    SELECT {g},
           round(CASE WHEN {alpha_num!r} / (z_present
                        + ({HLL_M} - n_regs) * (CAST(1 AS BIGINT) << {_WBITS}))
                        <= 2.5 * {HLL_M}
                      AND n_regs < {HLL_M}
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                                 / ({HLL_M} - n_regs))
                      ELSE {alpha_num!r} / (z_present
                        + ({HLL_M} - n_regs) * (CAST(1 AS BIGINT) << {_WBITS}))
                 END, 4) AS hll_distinct
    FROM zsum
    """


# ---------------------------------------------------------------------------
# KMV (bottom-k) quantile sketch
# ---------------------------------------------------------------------------

KMV_K = 1024  #: default sample size per group
_HASH60_MAX = float(1 << 60)  #: portable_base_hash codomain
_KMV_SLACK = 8  #: threshold over-sampling factor (P[short sample] ≈ e^-k)


def kmv_quantile_sample(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int = KMV_K,
):
    """Per-group deterministic uniform row sample: the ``k`` rows whose
    portable 60-bit hash of ``id_col`` is smallest (bottom-k / KMV).

    Scale shape: a naive ``row_number() OVER (ORDER BY hash)`` sorts
    EVERY row of the group through the shuffle.  Instead the sample is
    threshold-pre-filtered: one map-side-combined count per group fixes
    a hash cutoff with expected ``slack·k`` survivors, the full scan
    keeps only rows under the cutoff (a map-only filter — no sort
    touches the fact table), and the final exact bottom-k rank runs on
    the tiny survivor set.  If a group ever yields fewer than ``k``
    survivors the result is still a valid uniform sample (every
    sub-threshold row IS kept), just smaller — quantile estimates stay
    unbiased.  Everything is deterministic, so an independent SQL twin
    reproduces the exact sample.
    """
    from pyspark.sql import Window

    h = portable_base_hash(F.col(id_col).cast("string"))
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("_ng"))
    # double threshold: identical one-op arithmetic in any IEEE engine
    thresh = F.lit(float(_KMV_SLACK * k)) / F.col("_ng") * F.lit(_HASH60_MAX)
    survivors = (
        df.join(counts, group_cols)
        .withColumn("_h", h)
        .filter(F.col("_h").cast("double") < thresh)
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h"), F.col(id_col))
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_h", "_rn", "_ng")
    )


def kmv_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = KMV_K,
) -> DataFrame:
    """Per-group quantile ESTIMATES from the bottom-k sample, with the
    exact quantile alongside (same percentile-disc rule over the full
    group) so callers can see the sketch error.

    Percentile rule (dialect-portable, deterministic): the value at row
    ``greatest(1, ceil(q·n))`` when ordered by (value, id).  The exact
    side is a full per-group sort — it exists for verification; at
    100 TB you run only the sample side, whose sort touches ≤ k rows
    per group.
    """
    from pyspark.sql import Window

    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")

    def disc(src: DataFrame, out_name: str) -> DataFrame:
        wv = Window.partitionBy(*group_cols).orderBy(
            F.col(value_col), F.col(id_col)
        )
        wn = Window.partitionBy(*group_cols)
        ranked = src.select(
            *group_cols,
            F.col(value_col),
            F.row_number().over(wv).alias("_vr"),
            F.count("*").over(wn).alias("_n"),
        )
        picked = ranked.select(*group_cols, value_col, "_vr", "_n", qlit)
        return picked.filter(
            F.col("_vr")
            == F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n")).cast("int"))
        ).select(*group_cols, "q", F.col(value_col).alias(out_name))

    est = disc(kmv_quantile_sample(df, id_col, group_cols, k), "q_est")
    exact = disc(df, "q_exact")
    return est.join(exact, [*group_cols, "q"])


def kmv_quantiles_sql(
    table: str,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = KMV_K,
) -> str:
    """DuckDB twin of :func:`kmv_quantiles` — same hash, threshold,
    bottom-k rank, and percentile-disc rule."""
    g = ", ".join(group_cols)
    fold = portable_base_hash_sql(
        f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)"
    )
    qvals = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
    WITH counts AS (
      SELECT {g}, count(*) AS ng FROM {table} GROUP BY {g}
    ),
    survivors AS (
      SELECT t.*, ({fold}) AS h
      FROM {table} t JOIN counts USING ({g})
      WHERE CAST(({fold}) AS DOUBLE)
            < {float(_KMV_SLACK * k)!r} / ng * {_HASH60_MAX!r}
    ),
    sample AS (
      SELECT * FROM (
        SELECT s.*, row_number() OVER (PARTITION BY {g}
                                       ORDER BY h, {id_col}) AS rn
        FROM survivors s
      ) WHERE rn <= {k}
    ),
    qs(q) AS (VALUES {qvals}),
    est AS (
      SELECT {g}, q, {value_col} AS q_est FROM (
        SELECT {g}, {value_col}, q,
               row_number() OVER (PARTITION BY {g}, q
                                  ORDER BY {value_col}, {id_col}) AS vr,
               count(*) OVER (PARTITION BY {g}, q) AS n
        FROM sample CROSS JOIN qs
      ) WHERE vr = greatest(1, CAST(ceiling(q * n) AS INT))
    ),
    exact AS (
      SELECT {g}, q, {value_col} AS q_exact FROM (
        SELECT {g}, {value_col}, q,
               row_number() OVER (PARTITION BY {g}, q
                                  ORDER BY {value_col}, {id_col}) AS vr,
               count(*) OVER (PARTITION BY {g}, q) AS n
        FROM {table} CROSS JOIN qs
      ) WHERE vr = greatest(1, CAST(ceiling(q * n) AS INT))
    )
    SELECT {g}, q, q_est, q_exact FROM est JOIN exact USING ({g}, q)
    """


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

CM_D = 4  #: hash rows
CM_W = 512  #: cells per row (ε ≈ e/w ≈ 0.5% of stream length)


def _cm_cell(term, i: int):
    """Row-i cell index: portable md5-fold of 'i:term' mod CM_W."""
    return portable_base_hash(F.concat(F.lit(f"{i}:"), term)) % CM_W


def countmin_sketch(tokens: DataFrame, term_col: str) -> DataFrame:
    """(hash_row, cell) → occurrence count: the fixed d×w-cell summary.

    Scale shape: each occurrence explodes into d=4 (row, cell) pairs and
    the groupBy gets map-side combine, so the shuffle carries at most
    d·w = 2048 rows regardless of stream size — the property that makes
    Count-Min the answer to term frequencies over a 100 TB token stream
    (an exact per-term groupBy shuffles the whole vocabulary).
    Sketches merge by cell-wise + across days/sources."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias("h")
    pairs = tokens.select(F.col(term_col).alias("_t"), rows)
    # cell expression as a chained CASE on the hash-row id
    cell = F.lit(0)
    for i in range(CM_D):
        cell = F.when(F.col("h") == i, _cm_cell(F.col("_t"), i)).otherwise(cell)
    return (
        pairs.select("h", cell.alias("cell"))
        .groupBy("h", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_topk(
    tokens: DataFrame, term_col: str, k: int = 20
) -> DataFrame:
    """Top-k exact terms with their Count-Min estimates side-by-side
    (cm_est ≥ n_exact always; the gap is the collision overcount).  The
    exact side exists for verification — at 100 TB you keep only the
    sketch and probe candidate terms against it."""
    from pyspark.sql import Window

    sketch = countmin_sketch(tokens, term_col)
    exact = tokens.groupBy(F.col(term_col).alias("term")).agg(
        F.count("*").alias("n_exact")
    )
    # TakeOrderedAndProject (orderBy + limit), then rank the k survivors
    # with a trivial window — a bare global row_number would funnel the
    # whole vocabulary through one sort partition
    topk = exact.orderBy(F.desc("n_exact"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("n_exact"), F.asc("term"))
    top = topk.withColumn("rank", F.row_number().over(w))
    probes = top.select(
        "term",
        "n_exact",
        "rank",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"), _cm_cell(F.col("term"), i).alias("cell")
                    )
                    for i in range(CM_D)
                ]
            )
        ).alias("p"),
    ).select("term", "n_exact", "rank", F.col("p.h").alias("h"), F.col("p.cell").alias("cell"))
    joined = probes.join(F.broadcast(sketch), ["h", "cell"])
    return (
        joined.groupBy("term", "n_exact", "rank")
        .agg(F.min("cnt").alias("cm_est"))
    )


def countmin_topk_sql(words: str, term_col: str, k: int = 20) -> str:
    """DuckDB twin of :func:`countmin_topk`.  ``words`` is a subquery
    producing one row per token occurrence with column ``term_col``."""
    def cell(i: int, t: str) -> str:
        fold = portable_base_hash_sql(
            f"substr(md5('{i}:' || {t}), 1, 15)"
        )
        return f"(({fold}) % {CM_W})"

    sketch_arms = " UNION ALL ".join(
        f"SELECT {i} AS h, {cell(i, term_col)} AS cell FROM ({words})"
        for i in range(CM_D)
    )
    probe_arms = " UNION ALL ".join(
        f"SELECT term, n_exact, rank, {i} AS h, {cell(i, 'term')} AS cell FROM top"
        for i in range(CM_D)
    )
    return f"""
    WITH sketch AS (
      SELECT h, cell, count(*) AS cnt FROM ({sketch_arms}) GROUP BY h, cell
    ),
    exact AS (
      SELECT {term_col} AS term, count(*) AS n_exact
      FROM ({words}) GROUP BY 1
    ),
    top AS (
      SELECT term, n_exact,
             row_number() OVER (ORDER BY n_exact DESC, term ASC) AS rank
      FROM exact QUALIFY rank <= {k}
    ),
    probes AS ({probe_arms})
    SELECT p.term, p.n_exact, p.rank, min(s.cnt) AS cm_est
    FROM probes p JOIN sketch s USING (h, cell)
    GROUP BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta-style) corpus overlap
# ---------------------------------------------------------------------------

KMV_OVERLAP_K = 256  #: default sketch size (rel. std err ≈ 1/√k ≈ 6%)


def kmv_sketch(df: DataFrame, value_col: str, k: int = KMV_OVERLAP_K) -> DataFrame:
    """Bottom-k sketch of the DISTINCT values of ``value_col``: the k
    smallest portable 60-bit hashes, one ``h`` column.

    Scale shape: ``distinct()`` on the hash-only projection is a
    map-side-combined hash aggregate (duplicates collapse before the
    exchange, and the exchange carries 8-byte rows), then
    ``orderBy(h).limit(k)`` plans as TakeOrdered — per-partition
    bottom-k, k-row merge, never a full sort.  The sketch is the
    standard mergeable summary: bottom-k of a union == bottom-k of the
    concatenated sketches, so shard-level sketches combine without
    touching the shards again (pytest-pinned)."""
    h = portable_base_hash(F.col(value_col).cast("string"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = KMV_OVERLAP_K,
) -> DataFrame:
    """Corpus-overlap estimation WITHOUT a corpus-by-corpus join: the
    theta-sketch recipe over two bottom-k sketches.

    The k smallest hashes of A ∪ B are a subset of sketch(A) ∪
    sketch(B) (any union-bottom-k member is bottom-k in its own
    corpus), so the union sketch — and the exact membership of each of
    its values in A and in B — is computable from the two k-row
    sketches alone.  Estimators (Beyer et al. 2007 / theta-sketch
    folklore):

      est(|X|)    = m_x              if m_x < k  (sketch IS the set)
                  = (k-1)·D / θ_x    otherwise  (θ = k-th smallest, D = 2^60)
      est(|A∩B|)  = (c / u) · est(|A∪B|)   with c = union-sketch values
                                            in BOTH, u = union-sketch size

    All inputs to the float expressions are exact int64 (hash values,
    counts), each derived value is one short chain of IEEE ops, and the
    output is floor-rounded at 1e-6 — bit-reproducible in any engine,
    which is what the DuckDB twin (:func:`kmv_overlap_sql`) checks.

    At 100 TB: each corpus is scanned once (map-combined distinct of a
    hash projection), everything after is k-row arithmetic — the
    corpus-vs-benchmark contamination dashboard shape, where an exact
    distinct-join would shuffle both corpora end to end.

    Output: one row — sketch sizes, θs, and the five estimates
    (union, intersection, each corpus, Jaccard, containments).
    """
    sa = kmv_sketch(df_a, value_col, k).withColumn("in_a", F.lit(1))
    sb = kmv_sketch(df_b, value_col, k).withColumn("in_b", F.lit(1))
    merged = (
        sa.join(sb, "h", "full")
        .select(
            "h",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    stats_a = sa.agg(
        F.count("*").alias("m_a"), F.max("h").alias("theta_a")
    )
    stats_b = sb.agg(
        F.count("*").alias("m_b"), F.max("h").alias("theta_b")
    )
    stats_u = merged.agg(
        F.count("*").alias("u"),
        F.max("h").alias("theta_u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("c_inter"),
    )
    row = stats_u.crossJoin(stats_a).crossJoin(stats_b)  # 1x1x1 scalars

    dom = float(1 << 60)
    km1 = float(k - 1)

    def est(m_col: str, theta_col: str):
        return F.when(F.col(m_col) < k, F.col(m_col).cast("double")).otherwise(
            F.lit(km1) * F.lit(dom) / F.col(theta_col).cast("double")
        )

    def r6(col):
        # floor-based 6dp rounding: identical in Spark and DuckDB
        # (round() half-mode conventions differ between engines)
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    est_u = est("u", "theta_u")
    est_a = est("m_a", "theta_a")
    est_b = est("m_b", "theta_b")
    est_i = F.when(F.col("u") == 0, F.lit(0.0)).otherwise(
        F.col("c_inter").cast("double") / F.col("u").cast("double") * est_u
    )

    def ratio(num, den):
        # 0 when the denominator estimate is 0 (empty corpus) — same
        # branch as the SQL twin
        return F.when(den == F.lit(0.0), F.lit(0.0)).otherwise(num / den)

    return row.select(
        F.lit(k).alias("k_used"),
        F.col("m_a"),
        F.col("m_b"),
        F.col("u").alias("union_sketch_size"),
        F.coalesce(F.col("c_inter"), F.lit(0)).alias("inter_in_sketch"),
        r6(est_a).alias("est_a"),
        r6(est_b).alias("est_b"),
        r6(est_u).alias("est_union"),
        r6(est_i).alias("est_intersection"),
        r6(ratio(est_i, est_u)).alias("jaccard_est"),
        r6(ratio(est_i, est_a)).alias("containment_a"),
        r6(ratio(est_i, est_b)).alias("containment_b"),
        # empty-input contract (test_empty_inputs sweep): both corpora
        # empty → no report row, not a row of zeros
    ).filter(F.col("m_a") + F.col("m_b") > 0)


def kmv_overlap_sql(
    select_a: str, select_b: str, value_col: str, k: int = KMV_OVERLAP_K
) -> str:
    """DuckDB twin of :func:`kmv_overlap` — same md5-fold hash, same
    bottom-k, same estimator expressions in the same operation order.
    ``select_a`` / ``select_b`` are FROM-able subqueries or tables."""
    fold = portable_base_hash_sql(
        f"substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)"
    )
    dom = float(1 << 60)
    km1 = float(k - 1)

    def est(m: str, theta: str) -> str:
        return (
            f"CASE WHEN {m} < {k} THEN CAST({m} AS DOUBLE) "
            f"ELSE {km1!r} * {dom!r} / CAST({theta} AS DOUBLE) END"
        )

    def r6(x: str) -> str:
        return f"floor(({x}) * 1e6 + 0.5) / 1e6"

    e_u = est("u", "theta_u")
    e_a = est("m_a", "theta_a")
    e_b = est("m_b", "theta_b")
    e_i = (
        f"CASE WHEN u = 0 THEN 0.0 "
        f"ELSE CAST(c_inter AS DOUBLE) / CAST(u AS DOUBLE) * ({e_u}) END"
    )

    def ratio(num: str, den: str) -> str:
        return f"CASE WHEN ({den}) = 0.0 THEN 0.0 ELSE ({num}) / ({den}) END"

    return f"""
    WITH sa AS (
      SELECT DISTINCT ({fold}) AS h FROM ({select_a})
      WHERE {value_col} IS NOT NULL ORDER BY h LIMIT {k}
    ),
    sb AS (
      SELECT DISTINCT ({fold}) AS h FROM ({select_b})
      WHERE {value_col} IS NOT NULL ORDER BY h LIMIT {k}
    ),
    merged AS (
      SELECT coalesce(sa.h, sb.h) AS h,
             CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
      FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
      ORDER BY h LIMIT {k}
    ),
    stats AS (
      SELECT (SELECT count(*) FROM merged) AS u,
             (SELECT max(h) FROM merged) AS theta_u,
             (SELECT sum(in_a * in_b) FROM merged) AS c_inter,
             (SELECT count(*) FROM sa) AS m_a,
             (SELECT max(h) FROM sa) AS theta_a,
             (SELECT count(*) FROM sb) AS m_b,
             (SELECT max(h) FROM sb) AS theta_b
    )
    SELECT {k} AS k_used, m_a, m_b,
           u AS union_sketch_size,
           CAST(coalesce(c_inter, 0) AS BIGINT) AS inter_in_sketch,
           {r6(e_a)} AS est_a, {r6(e_b)} AS est_b,
           {r6(e_u)} AS est_union, {r6(e_i)} AS est_intersection,
           {r6(ratio(e_i, e_u))} AS jaccard_est,
           {r6(ratio(e_i, e_a))} AS containment_a,
           {r6(ratio(e_i, e_b))} AS containment_b
    FROM stats
    WHERE m_a + m_b > 0
    """
