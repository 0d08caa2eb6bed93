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
    h = portable_base_hash(F.col(value_col).cast("string"))
    # h // m MUST be integer arithmetic: double division would round
    # above 2^53 and disagree with the SQL twin's exact `//`
    w = F.shiftright(h, HLL_B)
    # bin() is unpadded on both engines, so bitlength(w) is just
    # length(bin(w)) — except w=0, whose bin is the 1-char string "0"
    rho = F.when(w == 0, F.lit(_WBITS)).otherwise(
        F.lit(_WBITS) - F.length(F.bin(w))
    )
    regs = (
        df.select(*group_cols, (h % HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mrho"))
    )
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
