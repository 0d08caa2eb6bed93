"""Skew-handling join utilities for the 100 TB path.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins; ``salted_join`` is the explicit fallback for aggregations and
hash joins where one key dominates (e.g. a metropolitan route with
1000× the records of a rural one): the hot side's key is salted into N
subkeys, the dimension side is exploded across all N salts, and the
join runs on (key, salt) — the hot partition becomes N even ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, num_salts: int):
    """Salt expression for one row of ``df``.

    The salt never reaches the output (dims are replicated across ALL
    salts, so any value in [0, N) is semantically free) — its only job
    is to SPREAD.  Hashing the columns alone fails on duplicate-heavy
    hot keys: byte-identical rows share a hash, so a hot key whose
    volume is identical rows still funnels into one task.  Folding in
    ``monotonically_increasing_id`` (partition id ‖ row position —
    distinct per physical row, stable for a deterministic scan, no
    extra shuffle) splits those too."""
    return F.pmod(
        F.xxhash64(*df.columns, F.monotonically_increasing_id()),
        F.lit(num_salts),
    )


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``dims`` on ``key`` with salting: facts get a
    random-but-deterministic salt (hash of all columns plus a per-row
    discriminator, mod N), dims are replicated N ways.  Result columns =
    facts ∪ dims (like a plain join); dims must be the small side."""
    salted_facts = facts.withColumn("__salt", _row_salt(facts, num_salts))
    salted_dims = dims.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_facts.join(salted_dims, [key, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame, key: str, num_salts: int = 16
) -> DataFrame:
    """Two-phase count for a skewed groupBy key: partial count per
    (key, salt), then final sum per key — the map-side-combine pattern
    made explicit for layered aggregations that would otherwise funnel
    a hot key through one reducer."""
    return (
        df.withColumn("__salt", _row_salt(df, num_salts))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("count"))
    )
