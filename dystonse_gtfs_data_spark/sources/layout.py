"""Multi-dimensional file layout: Z-order clustering for write paths.

At 100 TB, data-skipping (parquet row-group / file min-max pruning)
only works along the sort key; queries that filter on a SECOND column
scan everything.  Z-ordering (bit-interleaving the scaled dimensions
into one clustering key, then range-partitioning + sorting the write
by it) makes file min-max ranges tight in EVERY interleaved dimension
at once — the standard lakehouse answer (Delta/Iceberg OPTIMIZE
ZORDER).  The reference is a single-node engine with no file-layout
story; this module exists for the 100 TB deployment path.

Everything is integer JVM expressions (shift/and/sum — whole-stage
codegen, no UDF), deterministic, and reproducible in any SQL engine
with bit ops, so the key derivation is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  #: default bits per dimension (256 cells/dim)


def scale_to_bits(col: Column, min_col: Column, max_col: Column, bits: int = ZORDER_BITS) -> Column:
    """Min-max scale a numeric column into [0, 2^bits): floor of the
    proportional position, clamped; a constant column maps to 0."""
    span = max_col - min_col
    cells = 1 << bits
    raw = F.floor((col - min_col) / span * cells).cast("bigint")
    return F.when(span > 0, F.least(raw, F.lit(cells - 1))).otherwise(F.lit(0))


def interleave_bits(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Bit-interleave pre-scaled ints (each in [0, 2^bits)) into one
    Z-order key: bit i of column j lands at position i·ncols + j.
    Disjoint bit positions mean plain + is exact (same as OR) and
    portable to engines without bitwise OR on bigints."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("bigint")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def interleave_bits_sql(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`interleave_bits` (same bit positions)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    key_name: str = "zkey",
) -> DataFrame:
    """Append the Z-order key over ``cols``.  Bounds come from one
    map-side-combined global aggregate broadcast back onto the scan —
    the only extra pass; the key itself is pure codegen arithmetic."""
    bounds = df.agg(
        *[F.min(c).alias(f"_zmin_{c}") for c in cols],
        *[F.max(c).alias(f"_zmax_{c}") for c in cols],
    )
    joined = df.join(F.broadcast(bounds))
    scaled = [
        scale_to_bits(
            F.col(c), F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}"), bits
        )
        for c in cols
    ]
    return joined.withColumn(key_name, interleave_bits(scaled, bits)).drop(
        *[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 32,
    bits: int = ZORDER_BITS,
) -> None:
    """OPTIMIZE-ZORDER-shaped write: range-partition by the Z key (one
    skew-aware shuffle — repartitionByRange samples the key
    distribution, so hot cells don't produce giant files) and sort
    within each file, then drop the key.  Every interleaved dimension
    gets tight per-file min-max ranges for scan pruning."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def skipping_stats(
    df: DataFrame,
    order_key: Column,
    stat_col: str,
    lo: Column,
    hi: Column,
    file_buckets: int = 64,
    layout_name: str = "layout",
) -> DataFrame:
    """Data-skipping effectiveness of a file layout, measured: bucket
    rows into ``file_buckets`` synthetic "files" by equal-width ranges
    of ``order_key`` (the write order a clustered layout would produce),
    compute each file's min/max footer stats for ``stat_col``, and count
    how many files a ``stat_col BETWEEN lo AND hi`` scan must open.

    This is the number the lakehouse OPTIMIZE ZORDER decision needs —
    measured, not guessed: run it once with the Z-order key and once
    with the natural key and compare ``files_hit``.  All arithmetic is
    exact integer (equal-width bucketing from one global min/max agg),
    so an independent SQL twin reproduces file membership exactly.

    Output: one row — (layout, n_files, files_hit, rows_in_hit_files).
    """
    kb = df.select(
        order_key.cast("bigint").alias("_k"),
        F.col(stat_col).alias("_s"),
        lo.alias("_lo"),
        hi.alias("_hi"),
    )
    bounds = kb.agg(F.min("_k").alias("_kmin"), F.max("_k").alias("_kmax"))
    width = (
        F.floor((F.col("_kmax") - F.col("_kmin")) / F.lit(file_buckets)) + 1
    )
    files = (
        kb.join(F.broadcast(bounds))
        .withColumn("_file", F.floor((F.col("_k") - F.col("_kmin")) / width))
        .groupBy("_file")
        .agg(
            F.min("_s").alias("_smin"),
            F.max("_s").alias("_smax"),
            F.count("*").alias("_rows"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
        )
    )
    hit = (F.col("_smin") <= F.col("_hi")) & (F.col("_smax") >= F.col("_lo"))
    # groupBy on the literal (not a global agg) so an empty input yields
    # zero rows instead of a single all-null report row
    return files.groupBy(F.lit(layout_name).alias("layout")).agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("files_hit"),
        F.sum(F.when(hit, F.col("_rows")).otherwise(0)).alias("rows_in_hit_files"),
    )


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> dict:
    """OPTIMIZE-style small-file compaction for a parquet directory —
    the lakehouse maintenance pass every streaming/upsert sink needs:
    micro-batch appends and per-key merges leave thousands of KB-sized
    files whose per-file open cost (footer read, task schedule) comes to
    dominate scans long before data volume does.

    Bin count = ceil(on-disk bytes / ``target_file_bytes``), so output
    files land near the target regardless of input fragmentation.  With
    ``sort_within``, rows are range-partitioned and sorted by those
    columns (repartitionByRange samples the key distribution — hot keys
    don't produce giant files) so the compacted files ALSO carry tight
    min-max footer stats for data skipping; without it a plain
    round-robin repartition spreads rows evenly.

    The rewrite goes to a ``.compacting`` staging dir first and swaps in
    via two directory renames.  Crash safety: a crash between the two
    renames leaves the table in ``.old`` and ``path`` missing — the next
    call restores it automatically before compacting (the
    _merge_into_records recovery pattern).  The two renames are NOT one
    atomic operation for concurrent READERS: a reader that lists the
    directory in the microseconds between them sees it missing, so
    pause/serialize compaction against live readers (a real lakehouse
    sink would use a transaction-log commit instead of renames).

    Returns {files_before, files_after, bytes, rows} — ``rows`` is
    counted from the STAGED copy before the swap, so a short write
    surfaces as a hard error here, not as silent data loss later.
    """
    import math
    import os
    import shutil

    def _data_files(d: str) -> list[str]:
        return [
            os.path.join(r, n)
            for r, _dirs, names in os.walk(d)
            for n in names
            if n.endswith(".parquet")
        ]

    staging, old = path + ".compacting", path + ".old"
    # crash recovery FIRST: a crash between the two swap renames leaves
    # the only copy in '.old' — restore before the cleanup below
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)

    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    in_rows = df.count()

    shutil.rmtree(staging, ignore_errors=True)  # crashed prior run
    shutil.rmtree(old, ignore_errors=True)
    if sort_within:
        shaped = df.repartitionByRange(n_files, *sort_within).sortWithinPartitions(
            *sort_within
        )
    else:
        shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(staging)
    out_rows = spark.read.parquet(staging).count()
    if out_rows != in_rows:  # never swap in a short write
        raise RuntimeError(
            f"compaction row mismatch: {in_rows} in, {out_rows} staged"
        )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total,
        "rows": out_rows,
    }
