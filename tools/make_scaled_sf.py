"""Derive a larger benchmark dataset from the driver-generated testdata.

Usage: python tools/make_scaled_sf.py [REP] [SRC_DIR] [OUT_DIR]
       (defaults: 10 /root/testdata/sf0.1 /tmp/testdata_sf1/sf1)

The driver ships sf0.001/0.01/0.1 only; the scaling rehearsal the
"survives 100×" claim needs runs bench.py on a 10× replica of sf0.1
(~6 M lineitem — TPC-H sf1 scale).  Replication is key-offset based so
join cardinality *structure* is preserved (each replica is a disjoint
key universe; fixed dims region/nation stay fixed, exactly like TPC-H
scaling), and the corpus tables are decorrelated across replicas so
the similarity workload scales linearly instead of drowning in
artificial cross-replica duplicates:

- documents: every token in replica i>0 is prefixed ``r{i}`` — all
  shingles/tokens change, so minhash/simhash/Jaccard/winnowing find no
  cross-replica pairs, while intra-replica near-dup structure is an
  exact copy of sf0.1's.
- embeddings: replica i flips the sign of dimension j when bit
  ``j mod 4`` of i is set — norms and intra-replica geometry are
  preserved; cross-replica cosine of corresponding vectors is <= 0.5,
  far below every near-dup threshold in the catalog.
- events keep their timestamps (same window, 10x the traffic and 10x
  the users) so event-time window counts scale in rows, not in windows.

Timestamps are written as parquet TIMESTAMP_NTZ micros like the round-3+
driver data; ``load_table`` normalizes on read either way.

Layout matters: the driver ships each table as a single parquet FILE
named ``{table}.parquet`` (not a directory), and engine paths depend on
that (the streaming queries tail the sf dir with
``pathGlobFilter=events.parquet``, which matches no files if events is a
directory of part files — found the hard way when the first sf1 run's
streaming queries processed zero rows).  So each scaled table is written
via a staging dir and the single part file is renamed into place, with
16 MiB row groups so the file stays splittable under a lowered
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from dystonse_gtfs_data_spark.session import build_session

OFF = 10_000_000  # > every base key in sf0.1; replica i adds i * OFF

# table -> key columns to offset per replica
_SCALED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, keys: list[str], rep: int) -> DataFrame:
    """Union of ``rep`` key-shifted copies via one explode (no driver loop
    over unions — a single Generate keeps the plan linear)."""
    out = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("_rep"), "*"
    )
    for k in keys:
        out = out.withColumn(k, (F.col(k) + F.col("_rep") * OFF).cast("long"))
    return out


def _decorrelate(table: str, df: DataFrame) -> DataFrame:
    if table == "documents":
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(
                    F.lit("r"), F.col("_rep").cast("string"), w
                ),
            ),
            " ",
        )
        return df.withColumn(
            "text", F.when(F.col("_rep") == 0, F.col("text")).otherwise(tagged)
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        def _flip(x, j):
            # bit (j mod 4) of the replica id, arithmetically (shiftright
            # only takes literal shift amounts)
            bit = (
                F.floor(
                    F.col("_rep")
                    / F.pow(F.lit(2.0), (j % F.lit(4)).cast("double"))
                ).cast("long")
                % 2
            )
            return x * (1 - 2 * bit).cast("float")

        return df.withColumn("embedding", F.transform(F.col("embedding"), _flip))
    return df


def _write_single_file(df, out: str, table: str) -> None:
    """Write as ONE parquet file named {table}.parquet (driver layout:
    single file, not a directory) via a staging dir + rename."""
    import glob
    import shutil

    stage = f"{out}/.stage_{table}"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", str(16 * 1024 * 1024))
        .parquet(stage)
    )
    part = glob.glob(f"{stage}/part-*.parquet")
    assert len(part) == 1, part
    dest = f"{out}/{table}.parquet"
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.replace(part[0], dest)
    shutil.rmtree(stage)


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata_sf1/sf1"
    spark = build_session("make_scaled_sf")
    os.makedirs(out, exist_ok=True)

    for table in ("region", "nation"):  # fixed dims, like TPC-H
        _write_single_file(
            spark.read.parquet(f"{src}/{table}.parquet"), out, table
        )

    for table, keys in _SCALED.items():
        df = _replicate(spark.read.parquet(f"{src}/{table}.parquet"), keys, rep)
        df = _decorrelate(table, df).drop("_rep")
        _write_single_file(df, out, table)
        print(f"{table}: x{rep} -> {out}/{table}.parquet")


if __name__ == "__main__":
    main()
