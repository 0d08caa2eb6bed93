"""Corpus snapshot diff: the delta between two crawls/exports.

A recurring training-data operation the reference has no analog for:
given snapshot A and snapshot B of a document corpus, classify every id
as added / removed / changed / unchanged.  At scale this is ONE
co-partitioned full-outer join on the id — with both snapshots bucketed
by id (sources/bucketed.py pattern) it runs with zero exchanges; the
content fingerprints are map-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_base_hash, portable_base_hash_sql


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(id, status) for every id present in either snapshot, where
    status ∈ {'added','removed','changed','unchanged'}.  The content
    compare uses the portable md5 fold so any engine (and the DuckDB
    twin) lands on identical fingerprints — never a raw string compare,
    which would ship full documents through the shuffle instead of
    16-byte hashes."""
    a = old.select(
        F.col(id_col).alias("id"),
        portable_base_hash(F.col(content_col)).alias("fp_old"),
    )
    b = new.select(
        F.col(id_col).alias("id"),
        portable_base_hash(F.col(content_col)).alias("fp_new"),
    )
    return a.join(b, "id", "full_outer").select(
        F.col("id").alias(id_col),
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def corpus_diff_sql(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`corpus_diff` over two snapshot subqueries."""
    fold = portable_base_hash_sql(f"substr(md5({content_col}), 1, 15)")
    return f"""
    WITH a AS (SELECT {id_col} AS id, ({fold}) AS fp_old
               FROM ({old_sql})),
         b AS (SELECT {id_col} AS id, ({fold}) AS fp_new
               FROM ({new_sql}))
    SELECT coalesce(a.id, b.id) AS {id_col},
           CASE WHEN a.id IS NULL THEN 'added'
                WHEN b.id IS NULL THEN 'removed'
                WHEN a.fp_old = b.fp_new THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.id = b.id
    """
