"""JSONL corpus source — the interchange format most raw text corpora
arrive in (one JSON object per line, optionally gzipped; Spark's json
reader handles .gz transparently).

Reading is schema-EXPLICIT (never inferSchema over 100 TB — that is a
full extra pass) with malformed lines quarantined into a corrupt-record
column instead of failing the job — at crawl scale some lines are
always broken, and dropping them silently is how corpora lose data
unnoticed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """documents-shaped JSONL with quarantine: rows where ``_corrupt``
    is non-null carry the raw broken line and NULL fields — filter or
    route them to a dead-letter sink, but never lose them silently."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Stage a documents table as JSONL (one object per line)."""
    docs.write.mode("overwrite").json(path)


def jsonl_quarantine_split(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined).  Quarantined rows carry the raw line plus
    the best-effort doc_id (NULL when the line parsed not at all) — the
    extra parsed column is also what keeps Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction satisfied without
    caching the raw scan.

    Caveat: ``bad.count()`` still trips the restriction (column pruning
    reduces the scan to the corrupt column alone) — materialize with
    ``collect()``/a write, or cache first, when a count is needed."""
    clean = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        "doc_id", F.col("_corrupt").alias("raw_line")
    )
    return clean, bad
