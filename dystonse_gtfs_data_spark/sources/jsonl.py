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
    """(clean, quarantined) from a ``read_documents_jsonl`` frame.

    Caveat: ``bad.count()`` trips Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (column pruning
    reduces the json scan to the corrupt column alone).  Prefer
    ``read_documents_jsonl_split`` — its quarantine frame is built on a
    text scan and is freely countable."""
    clean = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        "doc_id", F.col("_corrupt").alias("raw_line")
    )
    return clean, bad


def read_documents_jsonl_split(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read + split in one go, with a freely countable quarantine frame.

    The file scan is ``spark.read.text`` (gzip still transparent) and
    parsing happens per-row via ``from_json`` with the corrupt column in
    its schema — identical PERMISSIVE semantics to the json reader
    (partial casts quarantine too, not just unparseable lines), but the
    raw line is an ordinary text column, so no plan shape can hit the
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction: ``bad.count()``,
    ``bad.write`` and any projection all just work.  Still one pass,
    still schema-explicit, still fully distributed."""
    # blank/whitespace-only lines are SKIPPED, matching spark.read.json:
    # from_json('') returns an all-null struct with a null _corrupt, so
    # without this filter a blank separator line would land in the CLEAN
    # frame as a phantom all-null document (null doc_id joins downstream)
    parsed = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.col("value").alias("raw_line"),
            F.from_json(
                "value",
                DOCUMENTS_JSONL_SCHEMA,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
            ).alias("j"),
        )
    )
    clean = (
        parsed.filter(F.col("j._corrupt").isNull())
        .select("j.*")
        .drop("_corrupt")
    )
    bad = parsed.filter(F.col("j._corrupt").isNotNull()).select(
        F.col("j.doc_id").alias("doc_id"), "raw_line"
    )
    return clean, bad
