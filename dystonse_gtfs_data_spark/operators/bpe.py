"""Distributed BPE merge-rule training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the tokenizer-
training primitive of an LLM data pipeline, shaped for 100 TB.

The scale insight is classic BPE's own: merges operate on the WORD
FREQUENCY table, not the corpus.  One corpus pass builds
``word → count`` (hash groupBy, map-side combine); every merge round
then runs over that vocabulary-sized table — pair counting is an
explode + groupBy whose shuffle carries at most |distinct pairs| rows,
the argmax is a TakeOrdered of one row, and the chosen rule applies as
a pure JVM ``aggregate()`` fold over each word's symbol array.  A
100 TB corpus with a 10M-word vocabulary trains R merge rounds in
1 corpus pass + R cheap vocab passes.

Determinism: ties on pair frequency break lexicographically on
(lhs, rhs) — binary UTF8 comparison on both engines — and the merge
replaces non-overlapping occurrences left-to-right, exactly the
replica's fold in sources/demo_oracle_pipeline.expected_bpe_merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import tracked_persist


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus pass: whitespace words, lowercased."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _adjacent_pairs(sym):
    """All adjacent (lhs, rhs) symbol pairs of one word (empty for
    single-symbol words — sequence(1, 0) would count DOWN in Spark)."""
    idx = F.when(F.size(sym) >= 2, F.sequence(F.lit(1), F.size(sym) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(sym, i).alias("lhs"),
            F.element_at(sym, i + 1).alias("rhs"),
        ),
    )


def merge_pair_expr(sym, a: str, b: str):
    """Replace non-overlapping left-to-right (a, b) → a||b inside a
    symbol array, as one JVM ``aggregate`` fold.  State carries the
    previous unmerged symbol (``pend``): a hit flushes the merged token
    and clears it, a miss flushes ``pend`` and holds the current one."""
    empty = F.array().cast("array<string>")
    init = F.struct(
        empty.alias("out"), F.lit(None).cast("string").alias("pend")
    )

    def step(acc, x):
        hit = acc["pend"].eqNullSafe(F.lit(a)) & x.eqNullSafe(F.lit(b))
        flushed = F.when(acc["pend"].isNull(), empty).otherwise(
            F.array(acc["pend"])
        )
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(a + b))))
            .otherwise(F.concat(acc["out"], flushed))
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("pend"),
        )

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(sym, init, step, fin)


def bpe_train_rules(
    wc: DataFrame, rounds: int = 6
) -> list[tuple[int, str, str, int]]:
    """R merge rounds over a word-count table → the ordered merge-rule
    list [(round, lhs, rhs, freq)].  Each round: pair count (bounded
    shuffle), 1-row TakeOrdered argmax to the driver, rule applied as a
    fold expression.  The vocab table is persisted once; per-round
    lineage adds one projection (R is small — tokenizers use explicit
    round counts, not convergence)."""
    base = wc.select(F.split("word", "").alias("sym"), "n").persist()
    base.count()  # materialize once; every round re-folds from here
    df = base
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top = (
            df.select("n", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("n").alias("freq"))
            .orderBy(F.desc("freq"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["lhs"], top[0]["rhs"], int(top[0]["freq"])
        rules.append((r, a, b, freq))
        df = df.select(merge_pair_expr(F.col("sym"), a, b).alias("sym"), "n")
    base.unpersist()
    return rules


def bpe_train(
    spark: SparkSession, wc: DataFrame, rounds: int = 6
) -> DataFrame:
    """Merge-rule table (round, lhs, rhs, freq) — see
    :func:`bpe_train_rules`."""
    return spark.createDataFrame(
        bpe_train_rules(wc, rounds),
        "round int, lhs string, rhs string, freq bigint",
    )


def bpe_apply(
    wc: DataFrame, rules: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Tokenize the word table with an ordered rule list: R chained
    fold projections (map-only — the rules are literals, nothing
    shuffles until the consumer aggregates).  The result is persisted
    and materialized before returning: the nested R-fold expression
    compiles fine as a plain Project (the training rounds run it every
    round), but Catalyst would otherwise collapse it INTO the
    consumer's Generate/explode, and codegen for a generator whose
    child is a deep nested fold stalls janino for ~10 s — the cache
    boundary keeps the fold out of the generator.  Vocab-sized, so the
    cache is cheap; the persist is tracked — harnesses drop it via
    ``cache.release_persisted()`` after the consuming action."""
    df = wc.select(F.split("word", "").alias("sym"), "n")
    for _r, a, b, _f in rules:
        df = df.select(merge_pair_expr(F.col("sym"), a, b).alias("sym"), "n")
    return tracked_persist(df, eager=True)
