"""Data-selection operators for training-corpus curation: the Gopher
quality-rule set and DSIR hashed-n-gram importance resampling.

Both are *selection* stages in the sense of a pretraining pipeline: they
decide which raw documents enter the training mix, complementing the
dedup/ (remove copies) and sampling/ (control proportions) stages.

- :func:`gopher_quality_rules` — the document-level heuristic rule set
  of Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1), as pure JVM
  column expressions: word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, bullet/ellipsis line ratios, alphabetic-word
  ratio, distinct-stopword requirement.  One row per document with every
  signal, every per-rule verdict, and the conjunction — so a pipeline
  can both filter and *audit* (which rule fired, corpus-wide, per
  source).  Map-only: at 100 TB this is a single scan with no shuffle.

- :func:`dsir_logweights` — Data Selection with Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): bag-of-hashed-n-grams importance
  weights log(p_target(x)/p_raw(x)) under add-one-smoothed multinomial
  bucket models, plus deterministic Gumbel-top-k resampling.  The bucket
  models are two tiny aggregations (B rows each, B=1024 by default) that
  broadcast; scoring is one explode + groupBy per document — shuffle
  volume O(docs × distinct buckets per doc), never O(docs × vocab).

Cross-engine parity: every float enters an aggregation as a
DECIMAL(18,6)-rounded term (summation-order-proof), and the feature hash
is the repo's portable md5 fold (operators/dedup.py:33) so a DuckDB twin
recomputes identical buckets.  Reference analog: the reference has no
corpus-selection stage (it is a GTFS engine); these cover the
training-data half of the brief.  Constants are shared between the Spark
expressions and the SQL twins below so the oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, portable_base_hash, portable_base_hash_sql

# ---------------------------------------------------------------------------
# Gopher quality rules (arXiv:2112.11446 §A1.1).  Canonical thresholds;
# every one is a keyword so a corpus with different length statistics can
# re-tune without forking the rule logic.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2

_BULLET_PREFIXES = ("-", "*", "•")  # -, *, •


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via length arithmetic — identical semantics in
    every SQL engine (no regex dialect in play)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(
        needle
    )


def _occurrences_sql(text: str, needle: str) -> str:
    lit = needle.replace("'", "''")
    return f"(length({text}) - length(replace({text}, '{lit}', ''))) / {len(needle)}"


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_RATIO,
    max_bullet_ratio: float = GOPHER_MAX_BULLET_RATIO,
    max_ellipsis_ratio: float = GOPHER_MAX_ELLIPSIS_RATIO,
    min_alpha_ratio: float = GOPHER_MIN_ALPHA_RATIO,
    min_stopwords: int = GOPHER_MIN_STOPWORDS,
) -> DataFrame:
    """Append Gopher rule signals + verdicts to ``df`` (map-only).

    Output columns (beyond the input's): ``n_words mean_word_len
    symbol_ratio bullet_ratio ellipsis_ratio alpha_ratio n_stopwords``
    (signals, ratios rounded to 6), ``r_word_count r_mean_word_len
    r_symbol r_bullet r_ellipsis r_alpha r_stopwords`` (per-rule
    booleans) and ``passes_gopher`` (the conjunction).
    """
    text = F.col(text_col)
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    lines = F.split(text, "\n")
    n_words = F.size(toks)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    hash_count = _occurrences(text, "#")
    ellipsis_count = _occurrences(text, "...")
    symbol_ratio = F.round(
        (hash_count + ellipsis_count) / F.greatest(n_words, F.lit(1)), 6
    )
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin(list(_BULLET_PREFIXES)),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    )
    bullet_ratio = F.round(bullet_lines / n_lines, 6)
    ellipsis_ratio = F.round(ellipsis_lines / n_lines, 6)
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = F.round(alpha_words / F.greatest(n_words, F.lit(1)), 6)
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )

    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("bullet_ratio", bullet_ratio)
        .withColumn("ellipsis_ratio", ellipsis_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("n_stopwords", n_stop)
        .withColumn(
            "r_word_count",
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        )
        .withColumn(
            "r_mean_word_len",
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len),
        )
        .withColumn("r_symbol", F.col("symbol_ratio") <= max_symbol_ratio)
        .withColumn("r_bullet", F.col("bullet_ratio") <= max_bullet_ratio)
        .withColumn("r_ellipsis", F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        .withColumn("r_alpha", F.col("alpha_ratio") >= min_alpha_ratio)
        .withColumn("r_stopwords", F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn(
        "passes_gopher",
        F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_symbol")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stopwords"),
    )


def gopher_quality_rules_sql(
    table: str = "documents",
    text: str = "text",
    id_cols: str = "doc_id",
    *,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_RATIO,
    max_bullet_ratio: float = GOPHER_MAX_BULLET_RATIO,
    max_ellipsis_ratio: float = GOPHER_MAX_ELLIPSIS_RATIO,
    min_alpha_ratio: float = GOPHER_MIN_ALPHA_RATIO,
    min_stopwords: int = GOPHER_MIN_STOPWORDS,
) -> str:
    """DuckDB twin of :func:`gopher_quality_rules` (same defaults; the
    thresholds are keywords on BOTH sides so a re-tuned rule set keeps
    its oracle)."""
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    bullets = ", ".join(f"'{b}'" for b in _BULLET_PREFIXES)
    return f"""
    WITH base AS (
      SELECT {id_cols},
             regexp_split_to_array(lower(trim({text})), '\\s+') AS toks,
             string_split({text}, chr(10)) AS lines,
             {text} AS _t
      FROM {table}
    ),
    sig AS (
      SELECT {id_cols},
             len(toks) AS n_words,
             greatest(len(lines), 1) AS n_lines,
             round(list_sum(list_transform(toks, t -> length(t)))
                   / greatest(len(toks), 1), 6) AS mean_word_len,
             round(({_occurrences_sql('_t', '#')}
                    + {_occurrences_sql('_t', '...')})
                   / greatest(len(toks), 1), 6) AS symbol_ratio,
             round(len(list_filter(lines,
                       ln -> list_contains([{bullets}], substr(ltrim(ln), 1, 1))))
                   * 1.0 / greatest(len(lines), 1), 6) AS bullet_ratio,
             round(len(list_filter(lines, ln -> rtrim(ln) LIKE '%...'))
                   * 1.0 / greatest(len(lines), 1), 6) AS ellipsis_ratio,
             round(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                   * 1.0 / greatest(len(toks), 1), 6) AS alpha_ratio,
             len(list_intersect(toks, [{stop_list}])) AS n_stopwords
      FROM base
    )
    SELECT {id_cols}, n_words, mean_word_len, symbol_ratio, bullet_ratio,
           ellipsis_ratio, alpha_ratio, n_stopwords,
           (n_words BETWEEN {min_words} AND {max_words})
             AS r_word_count,
           (mean_word_len BETWEEN {min_mean_word_len}
             AND {max_mean_word_len}) AS r_mean_word_len,
           (symbol_ratio <= {max_symbol_ratio}) AS r_symbol,
           (bullet_ratio <= {max_bullet_ratio}) AS r_bullet,
           (ellipsis_ratio <= {max_ellipsis_ratio}) AS r_ellipsis,
           (alpha_ratio >= {min_alpha_ratio}) AS r_alpha,
           (n_stopwords >= {min_stopwords}) AS r_stopwords,
           ((n_words BETWEEN {min_words} AND {max_words})
            AND (mean_word_len BETWEEN {min_mean_word_len}
                 AND {max_mean_word_len})
            AND symbol_ratio <= {max_symbol_ratio}
            AND bullet_ratio <= {max_bullet_ratio}
            AND ellipsis_ratio <= {max_ellipsis_ratio}
            AND alpha_ratio >= {min_alpha_ratio}
            AND n_stopwords >= {min_stopwords}) AS passes_gopher
    FROM sig
    """


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (arXiv:2302.03169).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_GUMBEL_RES = 1 << 20  # hash→uniform resolution for the Gumbel race


def _hashed_ngram_buckets(text: Column, num_buckets: int) -> Column:
    """Array of feature buckets: hashed unigrams + bigrams of the
    lowercase whitespace tokens (the paper's bag of hashed n-grams,
    §2.2).  Bigrams are joined with a single space before hashing so the
    SQL twin reproduces the exact byte string."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    unis = toks
    bis = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.transform(
        F.concat(unis, bis),
        lambda g: F.pmod(portable_base_hash(g), F.lit(num_buckets)),
    )


def dsir_logweights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    *,
    num_buckets: int = DSIR_BUCKETS,
    top_k: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weights, optionally with the
    paper's Gumbel-top-k resampling verdict.

    ``is_target`` marks the in-domain sample (e.g. curated wiki rows);
    BOTH bucket models (target and raw) are trained from ``df`` in one
    pass — two aggregations over the exploded features, each producing
    ``num_buckets`` rows that broadcast back onto the scoring join.

    log w(x) = Σ_b c_b(x) · (ln p̂_target(b) − ln p̂_raw(b)), add-one
    smoothed.  Per-term DECIMAL(18,6) rounding keeps the sum exact under
    any partitioning (the repo's float-parity convention).

    With ``top_k`` set, appends ``gumbel_key`` = round(log_w − ln(−ln u), 6)
    with u ∈ (0,1) derived from the portable hash of the id — the
    Gumbel-max race that makes the selection a weighted sample *without
    replacement* (deterministic across engines AND retries, unlike
    ``rand()``), and ``selected`` marking the k winners.

    Scale: explode is O(tokens); both models are B-row broadcasts; the
    final groupBy shuffles one row per (doc, distinct bucket).  No
    driver collection at any size.
    """
    from ..sources.tables import maybe_broadcast

    spread = _spread(df)
    feats = spread.select(
        F.col(id_col),
        is_target.alias("_is_target"),
        F.explode_outer(
            _hashed_ngram_buckets(F.col(text_col), num_buckets)
        ).alias("bucket"),
    ).where(F.col("bucket").isNotNull())
    per_bucket = feats.groupBy("bucket").agg(
        F.count(F.when(F.col("_is_target"), 1)).alias("c_t"),
        F.count(F.when(~F.col("_is_target"), 1)).alias("c_r"),
    )
    totals = per_bucket.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    model = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + float(num_buckets)))
            - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + float(num_buckets))),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    doc_feats = feats.where(~F.col("_is_target")).groupBy(
        F.col(id_col), "bucket"
    ).agg(F.count("*").alias("c"))
    scored = (
        doc_feats.join(maybe_broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_features"),
            F.sum(F.col("c") * F.col("lr")).cast("double").alias("log_weight"),
        )
    )
    if top_k is None:
        return scored
    u = (
        F.pmod(portable_base_hash(F.col(id_col).cast("string")), F.lit(DSIR_GUMBEL_RES))
        + 0.5
    ) / float(DSIR_GUMBEL_RES)
    keyed = scored.withColumn(
        "gumbel_key", F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    )
    # global top-k WITHOUT a single-partition window: orderBy+limit
    # compiles to TakeOrderedAndProject (per-partition heaps + driver
    # merge of k rows), and the k winners broadcast back as a flag join
    winners = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(top_k)
        .select(F.col(id_col).alias("_winner"))
    )
    return (
        keyed.join(
            F.broadcast(winners),
            keyed[id_col] == F.col("_winner"),
            "left",
        )
        .withColumn("selected", F.col("_winner").isNotNull())
        .drop("_winner")
    )


def dsir_logweights_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    target_pred: str = "source IN ('src0', 'src1', 'src2', 'src3')",
    *,
    num_buckets: int = DSIR_BUCKETS,
    top_k: int | None = None,
) -> str:
    """DuckDB twin of :func:`dsir_logweights` (same hash, same constants)."""
    fold_g = portable_base_hash_sql("substr(md5(g), 1, 15)")
    bucket = f"((({fold_g}) % {num_buckets}) + {num_buckets}) % {num_buckets}"
    base = f"""
    WITH tokd AS (
      SELECT {id_col}, ({target_pred}) AS is_t,
             regexp_split_to_array(lower(trim({text})), '\\s+') AS toks
      FROM {table}
    ),
    grams AS (
      SELECT {id_col}, is_t, g
      FROM tokd, unnest(list_concat(
        toks,
        CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END)) AS t(g)
    ),
    feats AS (
      SELECT {id_col}, is_t, {bucket} AS bucket
      FROM grams
    ),
    per_bucket AS (
      SELECT bucket,
             count(*) FILTER (WHERE is_t) AS c_t,
             count(*) FILTER (WHERE NOT is_t) AS c_r
      FROM feats GROUP BY 1
    ),
    model AS (
      SELECT bucket,
             CAST(round(ln((c_t + 1.0) / ((SELECT sum(c_t) FROM per_bucket)
                                          + {num_buckets}.0))
                        - ln((c_r + 1.0) / ((SELECT sum(c_r) FROM per_bucket)
                                            + {num_buckets}.0)), 6)
                  AS DECIMAL(18,6)) AS lr
      FROM per_bucket
    ),
    doc_feats AS (
      SELECT {id_col}, bucket, count(*) AS c
      FROM feats WHERE NOT is_t GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.{id_col}, CAST(sum(d.c) AS BIGINT) AS n_features,
             CAST(sum(d.c * m.lr) AS DOUBLE) AS log_weight
      FROM doc_feats d JOIN model m USING (bucket)
      GROUP BY 1
    )
    """
    if top_k is None:
        return base + f"SELECT {id_col}, n_features, log_weight FROM scored"
    u = (
        f"((({portable_base_hash_sql(f'substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)')}"
        f" % {DSIR_GUMBEL_RES}) + {DSIR_GUMBEL_RES}) % {DSIR_GUMBEL_RES} + 0.5)"
        f" / {DSIR_GUMBEL_RES}.0"
    )
    return base + f""",
    keyed AS (
      SELECT {id_col}, n_features, log_weight,
             round(log_weight - ln(-ln({u})), 6) AS gumbel_key
      FROM scored
    )
    SELECT {id_col}, n_features, log_weight, gumbel_key,
           (row_number() OVER (ORDER BY gumbel_key DESC, {id_col})
            <= {top_k}) AS selected
    FROM keyed
    """
