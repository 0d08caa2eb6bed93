"""Model-based document scoring — the batch shape for running a quality
classifier / reward model / LLM judge over a 100 TB corpus.

The scoring kernel is pluggable (the multimodal decode seam applied to
text models): Arrow batches of documents in, one float score per
document out.  The Arrow batch IS the inference micro-batch — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` to the model's
GPU/CPU sweet spot and nothing else in the plan changes.

The default kernel is a deterministic linear-plus-rational-squash model
over simple text features, chosen so arithmetic is IEEE-exact (only
+ − × ÷ |·|, no exp/tanh whose libm bits differ across engines) and an
independent SQL twin recomputes every score bit-for-bit — the oracle
story for the PLUMBING, which is what this operator is about.  Swap in
fastText / a transformer via ``kernel=`` in production.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: fixed public weights of the fake model: (bias, w_chars, w_tokens,
#: w_avg_token_len).  Feature scales keep |z| ~ O(1).
FAKE_MODEL_W = (-1.0, 0.002, 0.01, 0.125)


def fake_quality_model(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in classifier: z = w·(features), squashed with
    the rational sigmoid z/(1+|z|) (exactly reproducible in SQL — no
    transcendental functions).  Features mirror the engine's JVM/SQL
    token-count semantics (split on trimmed ``\\s+``)."""
    s = texts.fillna("")
    n_chars = s.str.len().astype("float64")
    n_tokens = (
        s.str.strip().str.split(r"\s+", regex=True).map(len).astype("float64")
    )
    avg_len = n_chars / n_tokens
    b, w1, w2, w3 = FAKE_MODEL_W
    z = b + w1 * n_chars + w2 * n_tokens + w3 * avg_len
    return z / (1.0 + z.abs())


def score_documents(
    docs: DataFrame,
    kernel: Callable[[pd.Series], pd.Series] = fake_quality_model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, model_score) per document via Arrow-batched mapInPandas —
    map-only, no shuffle; the corpus streams through the model at
    whatever parallelism the scan provides."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "model_score": kernel(pdf[text_col]).astype("float64"),
                }
            )

    return docs.mapInPandas(run, f"{id_col} long, model_score double")


def fake_quality_model_sql(text: str) -> str:
    """DuckDB twin of :func:`fake_quality_model` (same operation order)."""
    b, w1, w2, w3 = FAKE_MODEL_W
    n_chars = f"CAST(length({text}) AS DOUBLE)"
    n_tokens = f"CAST(len(string_split_regex(trim({text}), '\\s+')) AS DOUBLE)"
    z = f"({b!r} + {w1!r} * {n_chars} + {w2!r} * {n_tokens} + {w3!r} * ({n_chars} / {n_tokens}))"
    return f"({z} / (1.0 + abs({z})))"
