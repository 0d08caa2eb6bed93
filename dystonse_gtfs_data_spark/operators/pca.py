"""Distributed PCA / whitening fit for embedding columns.

An LLM-data pipeline runs PCA over document embeddings constantly —
whitening before ANN indexing (the OPQ preprocessing step), energy-based
dimension truncation before SemDeDup-style clustering, drift dashboards
over corpus snapshots.  At 100 TB the only viable shape is the classic
one-pass sufficient-statistics fit: every partition reduces its rows to
a d x d Gram partial + d-vector sum + count (d = embedding width, so the
state is ~d^2 integers regardless of corpus size), the partials merge
associatively, and the dense eigensolve happens once, driver-side, on a
d x d matrix.  No shuffle ever carries an embedding row; the projection
pass afterwards is a broadcast map.

Exactness contract (what makes the operator oracle-checkable): floats
never accumulate.  Embedding components are quantized to fixed-point
int64 (``floor(x * 2^12 + 0.5)`` — multiplication by a power of two is
exact in IEEE754, and float32 parquet values promote to float64 exactly,
so BOTH engines compute the identical integer), all second-moment sums
are integer arithmetic (int64 inside a kernel batch, DECIMAL(38,0)
across partitions), and the float covariance is derived from those
exact integers by one documented expression.  Summation order therefore
CANNOT change the result — the fit is bit-reproducible across any
partitioning, which is what lets the single-node replica oracle
(sources/demo_oracle_pipeline.expected_embedding_pca) match the
distributed kernel bit for bit.

The 64x64 eigensolve itself is ``numpy.linalg.eigh`` on both sides —
deliberately the SAME call, like the replica's shared ``_hyperplanes``:
the distributed aggregation is what differential testing must cover;
a dense eigensolver re-implementation would only add its own bugs.
Eigenvector sign is pinned by convention (largest-|component| entry
made positive) so the decomposition is unique for distinct eigenvalues.

Reference analog: none — the reference engine (dystonse-gtfs-data) has
no embedding analytics; this belongs to the beyond-reference LLM
pipeline family (SURVEY.md "similarity search" / "embedding" items).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.lits import lit_doubles, lit_int_matrix

#: Fixed-point scale for embedding values.  2^12 keeps the quantization
#: error at 2^-13 per coordinate (far below any PCA use) while bounding
#: |v_q| <= ~2^15 for unit-ish embeddings, so an int64 Gram partial is
#: safe past 2^30 rows per kernel batch.
VALUE_SCALE_BITS = 12
#: Fixed-point scale for eigenvector components (|c| <= 1 after eigh, so
#: 2^18 gives ~5e-6 component resolution; the product scale 2^30 is an
#: exact power-of-two float multiplier).
COMP_SCALE_BITS = 18
_QV = 1 << VALUE_SCALE_BITS
_QC = 1 << COMP_SCALE_BITS
#: Exact float64 scale applied to the integer projection dot product —
#: a power of two, i.e. a pure exponent shift with NO rounding.
PROJ_INV_SCALE = 2.0 ** -(VALUE_SCALE_BITS + COMP_SCALE_BITS)


@dataclass(frozen=True)
class PcaModel:
    """Driver-side PCA fit: exact integer sufficient statistics plus the
    derived (float) eigensystem.  Small by construction (d^2 ints)."""

    n: int  # rows (non-null vectors)
    dim: int
    sums_q: tuple[int, ...]  # exact Σ v_q per dimension
    eigvals: tuple[float, ...]  # descending
    components_q: tuple[tuple[int, ...], ...]  # floor(c * 2^18 + 0.5)
    offsets: tuple[float, ...]  # per-component centering offset (Σ L·c_q)/n
    total_var: float  # trace of the covariance


def _quantize_expr(vec_col):
    """JVM twin of the kernel's quantization: floor(x * 2^12 + 0.5) as
    int64 — float32 → float64 promotion and power-of-two scaling are
    both exact, so this matches numpy/math.floor bit for bit."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * F.lit(float(_QV)) + F.lit(0.5)).cast(
            "long"
        ),
    )


_MOMENT_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("s", T.LongType(), False),
    ]
)


def second_moment_partials(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One row per (batch, upper-triangle cell) of the exact fixed-point
    second-moment matrix, plus linear sums (j = -1) and the row count
    (i = j = -1).  ``mapInPandas`` so Python enters once per ARROW BATCH
    (the multimodal / rolling-winnow kernel precedent) and each batch
    reduces to ~d^2/2 rows — the map-side combine that makes the fit a
    single linear pass with d^2-bounded state per task.

    int64 is safe inside a batch: |v_q| <= 2^15-ish for unit-scale
    embeddings, products < 2^30, and Arrow batches are ~10^4 rows;
    cross-batch summation is DECIMAL(38,0) in :func:`pca_fit`.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            vq = np.floor(m * float(_QV) + 0.5).astype(np.int64)
            gram = vq.T @ vq  # int64 matmul, exact at batch scale
            lin = vq.sum(axis=0, dtype=np.int64)
            d = vq.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu, np.arange(d), [-1]]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [ju, np.full(d, -1), [-1]]
                    ).astype(np.int32),
                    "s": np.concatenate(
                        [gram[iu, ju], lin, [len(vecs)]]
                    ),
                }
            )

    return emb.select(vec_col).mapInPandas(run, _MOMENT_SCHEMA)


def fit_from_moments(
    n: int, sums: list[int], gram: dict[tuple[int, int], int]
) -> PcaModel:
    """Derive the eigensystem from EXACT integer sufficient statistics.
    Shared by the engine (:func:`pca_fit`) and the replica oracle so the
    float covariance is built by one expression:

        C[i][j] = (S_ij * n - L_i * L_j) / (n^2 * 2^24)

    — all-integer numerator/denominator, one correctly-rounded Python
    division per cell, hence bit-identical regardless of which side
    computed the integers."""
    import numpy as np

    d = len(sums)
    denom = n * n * _QV * _QV
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(i, d):
            c = (gram[(i, j)] * n - sums[i] * sums[j]) / denom
            cov[i, j] = c
            cov[j, i] = c
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals, kind="stable")[::-1]
    eigvals = eigvals[order]
    eigvecs = eigvecs[:, order]
    comps_q, offsets = [], []
    for c in range(d):
        v = eigvecs[:, c]
        if v[int(np.argmax(np.abs(v)))] < 0:  # sign convention
            v = -v
        cq = np.floor(v * float(_QC) + 0.5).astype(np.int64)
        comps_q.append(tuple(int(x) for x in cq))
        off_num = sum(li * int(ci) for li, ci in zip(sums, cq))
        offsets.append(off_num / n)
    return PcaModel(
        n=n,
        dim=d,
        sums_q=tuple(sums),
        eigvals=tuple(float(x) for x in eigvals),
        components_q=tuple(comps_q),
        offsets=tuple(offsets),
        total_var=float(np.trace(cov)),
    )


def pca_fit(emb: DataFrame, vec_col: str = "embedding") -> PcaModel:
    """Fit PCA over an embedding column in ONE distributed pass.

    The collect here is the bounded-scalar kind the plan audit allows:
    d(d+1)/2 + d + 1 aggregate rows (2 145 for d = 64) — the model, not
    the data.  Cross-partition sums are DECIMAL(38,0), exact for any
    corpus size."""
    rows = (
        second_moment_partials(emb, vec_col)
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: no non-null vectors")
    n = 0
    sums: dict[int, int] = {}
    gram: dict[tuple[int, int], int] = {}
    for r in rows:
        s = int(r["s"])
        if r["i"] == -1:
            n = s
        elif r["j"] == -1:
            sums[r["i"]] = s
        else:
            gram[(r["i"], r["j"])] = s
    d = len(sums)
    return fit_from_moments(n, [sums[i] for i in range(d)], gram)


def pca_project(
    emb: DataFrame,
    model: PcaModel,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Centered projection onto the top-``k`` components — a broadcast
    map, no shuffle: the quantized components ride along as array
    literals (k·d int64 values), the dot product is an exact int64
    fold in whole-stage codegen, and the only float arithmetic is one
    subtraction plus one EXACT power-of-two scale.  Output is long
    form (id, component, proj) so downstream groupBys don't need to
    unpivot."""
    # materialize the quantized vector ONCE: Spark does no CSE across
    # HOF lambdas (the winnow_fingerprints lesson), so inlining vq into
    # each component's fold would re-floor the whole array k times
    quantized = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize_expr(F.col(vec_col)).alias("_vq")
    )
    # the k component rows + offsets ship as TWO nested-list literals
    # and one transform lambda instead of k per-element F.array(*lits)
    # folds: same exact integer dots and float ops per row, but ~2k·d
    # py4j round trips collapse to 2 (measured 1.7→1.0 s driver build
    # for k=8, d=64; the 16-axis JL twin measured 6.2→1.5 s)
    mat = lit_int_matrix([model.components_q[c] for c in range(k)])
    offs = lit_doubles([model.offsets[c] for c in range(k)])
    projs = F.transform(
        mat,
        lambda row, i: (
            F.aggregate(
                F.zip_with(F.col("_vq"), row, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            - F.element_at(offs, i + F.lit(1))
        )
        * F.lit(PROJ_INV_SCALE),
    )
    return (
        quantized.select(F.col(id_col), F.posexplode(projs))
        .select(
            F.col(id_col),
            F.col("pos").cast("int").alias("component"),
            F.col("col").alias("proj"),
        )
    )


def pca_spectrum(model: PcaModel, k: int | None = None) -> list[dict]:
    """Per-component eigenvalue / explained-variance rows (driver-side
    list — the spectrum is d scalars, not data)."""
    k = model.dim if k is None else k
    out, cum = [], 0.0
    for c in range(k):
        ev = model.eigvals[c]
        cum += ev
        out.append(
            {
                "component": c,
                "eigenvalue": ev,
                "var_ratio": ev / model.total_var,
                "cum_ratio": cum / model.total_var,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Sparse Johnson-Lindenstrauss (Achlioptas) random projection
# ---------------------------------------------------------------------------

#: Achlioptas (2003) sparse JL distribution: r ∈ {+1, −1, 0} with
#: probabilities {1/6, 1/6, 2/3}, scaled by √3 — preserves pairwise
#: distances in expectation like a dense Gaussian projection at a
#: third of the multiplies.  Signs derive from the portable md5 fold
#: of "jl:{seed}:{j}:{i}" (mod 6: 0→+1, 1→−1, else 0), so ANY engine
#: reproduces the matrix from the string alone — the SQL twin builds
#: it with its own md5(), no literals shipped.


def achlioptas_sign(seed: int, j: int, i: int) -> int:
    """One projection-matrix cell — driver-side twin of the SQL
    expression ``portable_base_hash_sql(md5('jl:s:j:i')) % 6``."""
    import hashlib

    h = int(
        hashlib.md5(f"jl:{seed}:{j}:{i}".encode()).hexdigest()[:15], 16
    )
    m = h % 6
    return 1 if m == 0 else (-1 if m == 1 else 0)


def jl_project(
    emb: DataFrame,
    out_dim: int = 16,
    seed: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Data-INDEPENDENT dimensionality reduction: project each
    embedding onto ``out_dim`` sparse random axes.  Where
    :func:`pca_fit` needs one aggregation pass over the corpus, JL
    needs zero — the matrix is a pure function of the seed — so at
    100 TB this is the map-only preprocessing for clustering/ANN when
    even a moment pass is not worth scheduling (and the JL lemma gives
    the distance-distortion bound PCA cannot).

    Execution shape: identical to :func:`pca_project` — quantized
    int64 embedding (the shared ``floor(x·2^12 + 0.5)`` convention),
    ±1/0 sign arrays as literals, exact integer dot folds in
    whole-stage codegen, one float multiply by √(3/out_dim)/2^12 at
    the end.  No shuffle, no Python, no fit state.

    Output: (id, component, proj) long form, like pca_project.
    """
    import math

    signs = [
        [achlioptas_sign(seed, j, i) for i in range(_dim_of(emb, vec_col))]
        for j in range(out_dim)
    ]
    scale = math.sqrt(3.0 / out_dim) / _QV
    quantized = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize_expr(F.col(vec_col)).alias("_vq")
    )
    # one nested-list literal + one transform lambda instead of out_dim
    # per-element F.array(*lits) folds — identical dots/rounding, but
    # the out_dim·d py4j literal calls collapse to one (measured
    # 6.2→1.5 s of driver-side build for 16×64, equality-verified)
    mat = F.lit(signs)
    projs = F.transform(
        mat,
        lambda row: F.aggregate(
            F.zip_with(F.col("_vq"), row, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        * F.lit(scale),
    )
    return quantized.select(F.col(id_col), F.posexplode(projs)).select(
        F.col(id_col),
        F.col("pos").cast("int").alias("component"),
        F.col("col").alias("proj"),
    )


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    """Embedding width from one row — a bounded-scalar lookup (the
    projection matrix is seed×dims, not data)."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).filter(
        F.col("d") > 0
    ).first()
    if row is None:
        raise ValueError("jl_project: no non-null vectors")
    return int(row["d"])


def jl_project_sql(
    table: str,
    out_dim: int = 16,
    seed: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Self-contained DuckDB twin of :func:`jl_project`: rebuilds the
    sign matrix from md5() + the portable fold (no literals), the same
    quantized integer dot, the same single float multiply."""
    from .dedup import portable_base_hash_sql

    fold = portable_base_hash_sql(
        f"substr(md5('jl:{seed}:' || j || ':' || i), 1, 15)"
    )
    import math

    scale = math.sqrt(3.0 / out_dim) / _QV
    return f"""
    WITH dims AS (
      SELECT unnest(range(0, len(first(embedding)))) AS i
      FROM {table} WHERE {vec_col} IS NOT NULL
    ),
    cells AS (
      SELECT j, i,
             CASE ({fold}) % 6 WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS r
      FROM (SELECT unnest(range(0, {out_dim})) AS j), dims
    ),
    vq AS (
      SELECT {id_col},
             i.i AS i,
             CAST(floor(CAST({vec_col}[i.i + 1] AS DOUBLE) * 4096.0 + 0.5)
                  AS BIGINT) AS v
      FROM {table}, dims i
      WHERE {vec_col} IS NOT NULL
    )
    SELECT {id_col}, CAST(j AS INTEGER) AS component,
           CAST(CAST(sum(v * r) AS BIGINT) AS DOUBLE) * {scale!r} AS proj
    FROM vq JOIN cells USING (i)
    GROUP BY {id_col}, j
    """
