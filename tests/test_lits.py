"""The F.expr-parsed array literals must be indistinguishable from the
per-element F.lit lowering they replace: same element types, same
containsNull, same values down to IEEE bits (round-11 construction
optimization — pca/jl matrices, IVF centroids, PQ codebooks, LSH
planes)."""

import math

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.functions.lits import (
    lit_double_matrix,
    lit_doubles,
    lit_int_matrix,
    lit_ints,
)


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _schema_and_rows(one, col):
    df = one.select(col.alias("v"))
    return df.schema["v"], df.collect()[0]["v"]


EDGE_DOUBLES = [
    0.0,
    -0.0,
    1.5,
    -1.5e300,
    1e-300,
    0.1 + 0.2,
    2.0 ** -52,
    123456789.123456789,
]


def test_lit_doubles_matches_per_element_lowering(one):
    fa, va = _schema_and_rows(one, lit_doubles(EDGE_DOUBLES))
    fb, vb = _schema_and_rows(one, F.lit([float(v) for v in EDGE_DOUBLES]))
    assert fa == fb  # dtype AND containsNull
    assert all(
        math.copysign(1, x) == math.copysign(1, y) and x == y
        for x, y in zip(va, vb)
    )


def test_lit_double_matrix_matches(one):
    rows = [EDGE_DOUBLES, list(reversed(EDGE_DOUBLES))]
    fa, va = _schema_and_rows(one, lit_double_matrix(rows))
    fb, vb = _schema_and_rows(
        one, F.lit([[float(v) for v in r] for r in rows])
    )
    assert fa == fb
    assert va == vb


def test_lit_ints_typing_parity(one):
    # int32-range values must stay IntegerType, wider ones LongType —
    # exactly F.lit's per-element rule (incl. the int32 minimum, which
    # the SQL parser alone would widen to bigint)
    for vals in ([3, -4], [2**31 - 1, -(2**31)], [2**40, 7]):
        fa, va = _schema_and_rows(one, lit_ints(vals))
        fb, vb = _schema_and_rows(one, F.lit([int(v) for v in vals]))
        assert fa == fb, vals
        assert va == vb, vals


def test_lit_int_matrix_matches(one):
    rows = [[1, -2, 3], [2**35, 0, -(2**31)]]
    fa, va = _schema_and_rows(one, lit_int_matrix(rows))
    fb, vb = _schema_and_rows(one, F.lit([[int(v) for v in r] for r in rows]))
    assert fa == fb
    assert va == vb


def test_nonfinite_falls_back(one):
    # NaN/inf have no SQL literal form; the helper must keep behaving
    # like F.lit rather than raising
    vals = [1.0, float("nan"), float("inf")]
    fa, va = _schema_and_rows(one, lit_doubles(vals))
    fb, vb = _schema_and_rows(one, F.lit(vals))
    assert fa == fb
    assert math.isnan(va[1]) and math.isnan(vb[1]) and va[2] == vb[2]


def test_numpy_inputs_accepted(one):
    np = pytest.importorskip("numpy")
    m = np.arange(6, dtype=np.float64).reshape(2, 3)
    fa, va = _schema_and_rows(one, lit_double_matrix(m))
    fb, vb = _schema_and_rows(one, F.lit([[float(v) for v in r] for r in m]))
    assert fa == fb
    assert va == vb
