"""As-of join (J3): for each left row, the newest right row whose time key
is <= the left row's time key, per equi-key.

The reference implements this as a driver-side sorted file-list walk
(src/importer/mod.rs:377-451: each realtime file joins the newest schedule
whose filename date is <= the rt date).  Spark has no native as-of join,
so we use the union + ordered window trick: tag both sides, union, sort
within the equi-key by (time, side) and carry the last right payload
forward with last(ignorenulls).

Scale notes: one shuffle on the equi-key (same as any join), no
broadcast-size limit on either side, skew handled by AQE.  This beats a
join + row_number() filter (which materializes every <= match before
discarding all but one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_t"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row plus the payload columns of the
    matching (newest right_time <= left_time) right row, or NULLs.

    Right should be unique per (on, right_time); pre-aggregate if not.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    r = right.select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(_TIME, _SIDE)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_SIDE, _TIME, _PAYLOAD)
