"""Test-side alias for the package's deterministic GTFS demo fixtures."""

from dystonse_gtfs_data_spark.sources.demo import (  # noqa: F401
    MONDAY,
    N_LONG_STOPS,
    N_SHORT_STOPS,
    N_VEHICLES,
    build_records,
    build_rt_updates,
    build_schedule,
    delay_matrix,
)
