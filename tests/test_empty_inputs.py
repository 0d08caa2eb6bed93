"""Degenerate-input robustness: every sf-dir-driven catalog query must
return an EMPTY result — not crash — when every input table has zero
rows.  At 1000 executors an empty partition, an empty date slice, or a
filter that matches nothing is routine; a driver-side sample, a
``collect()[0]``, or a numpy reshape that assumes ≥1 row turns that
into a job failure (exactly how ivf_topk's codebook trainer broke
before the guard this test pins)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from dystonse_gtfs_data_spark import queries as Q

# fixture-driven queries read the bundled demo GTFS feed, not the sf
# dir — an empty sf dir exercises nothing in them; streaming queries
# are excluded for suite runtime (each spins up a real streaming job)
# but basis_stream/windowed_counts_stream/etc. passed the same sweep.
NOT_SF_TABLE_DRIVEN = {
    "basis_stream",
    "departure_board",
    "gap_fill_records",
    "gtfs_predictions",
    "gtfs_records",
    "gtfs_schedule_scan",
    "gtfs_statistics",
    "gtfs_statistics_scaled",
    "gtfs_statistics_width",
    "journey_chain",
    "journey_transfers",
    "master_variants",
    "monitor_http",
    "departure_board_cached",
    "realtime_basis",
    "scheduled_predictions",
    "skipped_updates",
    "statistics_tree_roundtrip",
    "trip_resolution",
    "visual_schedule",
}
STREAMING = {
    "windowed_counts_stream",
    "session_window_stream",
    "stream_stream_join",
    "stream_dedup",
    "stream_near_dup",
    "stream_near_dup_ttl",
}
EMPTY_SWEEP = sorted(set(Q.REGISTRY) - NOT_SF_TABLE_DRIVEN - STREAMING)


@pytest.fixture(scope="module")
def empty_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(sf_dir, f))
            pq.write_table(schema.empty_table(), str(d / f))
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SWEEP)
def test_query_survives_empty_tables(spark, empty_dir, name):
    assert Q.REGISTRY[name].fn(spark, empty_dir).count() == 0
