"""Scaled-fixture rehearsal for the GTFS DOMAIN pipeline (round-7
verdict task #4): the curve-UDAF statistics build + the prediction
fallback ladder are the reference's heaviest batch job
(src/analyser/specific_curves.rs:29-56 per-route loop), but every prior
sf1/sf10 datapoint was on the generic/corpus tables — the demo fixture
is fixed-size, so the domain pipeline had zero scaled evidence.

This harness replicates the demo fixture R× IN SPARK (key-suffix
replication, the make_scaled_sf.py recipe): R copies of every route /
trip / stop / stop_time / record with `#k`-suffixed keys and offset
route_variants, plus a deterministic ±3 s per-replica delay offset so
replica curves are not byte-identical.  Group structure under scaling:

- specific curves: one pandas-UDAF group per (variant × stop pair ×
  time slot) — group COUNT scales ×R (the reference's per-route loop
  becomes R× longer);
- default rollup: route_type/route_section/time_slot groups are FIXED
  (like reality — scaling a feed adds routes, not route types), so
  their input volume grows ×R into a constant group count — the skew
  shape worth rehearsing.

Round 8 adds the variant-WIDTH axis (SURVEY §7 hard-part #4, the
reference's own watch item): `scale_fixture` multiplies route COUNT but
keeps 16 stops per variant, while the stop-pair curve-set grid grows
O(stops²) per variant × slots × 2 event types — a 60-stop tram line has
14.8× the pair groups of the 16-stop demo bus.  The width ladder holds
R fixed and sweeps stops-per-variant, probing curve-set group-count
growth and pandas-UDAF batch pressure directly.

Usage: python tools/bench_gtfs_scaled.py [R1,R2,...] [W1,W2,...@R]
  (defaults: replicas 1,10,100; widths 16,30,60@10)
Prints one JSON line; the committed artifact is BENCH_gtfs_scaled.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dystonse_gtfs_data_spark.cache import release_persisted
from dystonse_gtfs_data_spark.session import build_session


from dystonse_gtfs_data_spark.sources.demo import scale_fixture as scaled_fixture


def main() -> None:
    rs = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 10, 100]
    )
    if len(sys.argv) > 2:
        wspec, _, wr = sys.argv[2].partition("@")
        widths = [int(x) for x in wspec.split(",")]
        width_r = int(wr or "10")
    else:
        widths, width_r = [16, 30, 60], 10
    spark = build_session("bench-gtfs-scaled")

    from dystonse_gtfs_data_spark.operators.default_curves import (
        default_statistics,
    )
    from dystonse_gtfs_data_spark.operators.predict import (
        generate_realtime_predictions,
    )
    from dystonse_gtfs_data_spark.operators.specific_curves import (
        enrich_records,
        specific_statistics,
        stop_indexed,
    )

    out = {}
    for r in rs:
        sched, recs = scaled_fixture(spark, r)
        # materialize inputs once so timings measure the pipeline, not
        # the replication crossJoin
        recs = recs.persist()
        n_records = recs.count()
        st = sched["stop_times"].persist()
        st.count()
        sti = stop_indexed(st)

        t0 = time.time()
        stats = specific_statistics(recs, st).unionByName(
            default_statistics(enrich_records(recs, sti), sched["routes"])
        )
        stats_p = stats.persist()
        n_curves = stats_p.count()
        t_stats = round(time.time() - t0, 3)

        t0 = time.time()
        preds = generate_realtime_predictions(
            recs, sti, sched["routes"], sched["trips"], stats_p
        )
        preds.write.format("noop").mode("overwrite").save()
        t_preds = round(time.time() - t0, 3)

        out[str(r)] = {
            "n_records": n_records,
            "n_curves": n_curves,
            "statistics_s": t_stats,
            "predictions_s": t_preds,
        }
        print(f"# R={r} {out[str(r)]}", file=sys.stderr, flush=True)
        stats_p.unpersist()
        recs.unpersist()
        st.unpersist()
        release_persisted()

    from dystonse_gtfs_data_spark.sources.demo import wide_fixture

    out_w = {}
    for w in widths:
        sched, recs = wide_fixture(spark, w, r=width_r)
        recs = recs.persist()
        n_records = recs.count()
        st = sched["stop_times"].persist()
        st.count()

        t0 = time.time()
        stats = specific_statistics(recs, st)
        stats_p = stats.persist()
        n_curves = stats_p.count()
        t_stats = round(time.time() - t0, 3)
        n_groups = (
            stats_p.filter(stats_p.scope == "specific")
            .select(
                "route_variant", "start_stop_index", "end_stop_index",
                "time_slot_id", "event_type",
            )
            .distinct()
            .count()
        )
        out_w[str(w)] = {
            "r": width_r,
            "n_records": n_records,
            "n_curves": n_curves,
            "n_pair_groups": n_groups,
            "statistics_s": t_stats,
        }
        print(f"# W={w} {out_w[str(w)]}", file=sys.stderr, flush=True)
        stats_p.unpersist()
        recs.unpersist()
        st.unpersist()
        release_persisted()

    print(
        json.dumps(
            {
                "metric": "gtfs_domain_scaled_wall_time",
                "unit": "sec",
                "replicas": out,
                "widths": out_w,
            }
        )
    )


if __name__ == "__main__":
    main()
