"""dystonse_gtfs_data_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of dystonse/dystonse-gtfs-data.

The reference (Rust, /root/reference) is a public-transit delay-statistics
engine: GTFS schedule + GTFS-realtime ingestion, per-stop delay records,
empirical delay-CDF ("curve") analytics, delay prediction with a fallback
hierarchy, and a departure-board query layer.  This package re-expresses
every operator in idiomatic Spark (DataFrame/SQL first, Catalyst-optimized,
pandas UDFs only for curve algebra), designed for 100 TB scale:

- ``sources``   — GTFS static CSV, GTFS-rt decode, parquet table loaders
- ``functions`` — scalar/column expressions (GTFS time, time slots, geo,
                  delay rounding, text analysis)
- ``curves``    — pure-numpy curve algebra + pandas-UDF wrappers
- ``operators`` — records pipeline, curve builders, prediction fallback,
                  dedup / similarity / text ops, as-of join, monitors
- ``streaming`` — Structured Streaming wrappers over the batch operators
- ``plans``     — explain/plan-audit helpers
"""

__version__ = "0.1.0"
