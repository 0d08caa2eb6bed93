"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, column names, and values (order-insensitive,
float-tolerant — stricter diagnostics than the driver's hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from dystonse_gtfs_data_spark.session import build_session
from dystonse_gtfs_data_spark.sources.tables import TESTDATA_TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps → ns, decimals → float
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif df[c].dtype == object:
            try:
                from decimal import Decimal

                if df[c].map(lambda v: isinstance(v, Decimal)).any():
                    df[c] = df[c].astype(float)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver-faithful dtype check: the driver hashes raw values, so an
        # integral column on one side and float on the other (e.g. DuckDB
        # HUGEINT → pandas float64) is a guaranteed hash mismatch even when
        # the numbers are equal. Never route int-vs-float through the
        # tolerant path.
        if (av.dtype.kind in "iu") != (bv.dtype.kind in "iu") and (
            av.dtype.kind in "iuf" and bv.dtype.kind in "iuf"
        ):
            return False, (
                f"col {c}: dtype drift {av.dtype} vs {bv.dtype} "
                "(int-vs-float breaks the driver's exact hash)"
            )
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av_f = av.astype(float)
            bv_f = bv.astype(float)
            both_nan = av_f.isna() & bv_f.isna()
            close = (
                (av_f - bv_f).abs()
                <= (1e-9 + 1e-9 * bv_f.abs())
            ) | both_nan
            if not close.all():
                bad = (~close).idxmax()
                return False, f"col {c} row {bad}: {av_f[bad]} vs {bv_f[bad]}"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return False, f"col {c} row {bad}: {av[bad]!r} vs {bv[bad]!r}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("CHECK_VANILLA_SESSION"):
        # rehearse the driver's environment: no engine session configs
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").appName("vanilla").getOrCreate()
    else:
        spark = build_session("check_correctness")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            from dystonse_gtfs_data_spark.cache import release_persisted

            release_persisted()  # drop operator-tracked caches per query
        t1 = time.time()
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows, {t1 - t0:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok, msg = values_match(canon(sdf), canon(odf))
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name}: {len(sdf)} rows, spark {t1 - t0:.1f}s — {msg}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
