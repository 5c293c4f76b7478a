"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet fixtures, then compares row-count + column names + (order-insensitive)
values with *exact* equality — strictly at least as strict as the driver's
value-hash, so a local pass predicts a driver pass.

Usage:
    python tools/check_parity.py [key ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from dask_pipes_spark.session import TABLES, get_session

DEFAULT_SF = "/root/testdata/sf0.01"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — order-insensitive form."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an and bn
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
    if problems:
        return problems
    s, d = _norm(spark_df), _norm(duck_df)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not _values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={a!r} duck={b!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", help="operator keys to check (default: all)")
    ap.add_argument("--sf", default=os.environ.get("PARITY_SF_DIR", DEFAULT_SF))
    args = ap.parse_args()

    from dask_pipes_spark import operators  # noqa: F401
    from dask_pipes_spark.registry import ORACLES, QUERIES

    keys = args.keys or sorted(QUERIES)
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = get_session("parity-check")
    con = duck_connect(args.sf)
    failed, weak = [], []
    for key in keys:
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[key](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: spark error: {exc}")
            continue
        if key not in ORACLES:
            weak.append(key)
            print(f"weak {key}: rows={len(sdf)} ({time.perf_counter()-t0:.2f}s)")
            continue
        oracle_sql = ORACLES[key]
        if args.sf != DEFAULT_SF and DEFAULT_SF in oracle_sql:
            # a10/a13 pin the driver's contractual sf0.01 fixture dir in
            # their oracle SQL (an oracle string can't take parameters);
            # rewrite the literal so multi-SF sweeps compare against the
            # right files instead of whitelisting a known-benign diff
            # (ADVICE r3).
            oracle_sql = oracle_sql.replace(DEFAULT_SF, args.sf)
        try:
            ddf = con.execute(oracle_sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: duckdb error: {exc}")
            continue
        problems = compare(sdf, ddf)
        if problems:
            failed.append(key)
            print(f"FAIL {key}: " + "; ".join(problems))
        else:
            print(f"ok   {key}: rows={len(sdf)} ({time.perf_counter()-t0:.2f}s)")
    print(
        f"\n{len(keys) - len(failed)}/{len(keys)} passed"
        f" ({len(weak)} weak rows-only checks)"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
