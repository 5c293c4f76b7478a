"""Oracle dtype audit — the third gate next to value parity and plan audits.

The driver's correctness check hashes SCHEMA as well as values; the local
value comparison coerces types (float("42.0") == int(42)), so a dtype drift
between a Spark query and its DuckDB oracle can pass locally and still break
the driver's hash. Two silent drift sources found in round 1:

- DuckDB ``SUM(BIGINT)`` returns HUGEINT (int128) — wrap integer sums in
  ``CAST(... AS BIGINT)`` on the oracle side;
- DuckDB ``FLOOR``/``CEIL`` return DOUBLE while Spark's return LONG — cast
  one side explicitly.

This script DESCRIBEs every SQL oracle and compares type FAMILIES
(int/float/str/bool/time/array, HUGEINT flagged separately) against the
Spark query's schema. Run after adding oracles:

    python tools/dtype_audit.py            # exits non-zero on mismatches
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dask_pipes_spark import operators  # noqa: F401  (registers everything)
from dask_pipes_spark.registry import ORACLES, QUERIES
from dask_pipes_spark.session import TABLES, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def family(t: str) -> str:
    t = t.lower()
    if "hugeint" in t:
        return "HUGEINT"
    if any(x in t for x in ("tinyint", "smallint", "int", "long", "bigint")):
        return "int"
    if any(x in t for x in ("double", "float", "real", "decimal")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(x in t for x in ("timestamp", "date")):
        return "time"
    if any(x in t for x in ("varchar", "string", "char")):
        return "str"
    if "array" in t or t.endswith("[]") or "list" in t:
        return "arr"
    return t


def main() -> int:
    keys = sys.argv[1:] or sorted(ORACLES)
    spark = get_session("dtype-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for key in keys:
        try:
            duck = {r[0]: family(r[1]) for r in con.execute(f"DESCRIBE {ORACLES[key]}").fetchall()}
            sp = {
                f.name: family(f.dataType.simpleString())
                for f in QUERIES[key](spark, SF_DIR).schema.fields
            }
            if set(duck) != set(sp):
                bad.append((key, "COLS", sorted(set(duck) ^ set(sp))))
                continue
            bad.extend(
                (key, c, f"duck={duck[c]} spark={sp[c]}")
                for c in duck
                if duck[c] != sp[c]
            )
        except Exception as exc:  # noqa: BLE001
            bad.append((key, "ERR", str(exc).splitlines()[0][:100]))
    for b in bad:
        print(b)
    print(f"{len(keys)} oracles checked, {len(bad)} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
