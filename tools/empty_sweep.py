"""Short-input robustness sweep — run every registered operator against a
zero-row (default) or N-row copy of the fixtures (correct schemas).

At 100 TB, empty inputs are routine (a filter that matches nothing, a new
partition, a cold-start day), and 1-row inputs are the boundary where
sequence/slice/lag guards break (the round-2 ADVICE short-doc class): an
operator that crashes on either is a pager, not a query. This sweep
executes the SPARK side only (no oracle — short-input SQL semantics
legitimately differ per aggregate) and reports crashes. Streaming live
variants are skipped (their staged replay needs rows to build files).

Usage: python tools/empty_sweep.py [--rows N] [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_pipes_spark import operators  # noqa: F401
from dask_pipes_spark.registry import QUERIES
from dask_pipes_spark.session import TABLES, get_session, load_tables, scratch_path

SKIP = {
    # streaming replays stage row files; an empty stage has no micro-batches
    "k4_stream_tumbling", "k5_stream_dedup", "k6_stream_stateful",
    "k7_stream_static_join", "k8_stream_stream_join", "k10_stream_session",
    "k11_stream_sliding", "k13_stream_checksum", "k14_stream_progress_audit",
    "k15_stream_incremental_dedup", "k16_stream_avro_sink",
    # introspects the REAL fixture parquet footers by design
    "a13_rowgroup_stats",
}


def make_empty_dir(spark, src: str, rows: int = 0) -> str:
    out = scratch_path(f"dps_empty_fixtures_{rows}" if rows else "dps_empty_fixtures")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        tables = load_tables(spark, src)
        for name in TABLES:
            df = tables[name].limit(rows)
            if name == "events":
                # the staged stream path re-reads raw events; keep the raw
                # nanos schema an operator would see from disk
                df = spark.read.parquet(
                    os.path.join(src, "events.parquet")
                ).limit(rows)
            df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        open(done, "w").close()
    return out


def main() -> int:
    spark = get_session("empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    rows = 0
    if "--rows" in args:
        i = args.index("--rows")
        rows = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    empty = make_empty_dir(spark, "/root/testdata/sf0.001", rows)
    keys = [k for k in (args or sorted(QUERIES)) if k not in SKIP]
    failed = []
    for key in keys:
        try:
            n = len(QUERIES[key](spark, empty).collect())
            print(f"ok   {key}: rows={n}")
        except Exception as exc:  # noqa: BLE001
            failed.append(key)
            print(f"FAIL {key}: {str(exc).splitlines()[0][:160]}")
    print(f"{len(keys) - len(failed)}/{len(keys)} {rows}-row-input clean; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
