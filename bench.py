"""Headline benchmark — mirrors BASELINE.md's DuckDB query set 1:1.

Runs on one warm SparkSession at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]``; per-query wall-clock is the median of 3 warm
runs with full result fetch (same methodology as the baseline: JVM startup
and first-touch page-cache warmup excluded via a warmup pass).

Prints ONE JSON line:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dask_pipes_spark.registry import dsum
from dask_pipes_spark.session import get_session, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q_pricing_summary(spark, t):
    from dask_pipes_spark.registry import davg

    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join3_topn(spark, t):
    # star-join as a broadcast-dim chain: the fact table (lineitem) never
    # shuffles — orders⋈customer⋈nation collapses to a 2-column dim that is
    # broadcast onto the fact scan; only the 25-group agg exchanges.
    dim = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .orderBy(F.col("rev").desc())
        .limit(10)
    )


def q_window_rank(spark, t):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def q_sort(spark, t):
    return t["lineitem"].orderBy(F.col("l_extendedprice").desc()).limit(100)


def q_distinct(spark, t):
    return t["lineitem"].agg(F.countDistinct("l_partkey").alias("c"))


def q_events_session(spark, t):
    return (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"), dsum("value").alias("s"))
    )


def q_text_stats(spark, t):
    from dask_pipes_spark.registry import davg

    return t["documents"].groupBy("lang").agg(
        F.count(F.lit(1)).alias("c"), davg("n_chars").alias("a")
    )


QUERIES = {
    "q_pricing_summary": q_pricing_summary,
    "q_join3_topn": q_join3_topn,
    "q_window_rank": q_window_rank,
    "q_sort": q_sort,
    "q_distinct": q_distinct,
    "q_events_session": q_events_session,
    "q_text_stats": q_text_stats,
}


def main() -> None:
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, SF_DIR)

    # inputs pre-read into memory — BASELINE.md methodology: one warm session,
    # inputs pre-read, per-query wall-clock excluding startup (DuckDB gets the
    # OS page cache + 32 threads; Spark's equivalent warm state is the cached
    # relation, repartitioned across cores: each fixture is ONE parquet file
    # < maxPartitionBytes, so without the repartition every query would run
    # on a single task — partition-count discipline, the same knob that
    # matters at 100 TB (there: files >> cores, so the scan parallelizes
    # naturally and AQE coalesces; here: one small file must be split).
    # measured sweet spot at sf0.1 on this box: 8-way cache partitions and
    # 8 shuffle partitions (32 tasks on 600k rows is pure scheduling overhead;
    # 1 task is serial — see git history for the sweep)
    npart = min(8, spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", str(npart))
    for name, df in tables.items():
        tables[name] = df.repartition(npart).cache()
        tables[name].count()

    # warmup pass: JVM JIT, AQE paths, Python workers, Arrow fetch path
    for fn in QUERIES.values():
        fn(spark, tables).toPandas()

    results: dict[str, float] = {}
    for name, fn in QUERIES.items():
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, tables).toPandas()  # Arrow-batched full result fetch
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
