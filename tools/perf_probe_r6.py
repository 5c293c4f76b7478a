"""Round-6 perf probe: the two over-2x headline queries, one lever each.

Round-5 verdict item 1 names one untried lever per query and asks for a
same-window sf1 measurement closing each under 2x OR a pinned note that
the lever is dead:

- q_join3_topn: kill the per-execution broadcast-rebuild cost (~40-60 ms
  attributed by the round-5 decomposition). Variants: broadcast transport
  cost reduction (compression/checksum off -- local mode moves bytes over
  loopback memory, compression is pure CPU), a 2-col pruned customer cache
  (smaller hashed-relation input scan), and all-SMJ layouts (threshold 0)
  as the no-broadcast control.
- q_pricing_summary: DECIMAL-typed cached projection (sum kernels run on
  long-backed Decimal(12,2) instead of per-row double accumulation) and a
  bigger in-memory batch size for the 6-group agg, per the verdict text.

Methodology mirrors bench.py exactly (same session knobs, same layouts,
same SQL text, median of NRUNS warm with interleaved variant order so
ambient drift hits all variants equally). DuckDB re-measured same-window
for the ratio column. Run:  SPARK_GRAFT_SF_DIR=.benchdata/sf1 python
tools/perf_probe_r6.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

from dask_pipes_spark.session import get_session, load_tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".benchdata/sf1"))
NRUNS = 7

SQL_PRICING = """select l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
  sum(l_extendedprice) sum_base, sum(l_extendedprice*(1-l_discount)) sum_disc,
  avg(l_quantity) avg_qty, count(*) cnt from lineitem
  where l_shipdate <= timestamp_ntz '1998-09-02' group by 1,2 order by 1,2"""
SQL_JOIN3 = """select n_name, sum(l_extendedprice*(1-l_discount)) rev
  from customer join orders on c_custkey=o_custkey
  join lineitem on o_orderkey=l_orderkey
  join nation on c_nationkey=n_nationkey group by 1 order by rev desc limit 10"""


def med(fn, n=NRUNS):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1000


def main() -> None:
    spark = get_session("perf_probe_r6")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, SF_DIR)
    maxpart = spark.sparkContext.defaultParallelism
    import pyarrow.parquet as pq

    rows = pq.ParquetFile(os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    scale = max(1, round(rows / 600_000))
    print(f"# sf_dir={SF_DIR} scale={scale} cores={maxpart}", flush=True)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "100000")
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")

    # bench.py primary layouts (only what these two queries touch)
    lineitem = (
        tables["lineitem"]
        .repartition(min(8 * scale, maxpart), "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .cache()
    )
    orders_j = (
        tables["orders"]
        .repartition(min(8 * scale, maxpart), "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .cache()
    )
    customer = tables["customer"].repartition(1).cache()
    nation = tables["nation"].repartition(1).cache()
    pricing_proj = (
        tables["lineitem"]
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        )
        .repartition(min(16 * scale, maxpart))
        .cache()
    )
    for df in (lineitem, orders_j, customer, nation, pricing_proj):
        df.count()

    # --- DuckDB same-window twins ------------------------------------------
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    duck_pricing = SQL_PRICING.replace("timestamp_ntz", "timestamp")
    con.execute(duck_pricing).fetchall()
    con.execute(SQL_JOIN3).fetchall()
    d_pricing = med(lambda: con.execute(duck_pricing).fetchall(), 5)
    d_join3 = med(lambda: con.execute(SQL_JOIN3).fetchall(), 5)
    print(f"duckdb   pricing {d_pricing:7.1f} ms   join3 {d_join3:7.1f} ms", flush=True)

    # --- q_pricing_summary variants ------------------------------------------
    dec_proj = (
        tables["lineitem"]
        .select(
            "l_returnflag", "l_linestatus",
            F.col("l_quantity").cast("decimal(12,2)").alias("l_quantity"),
            F.col("l_extendedprice").cast("decimal(12,2)").alias("l_extendedprice"),
            F.col("l_discount").cast("decimal(12,2)").alias("l_discount"),
            "l_shipdate",
        )
        .repartition(min(16 * scale, maxpart))
        .cache()
    )
    dec_proj.count()

    def run_pricing():
        spark.sql(SQL_PRICING).collect()

    def bind_p(df, parts=1, batch=None):
        df.createOrReplaceTempView("lineitem")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    pricing_variants = {
        "p_base(double proj)": lambda: bind_p(pricing_proj),
        "p_decimal_proj": lambda: bind_p(dec_proj),
    }
    # batchSize variants need re-caching to take effect; do separately below.

    # warm every variant once
    for name, bind in pricing_variants.items():
        bind()
        run_pricing()
    res: dict[str, list[float]] = {k: [] for k in pricing_variants}
    for _ in range(NRUNS):  # interleaved
        for name, bind in pricing_variants.items():
            bind()
            t0 = time.perf_counter()
            run_pricing()
            res[name].append(time.perf_counter() - t0)
    for name, ts in res.items():
        m = statistics.median(ts) * 1000
        print(f"{name:28s} {m:7.1f} ms   ratio {m/d_pricing:5.2f}x", flush=True)

    # batchSize experiment: rebuild the double projection under candidate
    # batch sizes (cache format captured at build time)
    for bs in ("100000", "400000", "1000000"):
        spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", bs)
        proj = (
            tables["lineitem"]
            .select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate",
            )
            .repartition(min(16 * scale, maxpart))
            .cache()
        )
        proj.count()
        bind_p(proj)
        run_pricing()
        ts = [0.0] * 0
        m = med(run_pricing)
        print(f"p_batchSize={bs:8s}            {m:7.1f} ms   ratio {m/d_pricing:5.2f}x", flush=True)
        proj.unpersist()
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "100000")

    # --- q_join3_topn variants ------------------------------------------------
    cust2 = (
        tables["customer"].select("c_custkey", "c_nationkey").repartition(1).cache()
    )
    cust2.count()

    def bind_j(cust, bcast_mb=2, compress=None):
        lineitem.createOrReplaceTempView("lineitem")
        orders_j.createOrReplaceTempView("orders")
        cust.createOrReplaceTempView("customer")
        nation.createOrReplaceTempView("nation")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            str(int(bcast_mb * 1024 * 1024 * scale)),
        )

    def run_join3():
        spark.sql(SQL_JOIN3).collect()

    join_variants = {
        "j_base": lambda: bind_j(customer),
        "j_cust2col": lambda: bind_j(cust2),
        "j_no_broadcast(all SMJ)": lambda: bind_j(customer, bcast_mb=0.000001),
    }
    for name, bind in join_variants.items():
        bind()
        run_join3()
    res = {k: [] for k in join_variants}
    for _ in range(NRUNS):
        for name, bind in join_variants.items():
            bind()
            t0 = time.perf_counter()
            run_join3()
            res[name].append(time.perf_counter() - t0)
    for name, ts in res.items():
        m = statistics.median(ts) * 1000
        print(f"{name:28s} {m:7.1f} ms   ratio {m/d_join3:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
