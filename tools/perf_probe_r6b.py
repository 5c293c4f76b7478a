"""Round-6 perf probe, part 2: decompose q_join3_topn's sf1 time into
fact-side floor vs dim/broadcast overhead, and run a clean interleaved
batchSize A/B for q_pricing_summary (part 1 measured the batchSize
variants sequentially, confounded with JIT warm-up).

Run:  SPARK_GRAFT_DRIVER_MEM=16g python tools/perf_probe_r6b.py
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
NRUNS = 9

SQL_PRICING = """select l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
  sum(l_extendedprice) sum_base, sum(l_extendedprice*(1-l_discount)) sum_disc,
  avg(l_quantity) avg_qty, count(*) cnt from lineitem
  where l_shipdate <= timestamp_ntz '1998-09-02' group by 1,2 order by 1,2"""
SQL_JOIN3 = """select n_name, sum(l_extendedprice*(1-l_discount)) rev
  from customer join orders on c_custkey=o_custkey
  join lineitem on o_orderkey=l_orderkey
  join nation on c_nationkey=n_nationkey group by 1 order by rev desc limit 10"""
# fact-side-only control: same SMJ + same-width agg, no dims involved
SQL_JOIN_FACT = """select o_custkey % 25 k, sum(l_extendedprice*(1-l_discount)) rev
  from orders join lineitem on o_orderkey=l_orderkey
  group by 1 order by rev desc limit 10"""
# scan+agg-only control: the pure lineitem aggregate floor
SQL_FACT_AGG = """select l_orderkey % 25 k, sum(l_extendedprice*(1-l_discount)) rev
  from lineitem group by 1 order by rev desc limit 10"""


def main() -> None:
    spark = get_session("perf_probe_r6b")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, SF_DIR)
    maxpart = spark.sparkContext.defaultParallelism
    import pyarrow.parquet as pq

    rows = pq.ParquetFile(os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    scale = max(1, round(rows / 600_000))
    print(f"# sf_dir={SF_DIR} scale={scale} cores={maxpart}", flush=True)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")

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
    for df in (lineitem, orders_j, customer, nation):
        df.count()

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    duck_pricing = SQL_PRICING.replace("timestamp_ntz", "timestamp")
    con.execute(duck_pricing).fetchall()
    con.execute(SQL_JOIN3).fetchall()
    d_pricing = statistics.median(
        [_t(lambda: con.execute(duck_pricing).fetchall()) for _ in range(5)]
    )
    d_join3 = statistics.median(
        [_t(lambda: con.execute(SQL_JOIN3).fetchall()) for _ in range(5)]
    )
    print(f"duckdb   pricing {d_pricing:7.1f} ms   join3 {d_join3:7.1f} ms", flush=True)

    # --- join3 decomposition (all binds identical to bench.py) ---------------
    lineitem.createOrReplaceTempView("lineitem")
    orders_j.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    nation.createOrReplaceTempView("nation")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(2 * 1024 * 1024 * scale)
    )
    plans = {
        "full join3": SQL_JOIN3,
        "fact-only SMJ+agg": SQL_JOIN_FACT,
        "scan+agg floor": SQL_FACT_AGG,
    }
    for sql in plans.values():
        spark.sql(sql).collect()  # warm
    res: dict[str, list[float]] = {k: [] for k in plans}
    for _ in range(NRUNS):
        for name, sql in plans.items():
            res[name].append(_t(lambda: spark.sql(sql).collect()))
    for name, ts in res.items():
        print(f"{name:24s} {statistics.median(ts):7.1f} ms", flush=True)

    # --- pricing batchSize interleaved A/B -----------------------------------
    projs = {}
    for bs in ("100000", "400000"):
        spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", bs)
        p = (
            tables["lineitem"]
            .select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate",
            )
            .repartition(min(16 * scale, maxpart))
            .cache()
        )
        p.count()
        projs[bs] = p

    def bind(bs):
        projs[bs].createOrReplaceTempView("lineitem")
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    for bs in projs:
        bind(bs)
        spark.sql(SQL_PRICING).collect()
    res = {bs: [] for bs in projs}
    for _ in range(NRUNS):
        for bs in projs:
            bind(bs)
            res[bs].append(_t(lambda: spark.sql(SQL_PRICING).collect()))
    for bs, ts in res.items():
        m = statistics.median(ts)
        print(
            f"pricing batchSize={bs:8s} {m:7.1f} ms   ratio {m/d_pricing:5.2f}x",
            flush=True,
        )


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return (time.perf_counter() - t0) * 1000


if __name__ == "__main__":
    main()
