"""Group X-analytics — composite multi-way analytical queries (SURVEY.md §2-X).

The single-operator keys (groups A–H) prove each relational piece in
isolation; these composite queries prove the pieces *compose* into the
TPC-H-shaped plans a warehouse workload actually runs — multi-way join
ordering, filter pushdown through joins, partial aggregation above a join
tree, and top-k on an aggregated result, all in one Catalyst plan. Column
sets are adapted to the fixture schemas (no o_shippriority / c_address /
c_phone in the fixtures).

Scale notes (100 TB): nation/region are broadcast by Catalyst (size-based);
customer⋈orders⋈lineitem are key-partitioned shuffle joins with AQE free to
re-plan; revenue sums ride the decimal pattern so partial/final aggregation
order can't perturb the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_pipes_spark.registry import dsum, query, sql_dsum
from dask_pipes_spark.session import load_tables

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "x1_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           ROUND({sql_dsum(_REV)}, 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1996-03-15'
      AND l_shipdate  > DATE '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def x1_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered customer dim
    joined through orders into lineitem, revenue per unshipped order, top-10.
    The segment and date filters sit below the joins (pushdown verified by
    the a2 audit invariants); the final top-10 is TakeOrdered over the
    aggregate, not a global sort."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1996-03-15")
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > "1996-03-15")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(dsum(_rev_col()), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "x2_local_supplier_volume",
    oracle=f"""
    SELECT n_name, ROUND({sql_dsum(_REV)}, 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def x2_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): the 6-way join with the
    region→nation reduction and the customer-nation == supplier-nation
    locality predicate expressed as part of the supplier join key. nation
    and region are broadcast; the fact-side joins shuffle on their keys."""
    t = load_tables(
        spark,
        sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.round(dsum(_rev_col()), 4).alias("revenue"))
    )


@query(
    "x3_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           ROUND({sql_dsum(_REV)}, 4) AS revenue,
           ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 4) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def x3_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): lost revenue from returned
    lineitems per customer in a quarter, top-20. The returnflag and date
    filters prune the fact scans before the shuffle joins; nation broadcasts
    onto the customer-grain aggregate."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(dsum(_rev_col()), 4).alias("revenue"),
            F.round(F.max("c_acctbal").cast("double"), 4).alias("c_acctbal"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
