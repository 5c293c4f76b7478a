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

from dask_pipes_spark.registry import davg, dsum, query, sql_dsum
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
    "x4_small_quantity_revenue",
    oracle="""
    WITH thr AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                    / COUNT(*)) AS qty_thr
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / 7.0, 4) AS avg_weekly,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thr  ON thr.l_partkey = lineitem.l_partkey
    WHERE p_brand IN ('Brand#12', 'Brand#23')
      AND l_quantity < qty_thr
    """,
)
def x4_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated scalar
    subquery — "lineitems below 20% of their part's average quantity" —
    expressed as its decorrelated form, the aggregate-then-rejoin Catalyst
    itself produces for correlated subqueries. The per-part threshold table
    has part-key cardinality (tiny next to the fact table) and broadcasts;
    the threshold is a decimal-exact average so the strict-< comparison is
    bitwise identical on both engines (registry hash rules)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    thr = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(
            F.broadcast(
                t["part"].filter(F.col("p_brand").isin("Brand#12", "Brand#23"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(thr), on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 4).alias("avg_weekly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "x5_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           COUNT(*) AS n_cust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 4)
             AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def x5_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no urgent orders — a global scalar aggregate fanned onto
    every row plus a NOT EXISTS anti-join. The scalar average rides a
    broadcast cross join (one row, no collect on the driver); the anti-join
    shuffles on custkey and AQE is free to broadcast the filtered orders
    side. Decimal-exact average keeps the > comparison engine-identical."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "nation"))
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("ab"))
    )
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(dsum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@query(
    "x6_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def x6_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): outer join with
    an extra non-equi condition folded into the join predicate (NULL-extended
    rows count as zero via COUNT(col)'s null-skipping), then a second
    aggregation over the first's output. Two shuffles total: custkey join +
    count, then the tiny count-of-counts; the second input is
    customer-cardinality, so the re-agg is nearly free at any scale."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
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


@query(
    "x7_disjunctive_join",
    oracle=f"""
    SELECT ROUND({sql_dsum(_REV)}, 4) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_type = 'PROMO' AND l_quantity >= 40)
    """,
)
def x7_disjunctive_join(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive predicates across a join): an OR of
    conjunct blocks that mixes both tables' columns. Catalyst splits each
    side's common factor out of the disjunction and pushes the extracted
    single-table predicates below the join (visible as PushedFilters on
    both scans), leaving only the cross-table residual on the join — the
    rewrite engines without CNF extraction miss, turning this into a full
    cartesian filter. part broadcasts; one aggregate row comes back."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(dsum(_rev_col()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "x8_late_ship_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def x8_late_ship_orders(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): EXISTS with a correlated
    cross-table comparison (lineitem shipped >60 days after its order
    date) — a left-semi join whose condition mixes both sides, so the date
    arithmetic rides the join predicate, not a pushdown. Semi-join output
    is at most one row per order (no fan-out to dedup), shuffled on
    orderkey; the quarter filter prunes the probe side before the
    exchange."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    probe = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    return (
        probe.join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "x9_promo_revenue_share",
    oracle=f"""
    SELECT ROUND(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN " + _REV + " ELSE 0 END")}
                 / {sql_dsum(_REV)}, 6) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1996-09-01'
      AND l_shipdate <  DATE '1996-10-01'
    """,
)
def x9_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): the conditional-aggregate ratio
    — promo revenue over total revenue in one month, one pass, no second
    scan (the CASE folds the predicate into the sum). Both sums ride the
    decimal pattern so the ratio's operands are exact before the single
    float divide."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = _rev_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(100.0 * dsum(promo_rev) / dsum(rev), 6).alias("promo_pct")
        )
    )
