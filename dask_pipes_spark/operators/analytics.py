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

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import davg, dsum, query, sql_dsum
from dask_pipes_spark.session import load_tables, pin_scratch

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


@query(
    "x10_forecast_revenue",
    oracle=f"""
    SELECT ROUND({sql_dsum("l_extendedprice * l_discount")}, 4) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def x10_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): a pure scan-filter-
    aggregate with three range predicates and no join at all — the query
    every column store must win on. All three predicates reach the parquet
    scan as PushedFilters (year via shipdate bounds, the discount band,
    the quantity cap), so at 100 TB only row groups whose min/max stats
    overlap the bands are read; one partial-aggregated double comes back
    per task."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                dsum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "x11_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND({sql_dsum("volume")}, 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def x11_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by year. The same dimension table (nation) joins the fact tree
    TWICE under different roles (supplier's nation, customer's nation) —
    the aliasing case that breaks engines which resolve columns by bare
    name. Both nation copies broadcast; the pair disjunction can only be
    applied after both are attached, but each broadcast hash join emits
    rows non-materialized, so the filter still runs pipelined within the
    same stage. Grouping output is ≤ 2 pairs × years — tiny at any
    scale."""
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(dsum(_rev_col()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "x12_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND({sql_dsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {sql_dsum("volume")}, 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate <  DATE '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def x12_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): one supplier nation's share
    of revenue in a region's market for one part type, by year — an 8-way
    join (nation twice) whose numerator is a conditional aggregate over
    the SAME rows as the denominator, so the share needs one pass, not
    two plans. part (type-filtered), supplier, both nations, and region
    broadcast; the orders⋈lineitem⋈customer spine shuffles on its keys.
    The division happens once per year group after both decimal-exact
    sums."""
    t = load_tables(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_col()
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(dsum(nat_rev) / dsum(rev), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "x13_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, ROUND({sql_dsum(_REV)}, 4) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def x13_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the argmax-with-ties idiom — a
    derived revenue view consumed twice, once for its max (a scalar) and
    once as the rows filtered against that max. The revenue aggregate has
    supplier cardinality (small next to the fact table); its max rides a
    one-row broadcast cross join back onto it, so the fact table is
    scanned exactly once and nothing correlated re-executes. Equality is
    on the 4-digit-rounded decimal-exact sum, so both engines pick the
    identical winner set (ties included — which is why this can't be a
    LIMIT 1)."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(dsum(_rev_col()), 4).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "x14_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 4)
               AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def x14_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity clears a threshold, decorated with their customer — the
    aggregate-then-filter-then-rejoin pattern (HAVING over the fact grain
    feeding a dimension join). The HAVING survivor set is tiny (~0.1% of
    orders), so both the orders and customer joins run broadcast-from-the-
    aggregate side under AQE at any scale; the top-100 is TakeOrdered on
    (o_totalprice, o_orderkey) with the unique orderkey breaking price
    ties deterministically."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    qty = F.sum(F.col("l_quantity").cast("decimal(28,6)"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.round(qty.cast("double"), 4).alias("sum_qty"), qty.alias("_q"))
        .filter(F.col("_q") > 300)
        .drop("_q")
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "x15_late_priority_split",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def x15_late_priority_split(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority split, adapted: the fixtures
    carry no l_shipmode/l_commitdate, so "late" is shipdate > orderdate +
    60 days — the x8 lateness criterion — and the grouping key is
    l_returnflag): counts of late lineitems split by whether their order
    was high-priority, as two conditional counts in ONE pass. The year
    filter prunes the lineitem scan; the lateness predicate mixes both
    tables so it rides the join condition; the pivoted CASE counts avoid
    a second join or a pivot shuffle."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(
            t["lineitem"].filter(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01")
            ),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x16_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def x16_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted to the
    x8/x15 lateness criterion): late lineitems in multi-supplier finished
    orders where THIS supplier was the only late one — the classic
    EXISTS + correlated NOT EXISTS pair. Instead of two correlated
    re-scans of lineitem, the Spark plan decorrelates both quantifiers
    into ONE per-order aggregate (distinct suppliers, distinct late
    suppliers) joined back on orderkey: EXISTS ⇔ n_supp ≥ 2, NOT EXISTS
    ⇔ n_late_supp = 1 given this row is late. The per-order aggregate and
    the probe share the orderkey partitioning, so the join adds no new
    exchange; supplier broadcasts onto the count."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem", "orders"))
    lo = (
        t["lineitem"]
        .join(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn(
            "late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        lo.filter(F.col("late"))
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            on="l_orderkey",
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "x17_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_price) AS best_price FROM unit
      GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           ROUND(unit_price, 4) AS unit_price
    FROM unit
    JOIN best ON best.l_partkey = unit.l_partkey
             AND unit.unit_price = best.best_price
    JOIN part     ON p_partkey = unit.l_partkey
    JOIN supplier ON s_suppkey = unit.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def x17_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier), adapted to the fixture star
    (no partsupp table — supply cost is derived as the minimum observed
    unit price ``l_extendedprice / l_quantity`` per part×supplier within
    the EUROPE region). The correlated MIN subquery of the original is
    decorrelated the same way Q2 planners do it: aggregate once per part,
    rejoin on (partkey, price == min). Both the unit-price table and its
    per-part min share the partkey shuffle, so the rejoin adds no new
    exchange; part/supplier/nation are broadcast onto the result. Unit
    price is a single IEEE double division — bit-identical on both
    engines, so the equality join is hash-safe.

    100 TB: the per-(part,supplier) aggregate is the reduction step (fact
    rows → |part×supp| pairs) and everything after operates on dimension
    cardinality; no full-fact rejoin appears anywhere.
    """
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region")
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit = (
        t["lineitem"]
        .join(eu_supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = (
        unit.groupBy("l_partkey")
        .agg(F.min("unit_price").alias("best_price"))
        .withColumnRenamed("l_partkey", "best_partkey")
    )
    return (
        unit.join(
            best,
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .drop("best_partkey")
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_type") == "LARGE")
                    & F.col("p_size").between(10, 20)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(eu_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("unit_price", 4).alias("unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "x18_product_profit",
    oracle=f"""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           ROUND({sql_dsum("l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity")}, 4) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def x18_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit measure), adapted: with no
    partsupp.ps_supplycost in the fixtures, unit cost is proxied as 10%
    of ``p_retailprice``, so profit = revenue − qty·0.1·retail. The plan
    is the Q9 classic: name-filtered part broadcast-pruned into the fact
    scan FIRST (the most selective reduction), then supplier and orders
    joined on their keys, nation broadcast last, two-level grouping
    (nation × order-year) above the join tree.

    100 TB: part filter reduces the fact side before any wide join; the
    only big shuffles are lineitem⋈orders on orderkey and the final
    aggregate exchange on (nation, year) — both AQE-coalesced.
    """
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "orders", "nation")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").like("%widget%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(dsum(amount), 4).alias("profit"))
    )


@query(
    "x19_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {sql_dsum("l_extendedprice")} AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(part_value, 4) AS part_value
    FROM pv
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM pv)
    ORDER BY part_value DESC, p_partkey
    """,
)
def x19_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification), adapted: part
    "inventory value" is the summed extended price of its lineitems
    supplied from two fixed nations (no partsupp availqty/supplycost).
    The HAVING-against-global-scalar is the interesting bit: the scalar
    (0.1% of total value) is a one-row aggregate of the SAME per-part
    aggregate, broadcast cross-joined back — the per-part table is
    computed once and reused for both sides of the comparison (Catalyst
    reuses the exchange, no second fact scan).

    100 TB: the threshold side collapses to one row before the
    cross join, so the "correlated scalar" costs one broadcast of 8
    bytes; skew-free because the per-part aggregate already reduced
    the data to dimension cardinality.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    pv = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["supplier"]
                .join(
                    F.broadcast(
                        t["nation"].filter(
                            F.col("n_name").isin("NATION_3", "NATION_7")
                        )
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("part_value"))
    )
    thr = pv.agg((F.sum("part_value") * 0.001).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("part_value", 4).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "x20_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def x20_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship), adapted: the
    supplier×part association comes from distinct lineitem pairs (no
    partsupp), and the original's complaint-comment NOT IN blacklist
    becomes the negative-balance suppliers. The NOT IN is a broadcast
    left-anti join (the blacklist is tiny); part attributes arrive by
    broadcast; COUNT(DISTINCT suppkey) above a (brand,type,size) grouping
    runs as Spark's two-phase distinct-aggregate Expand.

    100 TB: distinct (part,supp) pairs is the fact reduction; NOT IN via
    anti-join stays broadcast as long as the blacklist is dimension-sized
    (NOT IN with NULLs is a semantic trap — s_suppkey is non-null here,
    and the anti-join encodes exactly that case).
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    sp = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    blacklist = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        sp.join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "MEDIUM")
                    & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "x21_dominant_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT shipped.l_suppkey
      FROM shipped
      JOIN part_total ON part_total.l_partkey = shipped.l_partkey
      JOIN part       ON p_partkey = shipped.l_partkey
      WHERE p_name LIKE 'small%'
        AND shipped.qty > 0.5 * part_total.total_qty
    )
    ORDER BY s_suppkey
    """,
)
def x21_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion), adapted: with no
    partsupp.ps_availqty, the >half-of-shipped-quantity test becomes
    "this supplier alone shipped more than half of the part's 1996
    volume" — same nested-aggregate-inside-IN structure. The IN becomes
    a left-semi join into supplier after the inner query reduces to a
    distinct suppkey set; the inner query itself is the Q20 double
    aggregate: per-(part,supp) quantity, re-aggregated per part, rejoined
    on the shared partkey partitioning (one exchange, reused).

    100 TB: the date filter is pushed to the parquet scan (row-group
    pruning on l_shipdate); both aggregates and the rejoin share the
    partkey shuffle; the semi-join probe side is dimension-sized.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("qty"))
    )
    # shipped feeds the part totals AND the dominant join — the scratch-
    # parquet pin runs the fact filter+aggregate once and keeps both
    # consumers' plans audit-visible (round 12; was a localCheckpoint)
    shipped = pin_scratch(shipped, "dps_x21_shipped")
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(part_total, on="l_partkey")
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "x22_topk_with_ties",
    oracle="""
    SELECT c_mktsegment, price_bucket, o_orderkey, rnk FROM (
      SELECT c_mktsegment,
             CAST(FLOOR(o_totalprice / 10000) * 10000 AS DOUBLE) AS price_bucket,
             o_orderkey,
             CAST(RANK() OVER (PARTITION BY c_mktsegment
                  ORDER BY FLOOR(o_totalprice / 10000) DESC) AS INTEGER) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rnk <= 3
    """,
)
def x22_topk_with_ties(spark, sf_dir):
    """Top-k WITH TIES (ANSI ``FETCH FIRST k ROWS WITH TIES`` / the iceberg
    query): per market segment, every order in the top-3 price BUCKETS —
    ``RANK`` over a coarsened measure keeps all tied rows, where e10/f2's
    ``row_number`` would arbitrarily cut within a tie (a correctness trap
    for leaderboards; ties must be decided by the measure, not partition
    luck). Spark 4 plans a ``WindowGroupLimit`` below the filter for rank
    functions too, so per-partition pruning still applies before the full
    window — the same top-k pushdown f2 gets.

    100 TB: one keyed exchange; WindowGroupLimit caps per-key buffered
    rows at the tie boundary instead of materializing whole partitions.
    """
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    joined = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    bucket = F.floor(F.col("o_totalprice") / 10000)
    w = Window.partitionBy("c_mktsegment").orderBy(bucket.desc())
    return (
        joined.select(
            "c_mktsegment",
            (bucket * 10000).cast("double").alias("price_bucket"),
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "x23_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT c_custkey AS k, c_acctbal, 0 AS depth
      FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, c.c_acctbal, x.depth + 1
      FROM (SELECT unnest([t.k * 2, t.k * 2 + 1]) AS child, t.depth
            FROM tree t) x
      JOIN customer c ON c.c_custkey = x.child
    )
    SELECT depth, COUNT(*) AS n_nodes,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS depth_bal
    FROM tree GROUP BY depth
    """,
)
def x23_recursive_hierarchy(spark, sf_dir):
    """Recursive CTE (``WITH RECURSIVE`` — new in Spark 4, closing the
    last classic ANSI-SQL gap vs warehouse engines): BFS over the implicit
    binary hierarchy child = parent·2 / parent·2+1 rooted at customer 1,
    joined against the customer table at every level, rolled up per depth.
    The fixpoint loop IS the query — no driver-side iteration (contrast
    l18/l29, which hand-roll the loop with localCheckpoint because they
    predate the feature and need per-round lineage control).

    100 TB: each level EXPLODES the frontier's child ids and equi-joins
    them (never an OR/theta condition, which would plan as a nested loop)
    — the same per-round plan an iterative driver loop would build, but
    planned as one operator;
    depth here is log2(|customer|) ≈ 14 levels. CYCLIC graphs stay on
    l18's hand-rolled loop: Spark 4.1 rejects UNION-dedup recursion
    ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE], probed), and UNION ALL
    diverges on cycles — the fixpoint must dedup to terminate.
    """
    t = load_tables(spark, sf_dir, ("customer",))
    t["customer"].createOrReplaceTempView("dps_cust_rec")
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT c_custkey AS k, c_acctbal, 0 AS depth
          FROM dps_cust_rec WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, c.c_acctbal, x.depth + 1
          FROM (SELECT explode(array(t.k * 2, t.k * 2 + 1)) AS child, t.depth
                FROM tree t) x
          JOIN dps_cust_rec c ON c.c_custkey = x.child
        )
        SELECT depth, COUNT(*) AS n_nodes,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS depth_bal
        FROM tree GROUP BY depth
        """
    )


@query(
    "x24_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(s1.user_id) AS BIGINT) AS n_signup,
           CAST(COUNT(s2.user_id) AS BIGINT) AS n_clicked_after,
           CAST(COUNT(s3.user_id) AS BIGINT) AS n_purchased_after
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def x24_event_funnel(spark, sf_dir):
    """Ordered event funnel (product-analytics sequence matching:
    signup → later click → later purchase): stage k's timestamp is the
    MIN event time strictly after stage k−1's, per user — three
    dimension-sized aggregate passes, each joining the (user, t_k) frame
    back onto the event stream. The funnel COUNTS how many users reach
    each stage in order; out-of-order events (purchase before signup)
    correctly don't qualify.

    100 TB: pass 1 shuffles user-grain aggregates; passes 2-3 join a
    user-cardinality frame back to the fact — each reuses the user_id
    partitioning, and the event scan is filtered to one type per pass at
    the source. The alternative single-pass form (sort per user +
    ``aggregate()`` over the struct sequence) trades the two rejoins for
    one per-user sort; both are linear — this form keeps every step
    SQL-oracle-checkable.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    # each stage frame feeds the next stage AND the final count join —
    # scratch-parquet pins (round 12: audit-visible) run each stage's
    # event filter once, not once per consumer
    s1 = pin_scratch(
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1")),
        "dps_x24_s1",
    )
    s2 = pin_scratch(
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2")),
        "dps_x24_s2",
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_signup"),
            F.count("t2").alias("n_clicked_after"),
            F.count("t3").alias("n_purchased_after"),
        )
    )


@query(
    "x25_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(date_diff('week', c.cohort_week,
                            date_trunc('week', e.ts)) AS INTEGER) AS week_n
      FROM events e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT cohort_week, week_n,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_week, week_n
    """,
)
def x25_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix (the canonical growth-analytics query):
    users are cohorted by the week of their FIRST event; each later active
    week increments (cohort_week, weeks_since) by distinct user. Weeks are
    date_trunc'd calendar weeks and the offset is whole-week differences —
    both pinned identically on the two engines (ISO Monday weeks).

    100 TB: cohorting is one user-grain aggregate; the activity matrix
    reuses the user_id partitioning for the join and dedups at
    (user, cohort, week) grain BEFORE the final count — the distinct is
    the only fact-scale shuffle, bounded by users × active weeks, not
    events.
    """
    e = load_tables(spark, sf_dir, ("events",))["events"]
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@query(
    "x26_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
               / CAST(SUM(revenue) OVER () AS DOUBLE) AS cum_share
      FROM rev
    )
    SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(revenue) AS DECIMAL(28,6)) AS DOUBLE) AS class_revenue
    FROM ranked GROUP BY 1
    """,
)
def x26_pareto_abc(spark, sf_dir):
    """Pareto / ABC classification (the 80-20 inventory analysis): parts
    ranked by revenue, classed by CUMULATIVE revenue share (A = first 50%
    of revenue, B = to 80%, C = tail), then rolled up per class. The
    running share is an ordered window over the part-grain aggregate —
    revenue stays DECIMAL through both window sums (numerator and the
    whole-partition denominator), so the division is one IEEE op per row
    and the class boundaries are engine-identical (ties broken by partkey
    per §7.6.3).

    100 TB: the fact table reduces to part grain FIRST (one shuffle); the
    ranking window runs over dimension cardinality. An unpartitioned
    ordered window over parts is the honest cost of a global ranking —
    ~200k parts at TPC-H scale, trivially one task; for billion-key
    rankings switch to the f2 top-k or bucketed percentile approach.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        )
        .cast("decimal(28,6)")
        .alias("revenue")
    )
    w_run = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "revenue",
        (
            F.sum("revenue").over(w_run).cast("double")
            / F.sum("revenue").over(w_all).cast("double")
        ).alias("cum_share"),
    )
    abc = (
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
    )
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").cast("decimal(28,6)").cast("double").alias("class_revenue"),
    )


@query(
    "x27_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM items
    ),
    part_supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS supp FROM items
      GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS pair_count
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, pair_count,
           FLOOR(pair_count * n / (sa.supp * sb.supp) * 10000 + 0.5) / 10000
             AS lift
    FROM pairs
    JOIN part_supp sa ON part_a = sa.l_partkey
    JOIN part_supp sb ON part_b = sb.l_partkey
    CROSS JOIN n_orders
    """,
)
def x27_market_basket(spark, sf_dir):
    """Market-basket affinity (association mining's support/lift core):
    part pairs co-purchased in the same order, with lift =
    P(a,b)/(P(a)·P(b)) — >1 means genuinely bought together, not just
    individually popular. The pair space is generated by a SELF-EQUI-JOIN
    on the order key over the distinct (order, part) grain with a<b
    ordering (each pair once), then support tables and the order count
    broadcast back; ≥2-support floor keeps the pair list at signal
    density. FLOOR-quantized lift (§7.6.2).

    100 TB shape (the round-2 rework, was a distinct + self-equi-join):
    ONE groupBy(order) builds each basket as a sorted set, pair candidates
    are expanded MAP-SIDE from the array (Σ C(basket_size, 2) rows —
    quadratic in basket size, linear in orders; TPC-H: ~4 lines ⇒ ≤6
    pairs/order; giant baskets need a per-order cap), and the Apriori
    downward-closure prune — a pair can only reach pair_count ≥ 2 if BOTH
    parts appear in ≥ 2 baskets — is applied by BROADCAST joins against
    the frequent-1-itemset BEFORE the pair shuffle, which also attaches
    the supports, so nothing joins after the aggregation. Shuffle
    exchanges: basket build, support count, pair count — three, all keyed.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    # three consumers (order count, supports, pair expansion) — the
    # scratch-parquet pin runs the basket shuffle once and keeps every
    # consumer's plan audit-visible (round 12; was a localCheckpoint)
    baskets = pin_scratch(baskets, "dps_x27_baskets")
    n_orders = baskets.agg(F.count(F.lit(1)).cast("double").alias("n"))
    part_supp = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("double").alias("supp"))
    )
    fsupp = part_supp.filter(F.col("supp") >= 2)
    # map-side pair expansion: sorted set ⇒ part_a < part_b by slicing
    # the tail of the array per element (each unordered pair exactly once)
    pair_arr = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(
                    "parts", i + 2, F.greatest(F.size("parts") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    exploded = baskets.select(F.explode(pair_arr).alias("p")).select(
        "p.part_a", "p.part_b"
    )
    sa = fsupp.select(
        F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a")
    )
    sb = fsupp.select(
        F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b")
    )
    pairs = (
        exploded.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).alias("pair_count"),
            F.first("supp_a").alias("supp_a"),
            F.first("supp_b").alias("supp_b"),
        )
        .filter(F.col("pair_count") >= 2)
    )
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            (
                F.floor(
                    F.col("pair_count")
                    * F.col("n")
                    / (F.col("supp_a") * F.col("supp_b"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("lift"),
        )
    )


@query(
    "x28_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(YEAR(l_shipdate) AS INTEGER) AS yr,
             CAST(MONTH(l_shipdate) AS INTEGER) AS mo,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY 1, 2
    )
    SELECT yr, mo, revenue,
           LAG(revenue, 12) OVER (ORDER BY yr, mo) AS revenue_prior_year,
           FLOOR((revenue / LAG(revenue, 12) OVER (ORDER BY yr, mo) - 1)
                 * 10000 + 0.5) / 10000 AS yoy_growth
    FROM monthly
    """,
)
def x28_yoy_growth(spark, sf_dir):
    """Year-over-year growth (the reporting staple): monthly revenue with
    the same-month-prior-year comparison as a 12-step LAG over the
    calendar-ordered month series, growth FLOOR-quantized (§7.6.2); the
    first year has no prior and reports NULL, not zero (the honest
    reporting contract). e19 is the per-entity event-level pct_change;
    this is its calendar-grain, fixed-offset sibling. The 12-LAG form
    assumes a dense month series — the fixtures ship every month; gappy
    calendars take e14's grid-fill first.

    100 TB: the fact table reduces to ≤ years×12 rows before the window —
    the unpartitioned LAG runs over a reporting-grain frame, which is the
    correct (and trivial) cost.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    monthly = li.groupBy(
        F.year("l_shipdate").alias("yr"), F.month("l_shipdate").alias("mo")
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("yr", "mo")
    prior = F.lag("revenue", 12).over(w)
    return monthly.select(
        "yr",
        "mo",
        "revenue",
        prior.alias("revenue_prior_year"),
        (
            F.floor((F.col("revenue") / prior - 1) * 10000 + F.lit(0.5)) / 10000
        ).alias("yoy_growth"),
    )


@query(
    "x29_ab_ztest",
    oracle="""
    WITH armed AS (
      SELECT CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS arm,
             value
      FROM events
    ),
    s AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
        CAST(SUM(CASE WHEN arm = 0 THEN CAST(value AS DECIMAL(28,6)) END)
             AS DOUBLE) AS sa,
        CAST(SUM(CASE WHEN arm = 1 THEN CAST(value AS DECIMAL(28,6)) END)
             AS DOUBLE) AS sb,
        CAST(SUM(CASE WHEN arm = 0 THEN CAST(value * value AS DECIMAL(38,12)) END)
             AS DOUBLE) AS qa,
        CAST(SUM(CASE WHEN arm = 1 THEN CAST(value * value AS DECIMAL(38,12)) END)
             AS DOUBLE) AS qb
      FROM armed
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           FLOOR(sa / na * 10000 + 0.5) / 10000 AS mean_a,
           FLOOR(sb / nb * 10000 + 0.5) / 10000 AS mean_b,
           FLOOR((sb / nb - sa / na) * 10000 + 0.5) / 10000 AS lift,
           FLOOR((sb / nb - sa / na)
                 / SQRT(((qa - sa * sa / na) / (na - 1)) / na
                        + ((qb - sb * sb / nb) / (nb - 1)) / nb)
                 * 10000 + 0.5) / 10000 AS z_score,
           ABS((sb / nb - sa / na)
               / SQRT(((qa - sa * sa / na) / (na - 1)) / na
                      + ((qb - sb * sb / nb) / (nb - 1)) / nb)) > 1.96
             AS significant
    FROM s
    """,
)
def x29_ab_ztest(spark, sf_dir):
    """Two-sample Welch z-test over a hash-randomized A/B split — the
    experiment-analysis primitive a training/product pipeline runs daily.
    Users are assigned to arms by the PORTABLE md5-60bit digest of
    ``'ab:'||user_id`` (user-level randomization — all of a user's events
    land in one arm, the unit-of-randomization rule), and the z statistic
    uses Welch's unequal-variance form from one-pass sum/sum-of-squares
    moments. Every moment rides the decimal-sum discipline, so mean/lift/z
    are exact cross-engine matches after FLOOR quantization (§7.6.2).

    100 TB: a single partial+final aggregate over the fact table — six
    conditional sums, no join, no second pass (the textbook one-pass
    variance identity) — and a 1-row result. Per-experiment/per-metric
    variants just add group keys; CUPED or stratified adjustments bolt on
    as extra covariate moments in the same pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    arm = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(2),
    )
    v = F.col("value")
    s = ev.select(arm.alias("arm"), "value").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == 0, v.cast("decimal(28,6)")))
        .cast("double")
        .alias("sa"),
        F.sum(F.when(F.col("arm") == 1, v.cast("decimal(28,6)")))
        .cast("double")
        .alias("sb"),
        F.sum(F.when(F.col("arm") == 0, (v * v).cast("decimal(38,12)")))
        .cast("double")
        .alias("qa"),
        F.sum(F.when(F.col("arm") == 1, (v * v).cast("decimal(38,12)")))
        .cast("double")
        .alias("qb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("na")) / (
        F.col("na") - 1
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb")) / (
        F.col("nb") - 1
    )
    z = (mb - ma) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return s.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        q4(ma).alias("mean_a"),
        q4(mb).alias("mean_b"),
        q4(mb - ma).alias("lift"),
        q4(z).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "x30_seasonal_r2",
    oracle="""
    WITH e AS (SELECT event_type, HOUR(ts) AS hr, value FROM events),
    prof AS (
      SELECT event_type, hr,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
               AS hr_mean
      FROM e GROUP BY 1, 2
    ),
    j AS (
      SELECT e.event_type, e.value, e.value - p.hr_mean AS resid
      FROM e JOIN prof p ON e.event_type = p.event_type AND e.hr = p.hr
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(resid * resid AS DECIMAL(38,12))) AS DOUBLE) AS sr
      FROM j GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           FLOOR((sq - sv * sv / n) / n * 10000 + 0.5) / 10000 AS var_total,
           FLOOR(sr / n * 10000 + 0.5) / 10000 AS var_resid,
           FLOOR((1 - sr / (sq - sv * sv / n)) * 10000 + 0.5) / 10000 AS r2
    FROM agg
    """,
)
def x30_seasonal_r2(spark, sf_dir):
    """Hour-of-day seasonal decomposition (lite): fit the 24-bucket seasonal
    profile per event type, subtract it, and report how much variance the
    profile explains (R² = 1 − SS_resid/SS_total) — the first question any
    time-series monitoring asks before alerting on "anomalies" that are
    just rush hour. The profile is a ≤ types×24-row table joined back by
    broadcast; totals and residual sums use the one-pass decimal-sum
    moments, so var/R² match DuckDB exactly after FLOOR quantization.

    100 TB: two passes over the fact — one partial+final agg for the
    profile (bounded output), one broadcast-join + agg for the residuals —
    both map-side-combinable, no fact-side shuffle at all since the
    profile side is the one that moves (it is tiny). The same shape fits
    day-of-week or month seasonality by swapping the bucket expression."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    e = ev.select("event_type", F.hour("ts").alias("hr"), "value")
    prof = e.groupBy("event_type", "hr").agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("hr_mean")
    )
    j = e.join(F.broadcast(prof), ["event_type", "hr"]).select(
        "event_type",
        "value",
        (F.col("value") - F.col("hr_mean")).alias("resid"),
    )
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sq"),
        F.sum((F.col("resid") * F.col("resid")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sr"),
    )
    sstot = F.col("sq") - F.col("sv") * F.col("sv") / F.col("n")
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        q4(sstot / F.col("n")).alias("var_total"),
        q4(F.col("sr") / F.col("n")).alias("var_resid"),
        q4(1 - F.try_divide(F.col("sr"), sstot)).alias("r2"),  # sstot=0 on 1-row input
    )


@query(
    "c25_temporal_dim_join",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             ROW_NUMBER() OVER w AS version,
             value AS state_value,
             ts AS valid_from,
             LEAD(ts) OVER w AS valid_to
      FROM events WHERE event_type = 'click'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p.event_id, p.user_id, p.ts,
           d.version, d.state_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN dim d
      ON p.user_id = d.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
)
def c25_temporal_dim_join(spark, sf_dir):
    """Point-in-time (temporal) join of a fact stream to an SCD Type-2
    dimension — the correctness rule every warehouse join to a versioned
    dimension must obey: each purchase joins the click-state version whose
    ``[valid_from, valid_to)`` interval contains the purchase timestamp,
    never the current version (that leaks the future into training
    features). The dimension is e16's interval build (ROW_NUMBER + LEAD in
    one window pass); purchases with no prior version keep NULLs (LEFT
    join — the honest "no state yet" answer). Intervals partition time per
    user, so each purchase matches at most one version and row count is
    exactly the purchase count (asserted by the oracle's row cardinality).

    100 TB: the join is equi-keyed on user_id — the interval predicate
    filters within a user's (small, bounded) version list after the hash
    match, so this shuffles exactly like a plain user-keyed join; no
    range-join blowup. If a single user's version count were pathological,
    c11's as-of machinery (sort + last-value-before) is the drop-in
    replacement with the same semantics for closed intervals."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("d_user"),
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("version"),
            F.col("value").alias("state_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return p.join(dim, cond, "left").select(
        "event_id", "user_id", "ts", "version", "state_value"
    )


@query(
    "x31_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             FLOOR(EPOCH(MAX(ts))) - FLOOR(EPOCH(MIN(ts))) AS duration_s,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM sessioned GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           FLOOR(SUM(n_events) / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5)
             / 10000 AS avg_events,
           FLOOR(CAST(SUM(CAST(duration_s AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS avg_duration_s,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           FLOOR(SUM(converted) / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5)
             / 10000 AS conversion_rate
    FROM sess
    """,
)
def x31_session_stats(spark, sf_dir):
    """Gap-based sessionization + per-session product analytics: a new
    session starts after a >30-minute silence (LAG + cumulative-sum
    session-id assignment — the relational sessionizer, complementary to
    k3's ``session_window``), then every session is scored (events, span,
    value, bounce, conversion) and rolled up to the funnel numbers a
    product team actually reads: average depth, dwell time, bounce count,
    session→purchase conversion rate. LAG and the session-id cumsum share
    one (user_id, ts) window ordering, so the whole assignment is one
    shuffle + one sorted pass.

    100 TB: sessionization shuffles each event exactly once (by user), the
    per-session rollup reuses the same clustering (no second fact
    shuffle), and the final funnel aggregate is bounded — the same plan a
    warehouse sessionizer ships. The streaming twin is k10 (session window
    with watermark state eviction)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessioned = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    sess = sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_value"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        q4(F.sum("n_events") / F.count(F.lit(1)).cast("double")).alias(
            "avg_events"
        ),
        q4(
            F.sum(F.col("duration_s").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_duration_s"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        q4(F.sum("converted") / F.count(F.lit(1)).cast("double")).alias(
            "conversion_rate"
        ),
    )


@query(
    "x32_rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    rfm AS (
      SELECT o_custkey,
             FLOOR(EPOCH(MIN(a.mx)) - EPOCH(MAX(o_orderdate))) AS recency_s,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
               AS monetary
      FROM orders CROSS JOIN anchor a
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY recency_s ASC, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
             monetary
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           FLOOR(CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def x32_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation — the marketing-analytics staple: per
    customer, Recency (seconds since last order, against the corpus-max
    anchor date so the result is reproducible), Frequency (order count)
    and Monetary (decimal-exact lifetime value), each quartiled with NTILE
    into a 4×4×4 segment cube, rolled up to segment sizes and average
    value. Every NTILE rides a (metric, custkey) total order so quartile
    boundaries are deterministic; the recency anchor is a 1-row broadcast.

    100 TB: the per-customer rollup is one fact shuffle; the three NTILEs
    run over the CUSTOMER-grain table (orders-of-magnitude smaller), and
    an unpartitioned NTILE at extreme customer counts swaps for the d7
    percentile-bucket pattern (global quantile cutoffs + broadcast
    thresholds) with identical segment semantics."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    rfm = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            (
                F.unix_timestamp(F.min("mx"))
                - F.unix_timestamp(F.max("o_orderdate"))
            ).alias("recency_s"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.col("recency_s").asc(), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m_score"),
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        q4(
            F.sum(F.col("monetary").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_monetary"),
    )
