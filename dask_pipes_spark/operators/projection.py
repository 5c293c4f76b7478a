"""Group B — projection / filter / predicates (SURVEY.md §2-B).

Reference surface: Dask ``df[cols]``, ``assign``, ``rename``, ``drop``,
``astype``, boolean masks, ``isin``, ``between``, ``dropna``, ``fillna``,
``where/mask``. All map to narrow (no-shuffle) Spark transformations that
Catalyst folds into the parquet scan: projection pushdown prunes columns,
predicate pushdown skips row groups — verified by group A's explain checks.

Scale note: everything here is embarrassingly parallel (per-row, no
exchange); the only 100 TB concern is that filters/projections actually reach
the scan, which the declarative form guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load


@query(
    "b1_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def b1_project(spark, sf_dir):
    """Column selection (Dask ``df[cols]``) — pruned at the parquet scan."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query(
    "b2_derive",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price
    FROM lineitem
    """,
)
def b2_derive(spark, sf_dir):
    """Computed columns (Dask ``assign``) — per-row IEEE arithmetic, exact on
    both engines, no rounding needed."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
    )


@query(
    "b3_rename_drop",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS part_name, p_retailprice AS price
    FROM part
    """,
)
def b3_rename_drop(spark, sf_dir):
    """rename + drop (Dask ``rename``/``drop``) — pure projection rewrite."""
    return (
        load(spark, sf_dir, "part")
        .withColumnRenamed("p_partkey", "part_id")
        .withColumnRenamed("p_name", "part_name")
        .withColumnRenamed("p_retailprice", "price")
        .drop("p_brand", "p_type", "p_size")
    )


@query(
    "b4_cast",
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey AS DOUBLE) AS custkey_dbl,
           CAST(c_nationkey AS VARCHAR) AS nationkey_str,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS acctbal_floor,
           CAST(c_nationkey AS BIGINT) AS nationkey_long
    FROM customer
    """,
)
def b4_cast(spark, sf_dir):
    """dtype casts (Dask ``astype``).

    double→integer goes through explicit FLOOR: Spark's cast truncates toward
    zero while DuckDB's rounds, so a bare cast is a cross-engine trap.
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("double").alias("custkey_dbl"),
        F.col("c_nationkey").cast("string").alias("nationkey_str"),
        F.floor("c_acctbal").cast("long").alias("acctbal_floor"),
        F.col("c_nationkey").cast("long").alias("nationkey_long"),
    )


@query(
    "b5_filter_simple",
    oracle="SELECT * FROM lineitem WHERE l_quantity > 45",
)
def b5_filter_simple(spark, sf_dir):
    """Single predicate (Dask boolean mask) — pushed to parquet row groups."""
    return load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)


@query(
    "b6_filter_compound",
    oracle="""
    SELECT * FROM lineitem
    WHERE (l_returnflag = 'A' AND l_quantity > 30)
       OR (NOT l_linestatus = 'F' AND l_discount < 0.02)
    """,
)
def b6_filter_compound(spark, sf_dir):
    """Compound ``& | ~`` predicate tree."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "A") & (F.col("l_quantity") > 30))
        | (~(F.col("l_linestatus") == "F") & (F.col("l_discount") < 0.02))
    )


@query(
    "b7_isin",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def b7_isin(spark, sf_dir):
    """Membership test (Dask ``isin``). Short literal lists stay as an IN
    expression; at 100 TB a large membership set becomes a broadcast
    ``left_semi`` join instead (see c7)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "b8_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      AND l_quantity BETWEEN 10 AND 20
    """,
)
def b8_between(spark, sf_dir):
    """Range predicates (Dask ``between``) incl. timestamp bounds."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
        & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "b9_null_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0) AS disc_or_null
    FROM lineitem WHERE NULLIF(l_discount, 0) IS NOT NULL
    """,
)
def b9_null_filter(spark, sf_dir):
    """dropna over a derived nullable column (fixtures ship NULL-free, so the
    NULLs are manufactured with NULLIF — same on both engines)."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "disc_or_null", F.nullif(F.col("l_discount"), F.lit(0.0))
    )
    return li.na.drop(subset=["disc_or_null"]).select(
        "l_orderkey", "l_linenumber", "disc_or_null"
    )


@query(
    "b10_fillna",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0), -1.0) AS disc_filled
    FROM lineitem
    """,
)
def b10_fillna(spark, sf_dir):
    """fillna with per-column defaults (Dask ``fillna``) via ``na.fill``."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_filled"),
    )
    return li.na.fill({"disc_filled": -1.0})


@query(
    "b11_conditional_replace",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount)
                ELSE l_extendedprice END AS effective_price
    FROM lineitem
    """,
)
def b11_conditional_replace(spark, sf_dir):
    """where/mask / np.where (Dask) → ``F.when().otherwise()``."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(
            F.col("l_discount") > 0.05,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        )
        .otherwise(F.col("l_extendedprice"))
        .alias("effective_price"),
    )


@query(
    "b12_cut_bins",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0) / 10000.0), 0), 9)
                AS BIGINT) AS bin,
           COUNT(*) AS cnt,
           ROUND(MIN(l_extendedprice), 2) AS min_p,
           ROUND(MAX(l_extendedprice), 2) AS max_p
    FROM lineitem GROUP BY 1
    """,
)
def b12_cut_bins(spark, sf_dir):
    """Equal-width binning (pandas/Dask ``cut``): price → 10 fixed-width
    buckets with clamped edges, then per-bin counts. Pure codegen arithmetic
    — the formula (not an engine-specific ``width_bucket``) so both engines
    compute identical edges; at scale this is a map-side expression + one
    10-group agg."""
    li = load(spark, sf_dir, "lineitem")
    bin_col = (
        F.least(
            F.greatest(F.floor((F.col("l_extendedprice") - 900.0) / 10000.0), F.lit(0)),
            F.lit(9),
        )
        .cast("long")
        .alias("bin")
    )
    return (
        li.select(bin_col, "l_extendedprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("l_extendedprice"), 2).alias("min_p"),
            F.round(F.max("l_extendedprice"), 2).alias("max_p"),
        )
    )


@query(
    "b13_clip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           LEAST(GREATEST(l_extendedprice, 5000.0), 50000.0) AS price_clipped
    FROM lineitem
    """,
)
def b13_clip(spark, sf_dir):
    """``Series.clip(lower, upper)`` — pure codegen ``greatest``/``least``."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest("l_extendedprice", F.lit(5000.0)), F.lit(50000.0)).alias(
            "price_clipped"
        ),
    )


@query(
    "b14_query_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
                      * (1 - CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE), 4)
             AS net
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def b14_query_expr(spark, sf_dir):
    """String-expression front-end (Dask/pandas ``df.query`` / ``df.eval``):
    ``filter`` and ``selectExpr`` accept SQL expression strings that go
    through the same Catalyst parser/analyzer as column objects — identical
    plan, pushdown included (the predicate lands in PushedFilters). The
    ergonomic bridge for users porting pandas query-string code."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter("l_quantity > 45 AND l_returnflag = 'R'").selectExpr(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "ROUND(CAST(CAST(l_extendedprice AS DECIMAL(28,6))"
        " * (1 - CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE), 4) AS net",
    )


@query(
    "b15_qcut",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.50) AS q2,
             quantile_cont(l_quantity, 0.75) AS q3
      FROM lineitem
    )
    SELECT CASE WHEN l_quantity <= q1 THEN 0
                WHEN l_quantity <= q2 THEN 1
                WHEN l_quantity <= q3 THEN 2
                ELSE 3 END AS qbin,
           COUNT(*) AS cnt,
           MIN(l_quantity) AS min_q,
           MAX(l_quantity) AS max_q
    FROM lineitem, q
    GROUP BY 1
    """,
)
def b15_qcut(spark, sf_dir):
    """Quantile binning (pandas/Dask ``qcut(x, 4)``): exact quartile edges
    computed once over the column, every row bucketed by comparison against
    the broadcast thresholds, per-bin counts and extrema. Unlike b12's
    fixed-width ``cut``, the edges are data-dependent — the one-row quantile
    aggregate is broadcast cross-joined back (the same decorrelation shape
    as x19's scalar threshold). ``percentile`` is the exact interpolated
    quantile on both engines, and l_quantity is integer-valued, so the
    edges are bit-identical.

    100 TB: exact percentile is a full sort-based aggregate per column —
    at scale swap in ``percentile_approx`` (d20's mergeable sketch) and
    accept epsilon-rank edges; the binning pass itself is map-side only.
    """
    li = load(spark, sf_dir, "lineitem")
    q = li.agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q1"),
        F.expr("percentile(l_quantity, 0.50)").alias("q2"),
        F.expr("percentile(l_quantity, 0.75)").alias("q3"),
    )
    return (
        li.join(F.broadcast(q))
        .select(
            F.when(F.col("l_quantity") <= F.col("q1"), 0)
            .when(F.col("l_quantity") <= F.col("q2"), 1)
            .when(F.col("l_quantity") <= F.col("q3"), 2)
            .otherwise(3)
            .alias("qbin"),
            "l_quantity",
        )
        .groupBy("qbin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
        )
    )


@query(
    "b16_dropna_thresh",
    oracle="""
    SELECT event_id, value_pos, prop_k, user_mod FROM (
      SELECT event_id,
             NULLIF(GREATEST(value, 0.0), 0.0) AS value_pos,
             NULLIF(CAST(props->>'$.k' AS INTEGER), 42) AS prop_k,
             NULLIF(user_id % 7, 3) AS user_mod
      FROM events
    )
    WHERE (CASE WHEN value_pos IS NULL THEN 0 ELSE 1 END
         + CASE WHEN prop_k IS NULL THEN 0 ELSE 1 END
         + CASE WHEN user_mod IS NULL THEN 0 ELSE 1 END) >= 2
    """,
)
def b16_dropna_thresh(spark, sf_dir):
    """pandas ``dropna(thresh=2)``: keep rows with at least 2 non-null
    values across the inspected columns (b9 covers the subset/all modes;
    thresh is the counting variant). The null-count predicate is a sum of
    CASEs — row-local, codegen'd, pushed like any filter. Fixtures ship
    null-free, so the columns are the d34 NULLIF-derived trio.

    100 TB: embarrassingly parallel filter; no exchange.
    """
    ev = load(spark, sf_dir, "events")
    derived = ev.select(
        "event_id",
        F.nullif(F.greatest(F.col("value"), F.lit(0.0)), F.lit(0.0)).alias("value_pos"),
        F.nullif(F.get_json_object("props", "$.k").cast("int"), F.lit(42)).alias("prop_k"),
        F.nullif(F.col("user_id") % 7, F.lit(3)).alias("user_mod"),
    )
    nn = sum(
        F.when(F.col(c).isNull(), 0).otherwise(1)
        for c in ("value_pos", "prop_k", "user_mod")
    )
    return derived.filter(nn >= 2)


@query(
    "b17_select_dtypes",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_numeric_cols,
           'c_acctbal,c_custkey,c_nationkey' AS numeric_cols,
           CAST(SUM(CAST(c_custkey AS DECIMAL(28,6))) AS DOUBLE) AS sum_c_custkey,
           CAST(SUM(CAST(c_nationkey AS DECIMAL(28,6))) AS DOUBLE) AS sum_c_nationkey,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_c_acctbal
    FROM customer
    """,
)
def b17_select_dtypes(spark, sf_dir):
    """Schema-driven column selection (pandas/Dask
    ``df.select_dtypes('number')``): the numeric subset is discovered FROM
    THE SCHEMA at plan time — no hardcoded list — then summed per column
    so the discovery is value-verified: picking a wrong column set changes
    the emitted names AND the sums. Catalyst prunes the scan to exactly
    the discovered columns (schema metadata, zero data cost — the pandas
    idiom maps to a free projection at any scale)."""
    c = load(spark, sf_dir, "customer")
    numeric = sorted(
        name
        for name, dt in c.dtypes
        if dt in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or dt.startswith("decimal")
    )
    return c.agg(
        F.lit(len(numeric)).cast("bigint").alias("n_numeric_cols"),
        F.lit(",".join(numeric)).alias("numeric_cols"),
        *[
            F.sum(F.col(n).cast("decimal(28,6)"))
            .cast("double")
            .alias(f"sum_{n}")
            for n in sorted(numeric)
        ],
    ).select(
        "n_numeric_cols",
        "numeric_cols",
        "sum_c_custkey",
        "sum_c_nationkey",
        "sum_c_acctbal",
    )
