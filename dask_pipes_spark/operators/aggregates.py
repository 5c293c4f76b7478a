"""Group D — aggregations (SURVEY.md §2-D).

Reference surface: Dask ``df.groupby(keys).agg/...``, apply-concat-apply
partial+final aggregation. Spark expresses the same thing natively:
``HashAggregate(partial) → Exchange → HashAggregate(final)`` with map-side
combine, and AQE coalesces output partitions — nothing to hand-schedule.

Scale notes (100 TB): every groupBy here shuffles only the *aggregated*
(map-side-combined) rows; group-key cardinality, not input size, dictates
exchange volume. Skewed keys are covered by AQE skew handling; no collect().

Hash-stability: all float aggregates use the decimal-sum pattern from
:mod:`dask_pipes_spark.registry` (exact, order-insensitive); var/corr/cov are
derived from decimal sums with deterministic double arithmetic rather than
engine-native streaming algorithms, so Spark and DuckDB match bitwise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import davg, dsum, query, sql_davg, sql_dsum
from dask_pipes_spark.session import load


@query(
    "d1_agg_global",
    oracle=f"""
    SELECT {sql_dsum('l_quantity')} AS sum_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS cnt,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
    FROM lineitem
    """,
)
def d1_agg_global(spark, sf_dir):
    """Whole-table sum/avg/min/max/count (Dask ``df.x.sum()`` etc.)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_linenumber").cast("long").alias("sum_linenumber"),
    )


@query(
    "d2_groupby_sum",
    oracle=f"""
    SELECT l_returnflag, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d2_groupby_sum(spark, sf_dir):
    """Single-key grouped sum (Dask ``groupby(k).x.sum()``)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(dsum("l_quantity").alias("sum_qty"))


@query(
    "d3_groupby_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d3_groupby_multi(spark, sf_dir):
    """TPC-H Q1-shaped multi-key multi-agg — the engine's flagship query.

    Catalyst plans partial aggregation before the exchange (the ACA pattern
    Dask spells ``split_every``), so the shuffle carries 6 groups, not 60k
    rows — the plan that survives 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
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


@query(
    "d4_group_count_distinct",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d4_group_count_distinct(spark, sf_dir):
    """Per-group nunique (Dask ``groupby.nunique``) — expand+two-phase agg in Spark."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@query(
    "d5_approx_count_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_10pct
    FROM lineitem
    """,
)
def d5_approx_count_distinct(spark, sf_dir):
    """HLL approx nunique (Dask ``nunique_approx``). Full oracle since
    round 4 via the tolerance-verdict contract (the d42-d45 discipline
    applied to the engine-internal sketch): the HLL++ estimate itself is
    engine-specific and NOT emitted; instead the frame emits the exact
    count plus a data-derived verdict that the estimate landed within 5x
    the configured rsd (0.02 → 10%). The oracle recomputes the exact count
    and pins the verdict TRUE — if Spark's sketch ever drifted out of
    tolerance the hash check goes red, so the accuracy claim is itself
    correctness-gated (previously only a local test)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("within_10pct"),
    )


# var/std via exact decimal sums: var_samp = (sxx - sx^2/n) / (n-1), computed
# with one deterministic double expression per group on both engines.
_VAR_SQL = (
    "(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE)"
    " - CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)"
    " * CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))"
    " / (COUNT(*) - 1)"
)


@query(
    "d6_group_stats",
    oracle=f"""
    SELECT l_returnflag,
           {_VAR_SQL} AS var_qty,
           SQRT({_VAR_SQL}) AS std_qty,
           MIN_BY(l_extendedprice,
                  (l_orderkey * 100 + l_linenumber) * 100000000
                  + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS first_price,
           MAX_BY(l_extendedprice,
                  (l_orderkey * 100 + l_linenumber) * 100000000
                  + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS last_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d6_group_stats(spark, sf_dir):
    """Per-group var/std/first/last (Dask ``groupby.var/std/first/last``).

    first/last need a deterministic total order, and the fixture's
    (orderkey, linenumber) is NOT unique (duplicate pairs exist at
    sf0.001) — so the ordering key is one exact bigint packing
    (rowkey, cents(price)): rowkey·1e8 + round(price·100), identical
    integer arithmetic on both engines, price as the final tiebreaker.
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(28,6)")
    qq = (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,6)")
    n = F.count(F.lit(1))
    sx = F.sum(q).cast("double")
    sxx = F.sum(qq).cast("double")
    # try_divide: a 1-row group has (n-1)=0; DuckDB's x/0 is NULL, ANSI
    # Spark would throw (1-row sweep, round 3) — NULL matches the oracle
    var = F.try_divide(sxx - sx * sx / n, n - 1)
    rowkey = (F.col("l_orderkey") * 100 + F.col("l_linenumber")) * 100000000 + F.round(
        F.col("l_extendedprice") * 100
    ).cast("long")
    return li.groupBy("l_returnflag").agg(
        var.alias("var_qty"),
        F.sqrt(var).alias("std_qty"),
        F.min_by("l_extendedprice", rowkey).alias("first_price"),
        F.max_by("l_extendedprice", rowkey).alias("last_price"),
    )


@query(
    "d7_quantile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90,
           ROUND(QUANTILE_CONT(l_quantity, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d7_quantile(spark, sf_dir):
    """Exact interpolated percentiles (Dask ``quantile``; Spark ``percentile``).

    Both engines use the linear-interpolation (type-7) definition; results are
    rounded(4) on both sides because the interpolation arithmetic is float.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "d8_having",
    oracle=f"""
    SELECT l_partkey, {sql_dsum('l_quantity')} AS total_qty, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_partkey
    HAVING COUNT(*) >= 3 AND {sql_dsum('l_quantity')} > 50
    """,
)
def d8_having(spark, sf_dir):
    """Post-aggregation filter (HAVING) — plain ``.agg().filter()`` in Spark."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(dsum("l_quantity").alias("total_qty"), F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("cnt") >= 3) & (F.col("total_qty") > 50))
    )


@query(
    "d9_value_counts",
    oracle="""
    SELECT o_orderpriority AS value, COUNT(*) AS count
    FROM orders GROUP BY o_orderpriority
    """,
)
def d9_value_counts(spark, sf_dir):
    """Frequency table (Dask/pandas ``value_counts``)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("value")).agg(
        F.count(F.lit(1)).alias("count")
    )


@query(
    "d10_collect_list",
    oracle="""
    SELECT o_custkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey)), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def d10_collect_list(spark, sf_dir):
    """Per-group list aggregation (Dask ``groupby.agg(list)``).

    ``sort_array`` makes the list deterministic; the list is emitted as a
    comma-joined string so both engines hash the same scalar representation.
    """
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("o_orderkey")).cast("array<string>"), ","
        ).alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# corr/cov from exact decimal sums (same determinism rationale as d6).
_SX = "CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)"
_SY = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)"
_SXY = "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)"
_SXX = "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE)"
_SYY = "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)"


@query(
    "d11_corr_cov",
    oracle=f"""
    SELECT l_returnflag,
           ({_SXY} - {_SX} * {_SY} / COUNT(*)) / (COUNT(*) - 1) AS cov_qty_price,
           ROUND(({_SXY} - {_SX} * {_SY} / COUNT(*))
             / SQRT(({_SXX} - {_SX} * {_SX} / COUNT(*))
                  * ({_SYY} - {_SY} * {_SY} / COUNT(*))), 8) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d11_corr_cov(spark, sf_dir):
    """Sample covariance / Pearson correlation (Dask ``df.corr/cov``)."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sx = F.sum(x.cast(dec)).cast("double")
    sy = F.sum(y.cast(dec)).cast("double")
    sxy = F.sum((x * y).cast(dec)).cast("double")
    sxx = F.sum((x * x).cast(dec)).cast("double")
    syy = F.sum((y * y).cast(dec)).cast("double")
    cov = F.try_divide(sxy - sx * sy / n, n - 1)  # NULL on 1-row groups (DuckDB x/0 parity)
    # rounded(8): the final divide/sqrt chain differs by ~2 ulp across engines
    corr = F.round(
        F.try_divide(
            sxy - sx * sy / n,
            F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
        ),
        8,
    )
    return li.groupBy("l_returnflag").agg(
        cov.alias("cov_qty_price"), corr.alias("corr_qty_price")
    )


@query(
    "d12_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def d12_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals — Spark-native extension (Dask has none)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )


@query(
    "d13_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def d13_cube(spark, sf_dir):
    """CUBE with grouping_id — Spark-native extension (Dask has none)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "d14_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d14_pivot(spark, sf_dir):
    """pivot_table (Dask/pandas) → ``groupBy().pivot(col, values).agg()``.

    Pivot values are enumerated explicitly ('O','F') so Spark skips the extra
    distinct-values job — the 100 TB-safe form.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@query(
    "d15_melt",
    oracle="""
    SELECT p_partkey, var, val FROM (
      SELECT p_partkey, 'p_size' AS var, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS var, p_retailprice AS val FROM part
    )
    """,
)
def d15_melt(spark, sf_dir):
    """melt / wide→long (Dask ``dd.melt``) → Spark ``unpivot`` (≥3.4)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "var", "val")


@query(
    "d16_describe",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(l_quantity) AS cnt,
           CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                / COUNT(l_quantity) AS DECIMAL(18,10)), 6) AS DOUBLE) AS mean,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(l_discount),
           CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6)))
                / COUNT(l_discount) AS DECIMAL(18,10)), 6) AS DOUBLE),
           ROUND(STDDEV_SAMP(l_discount), 4),
           MIN(l_discount), MAX(l_discount)
    FROM lineitem
    """,
)
def d16_describe(spark, sf_dir):
    """``describe()`` (Dask/pandas summary stats) as one long-format pass:
    count/mean/std/min/max per column, stacked — built from explicit exact
    aggregates rather than Spark's string-typed ``df.describe`` so the
    output is typed and oracle-checkable. One scan per column-stack via
    unionByName of single-row aggs (Catalyst merges the scans)."""
    li = load(spark, sf_dir, "lineitem")

    def stats(col):
        return li.agg(
            F.lit(col).alias("col"),
            F.count(col).alias("cnt"),
            F.round(davg(col).cast("decimal(18,10)"), 6).cast("double").alias("mean"),
            F.round(F.stddev_samp(col), 4).alias("std"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
        )

    return stats("l_quantity").unionByName(stats("l_discount"))


@query(
    "d17_mode",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
)
def d17_mode(spark, sf_dir):
    """Per-group mode (pandas ``mode()``), made deterministic: value counts,
    then rank by (count desc, value asc) — ties always resolve to the
    smallest value, unlike Spark's ``F.mode`` whose tie choice is
    partitioning-dependent. Two shuffles (count, then 5-group window)."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), "l_quantity")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "cnt")
    )


@query(
    "d18_one_hot",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pri_urgent,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pri_high,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS pri_medium
    FROM orders
    """,
)
def d18_one_hot(spark, sf_dir):
    """``get_dummies`` (one-hot encoding) with an explicit category list —
    fixed output schema (the 100 TB-safe form: no distinct-values job, no
    schema drift between runs); unseen categories simply get all-zero rows."""
    o = load(spark, sf_dir, "orders")
    cats = [("1-URGENT", "pri_urgent"), ("2-HIGH", "pri_high"), ("3-MEDIUM", "pri_medium")]
    return o.select(
        "o_orderkey",
        *[
            (F.col("o_orderpriority") == v).cast("int").alias(name)
            for v, name in cats
        ],
    )


@query(
    "d19_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def d19_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form under rollup/cube): per-flag,
    per-status, and grand totals in one pass — Spark computes all sets from
    a single partial aggregation (one scan, one expand), exactly like
    rollup/cube. The grouping id disambiguates NULL-as-total from NULL-as-
    value on both engines."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("dps_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid
        FROM dps_li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "d20_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS exact_p50,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d20_approx_quantile(spark, sf_dir):
    """Approximate percentiles via Spark's mergeable quantile sketch
    (``percentile_approx``, Greenwald-Khanna) — the scale path Dask's own
    ``quantile`` (t-digest) takes; d7 is the exact twin. Full oracle since
    round 4 via the tolerance-verdict contract: the GK values are
    engine-specific and not emitted; the frame carries the exact p50 plus
    per-quantile verdicts that each sketch value lies between the exact
    values at q ∓ 0.001 (10x GK's guaranteed rank error at accuracy=10000).
    Round-5 soundness fix (ADVICE): the interpolated q∓0.001 band can be
    NARROWER than one element gap in small or gappy groups (median of
    [1,2,3,4]: sketch returns the element 2, interpolated band is
    [2.497, 2.503] — a correct sketch would fail the verdict), so groups
    with n < 2000 rows (where 2/n > 0.001) fall back to the [min, max]
    bound — always sound for an element-valued sketch, and GK at
    accuracy=10000 is exact below 10k rows anyway. The oracle recomputes
    exact_p50 and pins the verdicts TRUE, so the sketch's accuracy contract
    is hash-gated on every run. Scalar double columns, not arrays (d10's
    canonicalizer discipline)."""
    li = load(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_quantity", [0.5, 0.9, 0.99], 10000)
    qcol = F.col("l_quantity")
    agg = li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("approx_p50"),
        F.element_at(pcts, 2).alias("approx_p90"),
        F.element_at(pcts, 3).alias("approx_p99"),
        F.round(F.percentile(qcol, F.lit(0.5)), 4).alias("exact_p50"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(qcol).alias("g_min"),
        F.max(qcol).alias("g_max"),
        *[
            F.percentile(qcol, F.lit(q)).alias(f"lo_{tag}")
            for q, tag in [(0.499, "p50"), (0.899, "p90"), (0.989, "p99")]
        ],
        *[
            F.percentile(qcol, F.lit(q)).alias(f"hi_{tag}")
            for q, tag in [(0.501, "p50"), (0.901, "p90"), (0.991, "p99")]
        ],
    )
    small = F.col("n_rows") < 2000  # 2/n > 0.001: interpolated band unsound
    ok = lambda tag: (  # noqa: E731
        F.when(
            small,
            (F.col(f"approx_{tag}") >= F.col("g_min"))
            & (F.col(f"approx_{tag}") <= F.col("g_max")),
        ).otherwise(
            (F.col(f"approx_{tag}") >= F.col(f"lo_{tag}"))
            & (F.col(f"approx_{tag}") <= F.col(f"hi_{tag}"))
        )
    ).alias(f"{tag}_ok")
    return agg.select(
        "l_returnflag", "exact_p50", ok("p50"), ok("p90"), ok("p99")
    )


@query(
    "d21_count_if",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d21_count_if(spark, sf_dir):
    """Conditional aggregates (pandas boolean-mask ``sum()``/SQL FILTER):
    ``count_if`` + filtered sums — one pass, no self-joins."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.count_if(disc).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.sum(F.when(disc, F.col("l_extendedprice").cast("decimal(28,6)")))
        .cast("double")
        .alias("disc_revenue"),
    )


@query(
    "d22_hll_merge",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct, TRUE AS merge_consistent
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT),
           TRUE, TRUE
    FROM events
    """,
)
def d22_hll_merge(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    ``hll_sketch_agg``/``hll_union_agg``) — the 100 TB aggregation pattern:
    per-shard partial sketches are tiny binary blobs that union associatively,
    so a global distinct count never reshuffles raw keys. Per-event_type
    sketches here stand in for per-day/per-shard partials; the ALL row is
    their union. Full oracle since round 4 via the tolerance-verdict
    contract: sketch registers are engine-specific and not emitted; each
    row carries the exact distinct count plus (a) a verdict that the
    estimate is within 5% (lgK=12 → rsd ≈ 1.6%, 3σ margin) and (b) a
    merge-consistency verdict — for the ALL row, that estimating the UNION
    of per-type sketches agrees with sketching the whole column directly
    to within 5% of exact (the associativity the 100 TB pattern rests on;
    previously only a local test). NOT exact equality: DataSketches HLL
    promotes small partials from exact coupon mode to dense registers on
    union, so merged-vs-direct can differ slightly once cardinality leaves
    coupon range — the sf0.1 parity sweep caught exactly that. The oracle
    recomputes the exacts and pins both verdicts TRUE."""
    ev = load(spark, sf_dir, "events")
    partials = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= 0.05 * exact
    ).alias("within_5pct")
    per_type = partials.select(
        "event_type",
        "exact_users",
        within(F.hll_sketch_estimate("sk"), F.col("exact_users")),
        F.lit(True).alias("merge_consistent"),
    )
    whole = ev.agg(
        F.hll_sketch_agg("user_id", 12).alias("wsk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    merged = (
        partials.agg(F.hll_union_agg("sk").alias("msk"))
        .crossJoin(whole)  # 1-row x 1-row
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            within(F.hll_sketch_estimate("msk"), F.col("exact_users")),
            (
                F.abs(
                    F.hll_sketch_estimate("msk") - F.hll_sketch_estimate("wsk")
                )
                <= 0.05 * F.col("exact_users")
            ).alias("merge_consistent"),
        )
    )
    return per_type.unionByName(merged)


@query(
    "d23_regr_ols",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(({_SXY} - {_SX} * {_SY} / COUNT(*))
               / ({_SXX} - {_SX} * {_SX} / COUNT(*)), 8) AS slope,
           ROUND({_SY} / COUNT(*)
               - (({_SXY} - {_SX} * {_SY} / COUNT(*))
                  / ({_SXX} - {_SX} * {_SX} / COUNT(*))) * {_SX} / COUNT(*),
                 8) AS intercept,
           ROUND(POWER({_SXY} - {_SX} * {_SY} / COUNT(*), 2)
               / (({_SXX} - {_SX} * {_SX} / COUNT(*))
                  * ({_SYY} - {_SY} * {_SY} / COUNT(*))), 8) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d23_regr_ols(spark, sf_dir):
    """Per-group OLS regression (SQL ``REGR_SLOPE/REGR_INTERCEPT/REGR_R2``),
    derived in closed form from the five mergeable decimal sums (n, Sx, Sy,
    Sxy, Sxx[, Syy]) instead of the engines' streaming covariance kernels —
    one partial+final aggregation pass, exact and order-insensitive, so both
    engines agree bitwise before the final rounded divide. At 100 TB the
    shuffle carries five decimals per group, nothing else."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sx = F.sum(x.cast(dec)).cast("double")
    sy = F.sum(y.cast(dec)).cast("double")
    sxy = F.sum((x * y).cast(dec)).cast("double")
    sxx = F.sum((x * x).cast(dec)).cast("double")
    syy = F.sum((y * y).cast(dec)).cast("double")
    slope = F.try_divide(sxy - sx * sy / n, sxx - sx * sx / n)  # NULL when x is constant
    intercept = sy / n - slope * sx / n
    r2 = F.try_divide(
        F.pow(sxy - sx * sy / n, F.lit(2)),
        (sxx - sx * sx / n) * (syy - sy * sy / n),
    )
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(slope, 8).alias("slope"),
        F.round(intercept, 8).alias("intercept"),
        F.round(r2, 8).alias("r2"),
    )


@query(
    "d24_bool_agg",
    oracle="""
    SELECT o_orderpriority,
           BOOL_AND(o_totalprice > 1000.0) AS all_above_1k,
           BOOL_OR(o_orderstatus = 'F') AS any_finished,
           BOOL_AND(o_custkey IS NOT NULL) AS no_null_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def d24_bool_agg(spark, sf_dir):
    """Boolean quantifier aggregates (SQL:2023 ``BOOL_AND``/``BOOL_OR``,
    a.k.a. ``EVERY``/``SOME``) — the data-quality assertion pattern
    ("does every row in this group satisfy the invariant?"). Short-circuits
    map-side: partials are single booleans, the cheapest shuffle there is."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_custkey").isNotNull()).alias("no_null_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "d25_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id, MIN(DATE_TRUNC('day', ts)) AS day
      FROM events GROUP BY event_type, user_id
    ),
    daily AS (SELECT event_type, day, COUNT(*) AS new_users
              FROM firsts GROUP BY event_type, day)
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def d25_cumulative_distinct(spark, sf_dir):
    """Cumulative distinct users per (event_type, day) ("users ever seen up
    to day d") WITHOUT quadratic state: distinct-per-prefix is rewritten as
    first-seen-day per (type, user) (one groupBy) + daily new-user counts +
    a running sum over the tiny per-type-per-day frame. The naive form needs
    a growing distinct set per day; this form shuffles each (type, user)
    exactly once — the standard trick for cumulative cardinality at 100 TB.
    The final window runs over #types × #days rows."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    daily = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@query(
    "d26_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, ROUND(QUANTILE_CONT(value, 0.5), 4) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, ROUND(QUANTILE_CONT(adev, 0.5), 4) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.med, m.mad,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ABS(d.value - d.med) > 3 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, d.med, m.mad
    """,
)
def d26_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    data-quality screen that survives the heavy tails that break z-scores
    (pandas idiom: two ``groupby().median()`` passes + a filter). Two exact
    interpolated medians (type-7, same definition both engines, d7), each a
    per-group aggregate whose shuffle is bounded by group count; the tiny
    per-type median tables come back as BROADCAST joins, so the events
    stream is scanned twice but never reshuffled. med/mad are rounded(4)
    BEFORE the 3-sigma-equivalent comparison so the outlier threshold is
    bit-identical on both engines (the interpolation arithmetic is float);
    at 100 TB the exact medians would swap for d20's mergeable
    percentile_approx sketch, same plan shape."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


_Q = "CAST(SUM(CAST({e} AS DECIMAL(28,6))) AS DOUBLE)"


@query(
    "d27_skew_kurt",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {_Q.format(e='l_quantity')} AS s1,
             {_Q.format(e='l_quantity*l_quantity')} AS s2,
             {_Q.format(e='l_quantity*l_quantity*l_quantity')} AS s3,
             {_Q.format(e='l_quantity*l_quantity*l_quantity*l_quantity')} AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / POWER(s2/n - (s1/n)*(s1/n), 1.5), 8) AS skew,
           ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / POWER(s2/n - (s1/n)*(s1/n), 2) - 3, 8) AS kurt
    FROM s
    """,
)
def d27_skew_kurt(spark, sf_dir):
    """Per-group skewness and excess kurtosis (Dask ``groupby.skew`` /
    ``Series.kurtosis``), derived in closed form from the four mergeable
    decimal raw-moment sums (Σx..Σx⁴) — same discipline as d23's OLS: one
    partial+final pass, order-insensitive, so both engines agree bitwise
    before the final rounded divide. Spark's built-in ``F.skewness`` /
    ``F.kurtosis`` use the same population (g1 / excess-g2) convention but a
    streaming central-moment kernel whose float path differs from DuckDB's
    bias-corrected sample convention — raw moments sidestep both. The
    shuffle carries four decimals per group; x ≤ 50 keeps Σx⁴ well inside
    DECIMAL(28,6)."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    x = F.col("l_quantity")
    x2, x3, x4 = x * x, x * x * x, x * x * x * x
    n = F.count(F.lit(1))
    s1 = F.sum(x.cast(dec)).cast("double")
    s2 = F.sum(x2.cast(dec)).cast("double")
    s3 = F.sum(x3.cast(dec)).cast("double")
    s4 = F.sum(x4.cast(dec)).cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(F.try_divide(m3, F.pow(m2, F.lit(1.5))), 8).alias("skew"),
        F.round(F.try_divide(m4, F.pow(m2, F.lit(2))) - 3, 8).alias("kurt"),
    )


@query(
    "d28_idxmax",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey DESC, l_linenumber DESC)
               AS rn_max,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice ASC,
                                         l_orderkey ASC, l_linenumber ASC)
               AS rn_min
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn_max = 1 THEN l_extendedprice END) AS max_price,
           MAX(CASE WHEN rn_max = 1 THEN l_orderkey END) AS max_orderkey,
           MAX(CASE WHEN rn_min = 1 THEN l_extendedprice END) AS min_price,
           MAX(CASE WHEN rn_min = 1 THEN l_orderkey END) AS min_orderkey
    FROM ranked GROUP BY l_returnflag
    """,
)
def d28_idxmax(spark, sf_dir):
    """Per-group argmax/argmin (Dask ``groupby.idxmax/idxmin``) as a plain
    hash aggregation: ``MAX(STRUCT(value, key...))`` compares structs
    lexicographically, so the max carries its row's keys along — a
    distributed argmax with NO window sort, just partial+final agg (the
    shuffle moves one struct per group). Deterministic under ties because
    the full key tuple participates in the comparison. The oracle spells
    the same semantics as a ROW_NUMBER pick, the form engines without
    struct ordering would use."""
    li = load(spark, sf_dir, "lineitem")
    mx = F.max(F.struct("l_extendedprice", "l_orderkey", "l_linenumber"))
    mn = F.min(F.struct("l_extendedprice", "l_orderkey", "l_linenumber"))
    return (
        li.groupBy("l_returnflag")
        .agg(mx.alias("mx"), mn.alias("mn"))
        .select(
            "l_returnflag",
            F.col("mx.l_extendedprice").alias("max_price"),
            F.col("mx.l_orderkey").alias("max_orderkey"),
            F.col("mn.l_extendedprice").alias("min_price"),
            F.col("mn.l_orderkey").alias("min_orderkey"),
        )
    )


@query(
    "d29_product_sem",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_lines,
           CAST(ROUND(CAST(EXP(SUM(LN(1.0 - l_discount))) AS DECIMAL(18,10)), 4)
                AS DOUBLE) AS disc_factor,
           ROUND(SQRT((CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,6)))
                            AS DOUBLE) / COUNT(*)
                       - POWER(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                                    AS DOUBLE) / COUNT(*), 2))
                      * COUNT(*) / (COUNT(*) - 1) / COUNT(*)), 8) AS qty_sem
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
    """,
)
def d29_product_sem(spark, sf_dir):
    """Product aggregate + standard error of the mean (Dask ``groupby.prod``
    / ``Series.sem``). Product rides the log-sum-exp identity (e12's
    discipline — Spark's ``F.product`` and DuckDB's ``product()`` multiply
    in partition order, which is not hash-stable; ``exp(sum(ln))`` over a
    decimal-roundable result is). SEM is sample-std/√n from the two decimal
    moment sums. Groups of one line are excluded (sem undefined; both
    engines would emit engine-specific NULL/NaN)."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    x = F.col("l_quantity")
    n = F.count(F.lit(1))
    s1 = F.sum(x.cast(dec)).cast("double")
    s2 = F.sum((x * x).cast(dec)).cast("double")
    prod = F.exp(F.sum(F.log(F.lit(1.0) - F.col("l_discount"))))
    sem = F.sqrt(
        F.try_divide(
            F.try_divide((s2 / n - F.pow(s1 / n, F.lit(2))) * n, n - 1), n
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            n.alias("n_lines"),
            F.round(prod.cast("decimal(18,10)"), 4).cast("double").alias("disc_factor"),
            F.round(sem, 8).alias("qty_sem"),
        )
        .filter(F.col("n_lines") > 1)
    )


@query(
    "d30_nunique_all",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS u_part,
           COUNT(DISTINCT l_suppkey) AS u_supp,
           COUNT(DISTINCT l_returnflag) AS u_flag,
           COUNT(DISTINCT l_quantity) AS u_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def d30_nunique_all(spark, sf_dir):
    """Whole-frame per-column distinct counts (pandas ``df.nunique()`` —
    the profiling primitive). Multiple COUNT(DISTINCT)s in one aggregate
    compile to a single Expand-based plan: each row fans out once per
    distinct-column, partial aggregation dedups map-side, and one shuffle
    serves all four counts — N columns profiled for one pass over the data,
    not N passes. At 100 TB swap for d5's approx_count_distinct sketches;
    the plan shape is identical."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("u_part"),
        F.countDistinct("l_suppkey").alias("u_supp"),
        F.countDistinct("l_returnflag").alias("u_flag"),
        F.countDistinct("l_quantity").alias("u_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "d31_pivot_multi",
    oracle=f"""
    SELECT l_returnflag,
           ROUND({sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}, 4)
             AS O_qty,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_cnt,
           ROUND({sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}, 4)
             AS F_qty,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d31_pivot_multi(spark, sf_dir):
    """pivot_table with MULTIPLE aggregates per cell (pandas
    ``pivot_table(aggfunc=['sum','count'])``): one ``pivot`` carrying two
    named aggregations fans out to ``<value>_<agg>`` columns in a single
    shuffle — no second pass per aggregate, no join of two pivots. Pivot
    values are enumerated so Spark skips the distinct-values pre-job
    (the 100 TB-safe form, as in d14)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(dsum("l_quantity"), 4).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "d32_crosstab",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_F,
           COUNT(*) AS row_total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d32_crosstab(spark, sf_dir):
    """Contingency table (pandas ``crosstab`` with margins): returnflag ×
    linestatus counts plus a row-total margin. Implemented as a pivot with
    *enumerated* values — naming the pivot columns up front removes the
    extra values-discovery job Spark otherwise runs, and fixes the output
    schema (the d31 discipline). One shuffle on the grouping key; each
    cell is a FILTER-style conditional count, map-side combinable.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("status_O"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("status_F"),
        F.count(F.lit(1)).alias("row_total"),
    )


# d33: every pairwise sum the correlation matrix needs, one aggregate pass.
_D33_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "d33_corr_matrix",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
    """
    + ",\n".join(
        f"CAST(SUM(CAST(l_{c} AS DECIMAL(28,6))) AS DOUBLE) AS s_{c}"
        for c in ("quantity", "extendedprice", "discount", "tax")
    )
    + ",\n"
    + ",\n".join(
        f"CAST(SUM(CAST(l_{a} * l_{b} AS DECIMAL(28,6))) AS DOUBLE) AS s_{a}_{b}"
        for i, a in enumerate(("quantity", "extendedprice", "discount", "tax"))
        for b in ("quantity", "extendedprice", "discount", "tax")[i:]
    )
    + """
      FROM lineitem
    )
    SELECT col1, col2,
           ROUND((sxy - sx * sy / n)
                 / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 8) AS corr
    FROM (
    """
    + "\nUNION ALL\n".join(
        f"""SELECT 'l_{a}' AS col1, 'l_{b}' AS col2, n,
               s_{a} AS sx, s_{b} AS sy,
               s_{a}_{b} AS sxy, s_{a}_{a} AS sxx, s_{b}_{b} AS syy FROM s"""
        for i, a in enumerate(("quantity", "extendedprice", "discount", "tax"))
        for b in ("quantity", "extendedprice", "discount", "tax")[i:]
    )
    + ")",
)
def d33_corr_matrix(spark, sf_dir):
    """Full pairwise Pearson correlation matrix (pandas/Dask ``df.corr()``)
    over the four numeric lineitem measures, upper triangle in long form.

    ONE aggregate pass computes all 4 first-moment and 10 second-moment
    decimal sums (exact, order-insensitive — the d11 discipline); the 10
    correlations are then closed-form double arithmetic on the one-row
    aggregate, expanded row-per-pair via an inline explode of struct
    literals. No per-pair scans: pandas computes the same matrix from one
    pass over the data, and so does this.

    100 TB: the scan is one map-side partial aggregate per partition (14
    decimal accumulators), one exchange of 14 values — the cheapest possible
    full-matrix plan; the pair expansion is driver-free projection on a
    one-row frame.
    """
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    cols = list(_D33_COLS)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast(dec))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    s = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col1"),
                F.lit(b).alias("col2"),
                F.col(f"s_{a}").alias("sx"),
                F.col(f"s_{b}").alias("sy"),
                F.col(f"s_{a}_{b}").alias("sxy"),
                F.col(f"s_{a}_{a}").alias("sxx"),
                F.col(f"s_{b}_{b}").alias("syy"),
            )
            for i, a in enumerate(cols)
            for b in cols[i:]
        ]
    )
    n = F.col("n")
    corr = F.round(
        F.try_divide(
            F.col("p.sxy") - F.col("p.sx") * F.col("p.sy") / n,
            F.sqrt(
                (F.col("p.sxx") - F.col("p.sx") * F.col("p.sx") / n)
                * (F.col("p.syy") - F.col("p.sy") * F.col("p.sy") / n)
            ),
        ),
        8,
    )
    return (
        s.select("n", F.explode(pairs).alias("p"))
        .select(F.col("p.col1").alias("col1"), F.col("p.col2").alias("col2"), corr.alias("corr"))
    )


@query(
    "d34_null_profile",
    oracle="""
    SELECT col, n_null, n_total FROM (
      SELECT 'value_pos' AS col,
             COUNT(*) - COUNT(NULLIF(GREATEST(value, 0.0), 0.0)) AS n_null,
             COUNT(*) AS n_total
      FROM events
      UNION ALL
      SELECT 'prop_k',
             COUNT(*) - COUNT(NULLIF(CAST(props->>'$.k' AS INTEGER), 42)),
             COUNT(*)
      FROM events
      UNION ALL
      SELECT 'user_mod',
             COUNT(*) - COUNT(NULLIF(user_id % 7, 3)),
             COUNT(*)
      FROM events
    )
    """,
)
def d34_null_profile(spark, sf_dir):
    """Per-column null profile (pandas ``df.isna().sum()`` / Dask's missing
    report): null counts for a set of derived columns in one aggregate
    pass, long format via ``stack``-style struct explode. The fixtures ship
    null-free, so the profiled columns are NULLIF-derived — the plumbing
    (count(*) − count(col) per column, single scan) is the operator.

    100 TB: one scan, k counter pairs — same shape as d30; never one
    job per column (the naive pandas port).
    """
    ev = load(spark, sf_dir, "events")
    derived = ev.select(
        F.nullif(F.greatest(F.col("value"), F.lit(0.0)), F.lit(0.0)).alias("value_pos"),
        F.nullif(
            F.get_json_object("props", "$.k").cast("int"), F.lit(42)
        ).alias("prop_k"),
        F.nullif(F.col("user_id") % 7, F.lit(3)).alias("user_mod"),
    )
    agg = derived.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}")
            for c in ("value_pos", "prop_k", "user_mod")
        ],
    )
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"null_{c}").alias("n_null"),
                F.col("n_total").alias("n_total"),
            )
            for c in ("value_pos", "prop_k", "user_mod")
        ]
    )
    return agg.select(F.explode(cols).alias("s")).select(
        "s.col", "s.n_null", "s.n_total"
    )


@query(
    "d35_group_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d35_group_quantile(spark, sf_dir):
    """Per-group exact quantiles (pandas/Dask ``groupby().quantile()``):
    interpolated quartiles of l_quantity per returnflag. ``percentile`` is
    the exact linear-interpolation quantile on both engines, and
    l_quantity is integer-valued, so the edges are bit-identical (the b15
    argument, per group).

    100 TB: exact per-group percentile buffers each group's values — fine
    for bounded group counts/sizes; for billion-row groups swap in
    ``percentile_approx`` (d20's mergeable KLL-style sketch) which keeps
    the partial-aggregate shape with constant memory.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "d36_group_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders
    ) WHERE n >= 12
    """,
)
def d36_group_filter(spark, sf_dir):
    """Group-predicate row filter (pandas/Dask
    ``groupby().filter(lambda g: len(g) >= 12)``): keep every ROW whose
    group passes an aggregate predicate. pandas materializes each group in
    Python; here it is one unordered COUNT window over the grouping key —
    a single hash exchange, no join, no Python.

    The alternative shape (aggregate → semi-join back) costs a second
    shuffle of the fact table; the window form reuses the one exchange for
    both the count and the filter, which is the right plan at any scale.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") >= 12)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "d37_percentile_disc",
    oracle="""
    SELECT l_linestatus,
           quantile_disc(l_extendedprice, 0.25) AS q25_disc,
           quantile_disc(l_extendedprice, 0.50) AS med_disc,
           quantile_disc(l_extendedprice, 0.75) AS q75_disc,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
)
def d37_percentile_disc(spark, sf_dir):
    """Discrete per-group quantiles (pandas ``quantile(interpolation=
    'lower')`` / SQL ``PERCENTILE_DISC``): the quantile is an ACTUAL data
    value (the smallest value whose cumulative share ≥ p), never an
    interpolated midpoint — which makes it float-exact by construction
    (both engines return the identical stored double, no arithmetic), the
    right choice for medians over prices and latencies at scale. d35 is
    the interpolated (``_cont``) twin. Spark 4 spells it with the ANSI
    ``WITHIN GROUP (ORDER BY ...)`` clause.

    100 TB: same sort-based per-group aggregate as d35 — swap to the d20
    sketch when groups reach billions of rows.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.expr(
                "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("q25_disc"),
            F.expr(
                "percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("med_disc"),
            F.expr(
                "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("q75_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "d38_hll_cumulative",
    oracle="""
    WITH days AS (SELECT DISTINCT event_type, DATE_TRUNC('day', ts) AS day
                  FROM events),
    firsts AS (SELECT event_type, user_id, MIN(DATE_TRUNC('day', ts)) AS fday
               FROM events GROUP BY event_type, user_id),
    daily AS (SELECT event_type, fday AS day, COUNT(*) AS new_users
              FROM firsts GROUP BY event_type, fday)
    SELECT d.event_type, d.day,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (
                PARTITION BY d.event_type ORDER BY d.day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS exact_cum_users,
           TRUE AS within_5pct
    FROM days d LEFT JOIN daily n
      ON d.event_type = n.event_type AND d.day = n.day
    """,
)
def d38_hll_cumulative(spark, sf_dir):
    """Cumulative distinct users per (event_type, day), APPROXIMATE — the
    mergeable-sketch twin of d25's exact first-seen rewrite: one HLL
    partial per (series, day), then a running ``hll_union_agg`` window
    unions the prefix of daily sketches. The union is associative and
    loss-free across sketches, so the day-N estimate equals sketching the
    first N days directly — the property that makes this the 100 TB shape:
    daily partials are built once (map-side, tiny blobs), and ANY
    retention window (cumulative, trailing-28d via a bounded frame) is a
    re-union of blobs, never a rescan of raw events. d25 shuffles each
    user once to find first-seen days; this never shuffles users at all
    beyond the daily partial — the win once user cardinality ×
    retention-window count dwarfs sketch size.

    Full oracle since round 4 via the tolerance-verdict contract: the
    per-day estimates are engine-specific and not emitted; each row
    carries the EXACT cumulative distinct count (d25's first-seen rewrite,
    running-summed over all event days) plus a verdict that the sketch
    estimate is within 5% of it (lgK=12 → rsd ≈ 1.6%, 3σ margin). The
    oracle recomputes the exacts and pins the verdict TRUE, so the sketch
    accuracy claim is hash-gated per (event_type, day).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    new_daily = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # one LEFT join at day grain (both sides already hash-partitioned on
    # the join keys by their aggregates), then BOTH running windows — the
    # sketch union and the exact running sum — over the same frame, so the
    # est/exact comparison costs no second join and one window pass
    joined = daily.join(new_daily, ["event_type", "day"], "left")
    both = joined.select(
        "event_type",
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "cum_est_users"
        ),
        F.sum(F.coalesce("new_users", F.lit(0)))
        .over(w)
        .cast("long")
        .alias("exact_cum_users"),
    )
    return both.select(
        "event_type",
        "day",
        "exact_cum_users",
        (
            F.abs(F.col("cum_est_users") - F.col("exact_cum_users"))
            <= 0.05 * F.col("exact_cum_users")
        ).alias("within_5pct"),
    )


@query(
    "d39_string_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           string_agg(DISTINCT CAST(YEAR(l_shipdate) AS VARCHAR), ','
                      ORDER BY CAST(YEAR(l_shipdate) AS VARCHAR)) AS ship_years,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def d39_string_agg(spark, sf_dir):
    """Ordered string aggregation (SQL ``STRING_AGG`` / pandas
    ``groupby.agg(','.join)``): the distinct ship YEARS per group, sorted
    then joined — the *ordered distinct* discipline makes a text aggregate
    deterministic (bare ``collect_set`` order is partition luck, banned by
    §7.6.3). ``sort_array ∘ collect_set`` then ``concat_ws`` is the Spark
    spelling of DuckDB's ``string_agg(DISTINCT ... ORDER BY ...)``.

    100 TB: map-side partial collect_set bounds state at distinct-value
    cardinality per group (7 ship years), not row count — safe for
    enum-like columns, the wrong tool for unbounded ones (use d10's
    explicit caveats).
    """
    li = load(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate").cast("string")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set(yr))).alias("ship_years"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "d40_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_quantity,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DECIMAL(28,6))
               AS wt
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    cum AS (
      SELECT l_returnflag, l_quantity,
             CAST(SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cw,
             CAST(SUM(wt) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS tw
      FROM w
    )
    SELECT l_returnflag, MIN(l_quantity) AS weighted_median_qty
    FROM cum WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def d40_weighted_median(spark, sf_dir):
    """Weighted median (the 50% threshold of a weighted distribution —
    "the quantity at which half the REVENUE sits below"): per returnflag,
    the smallest quantity whose cumulative extendedprice weight reaches
    half the group's total. Weights pre-aggregate to (group, value) grain
    and stay DECIMAL through both the running and total window sums, so
    the single threshold comparison is engine-identical; the crossing
    value is an actual data value (d37's discrete discipline — no
    interpolation, no float synthesis).

    100 TB: one fact-grain aggregate to (group, value) cells, then
    windows over cell cardinality — never a per-row sort of raw data;
    the same shape computes any weighted percentile by changing the
    threshold fraction.
    """
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("wt")
    )
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = cells.select(
        "l_returnflag",
        "l_quantity",
        F.sum("wt").over(w_run).cast("double").alias("cw"),
        F.sum("wt").over(w_all).cast("double").alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("weighted_median_qty"))
    )


@query(
    "d41_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DECIMAL(28,6))
               AS spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT spend,
             CAST(ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS DOUBLE) AS i,
             CAST(COUNT(*) OVER () AS DOUBLE) AS n,
             CAST(SUM(spend) OVER () AS DOUBLE) AS total
      FROM rev
    )
    SELECT FLOOR((2 * CAST(SUM(CAST(i * CAST(spend AS DOUBLE) / total
                                    AS DECIMAL(28,10))) AS DOUBLE)
                  - (MIN(n) + 1)) / MIN(n) * 10000 + 0.5) / 10000 AS gini,
           CAST(MIN(n) AS BIGINT) AS n_customers
    FROM ranked
    """,
)
def d41_gini(spark, sf_dir):
    """Gini coefficient of customer spend (the inequality summary behind
    x26's Pareto classes — one number for "how concentrated is revenue"):
    G = (2·Σᵢ i·sᵢ/S − (n+1))/n over spends ranked ascending — the exact
    closed form from rank-weighted shares, no curve integration. Ranks are
    deterministic (spend, custkey tiebreak §7.6.3); each rank-weighted
    share is DECIMAL-cast before the sum (d11) and the final statistic
    FLOOR-quantized (§7.6.2).

    100 TB: spend reduces to customer grain first; the ranking is one
    ordered window over dimension cardinality (x26's argument), and the
    statistic is a single aggregate above it.
    """
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("spend")
    )
    w = Window.orderBy("spend", "o_custkey")
    w_all = Window.partitionBy()
    ranked = rev.select(
        "spend",
        F.row_number().over(w).cast("double").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("double").alias("n"),
        F.sum("spend").over(w_all).cast("double").alias("total"),
    )
    share = (F.col("i") * F.col("spend").cast("double") / F.col("total")).cast(
        "decimal(28,10)"
    )
    return ranked.agg(
        (
            F.floor(
                (2 * F.sum(share).cast("double") - (F.min("n") + 1))
                / F.min("n")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("gini"),
        F.min("n").cast("bigint").alias("n_customers"),
    )


@query(
    "d46_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS c_xy
      FROM lineitem GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(c_xy) AS c_x FROM joint GROUP BY x),
    my AS (SELECT y, SUM(c_xy) AS c_y FROM joint GROUP BY y),
    tot AS (SELECT SUM(c_xy) AS n, COUNT(DISTINCT x) AS rx,
                   COUNT(DISTINCT y) AS ry
            FROM joint),
    terms AS (
      SELECT t.n, t.rx, t.ry,
             ROUND(CAST(j.c_xy AS DOUBLE) / t.n
                   * LN(CAST(j.c_xy AS DOUBLE) * t.n
                        / (CAST(m1.c_x AS DOUBLE) * m2.c_y)), 6) AS mi_term,
             ROUND(POW(j.c_xy - CAST(m1.c_x AS DOUBLE) * m2.c_y / t.n, 2)
                   / (CAST(m1.c_x AS DOUBLE) * m2.c_y / t.n), 6) AS chi_term
      FROM joint j
      JOIN mx m1 USING (x) JOIN my m2 USING (y) CROSS JOIN tot t
    )
    SELECT CAST(MIN(n) AS BIGINT) AS n,
           FLOOR(CAST(SUM(CAST(mi_term AS DECIMAL(38,18))) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS mi_nats,
           FLOOR(CAST(SUM(CAST(chi_term AS DECIMAL(38,18))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS chi2,
           FLOOR(SQRT(CAST(SUM(CAST(chi_term AS DECIMAL(38,18))) AS DOUBLE)
                      / (MIN(n) * (LEAST(MIN(rx), MIN(ry)) - 1)))
                 * 1000000 + 0.5) / 1000000 AS cramers_v
    FROM terms
    """,
)
def d46_mutual_information(spark, sf_dir):
    """Categorical association between two columns — mutual information
    (nats), Pearson chi-square, and Cramér's V over the
    (l_returnflag, l_linestatus) contingency table. The categorical twin
    of d11's numeric corr: the signal a curation pipeline uses for label
    leakage / feature-association audits. Per-cell MI and chi-square terms
    are ROUND(6)-quantized before an exact DECIMAL sum (l13's LN
    discipline — libm last-ULP differences cannot survive the quantizer,
    and the decimal sum is partial-aggregation-order-proof), so the DuckDB
    twin reproduces all three statistics bit-for-bit. Zero cells never
    enter (the contingency table holds observed cells only — the
    0·ln 0 = 0 convention on both engines); a single-level column makes
    Cramér's V NULL via try_divide (DuckDB x/0 parity, 1-row sweep safe).

    100 TB: the fact table reduces to the contingency grain in ONE
    partial+final aggregate; everything downstream runs on that tiny
    (|X|·|Y|-row, categorical-levels-bounded) table, eager-checkpointed
    and coalesced to a single partition so margins, totals and level
    counts come from zero-exchange windows (SinglePartition satisfies any
    clustering) — the whole statistic costs exactly one shuffle (round-4
    plan trim: was 5 exchanges via three re-aggregates + broadcast joins)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    joint = (
        li.groupBy(
            F.col("l_returnflag").alias("x"), F.col("l_linestatus").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    # the contingency table is categorical-levels-bounded (|X|·|Y| rows) —
    # it re-enters as a driver-local literal (round 12: LocalTableScan, so
    # the corpus aggregate runs once as its own bounded job AND nothing is
    # hidden from the exchange budget; was an eager localCheckpoint that
    # carried the "post-checkpoint plan only" caveat), coalesced to one
    # partition so margins/totals/level counts come from zero-exchange
    # windows (SinglePartition satisfies any clustering)
    from dask_pipes_spark.session import collect_local

    joint = collect_local(joint).coalesce(1)
    wx, wy, wg = Window.partitionBy("x"), Window.partitionBy("y"), Window.partitionBy()
    enriched = joint.select(
        "c_xy",
        F.sum("c_xy").over(wx).alias("c_x"),
        F.sum("c_xy").over(wy).alias("c_y"),
        F.sum("c_xy").over(wg).alias("n"),
        F.size(F.collect_set("x").over(wg)).alias("rx"),
        F.size(F.collect_set("y").over(wg)).alias("ry"),
    )
    e_xy = F.col("c_x").cast("double") * F.col("c_y") / F.col("n")
    terms = enriched.select(
        "n", "rx", "ry",
        F.round(
            F.col("c_xy").cast("double") / F.col("n")
            * F.log(
                F.col("c_xy").cast("double") * F.col("n")
                / (F.col("c_x").cast("double") * F.col("c_y"))
            ),
            6,
        ).alias("mi_term"),
        F.round(
            F.pow(F.col("c_xy") - e_xy, F.lit(2)) / e_xy, 6
        ).alias("chi_term"),
    )
    chi2 = F.sum(F.col("chi_term").cast("decimal(38,18)")).cast("double")
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return terms.agg(
        F.min("n").cast("bigint").alias("n"),
        q6(
            F.sum(F.col("mi_term").cast("decimal(38,18)")).cast("double")
        ).alias("mi_nats"),
        (F.floor(chi2 * 10000 + F.lit(0.5)) / 10000).alias("chi2"),
        q6(
            F.sqrt(
                F.try_divide(
                    chi2,
                    F.min("n") * (F.least(F.min("rx"), F.min("ry")) - 1),
                )
            )
        ).alias("cramers_v"),
    )


@query(
    "d47_ks_test",
    oracle="""
    WITH grouped AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS cf,
             SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS co
      FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
    ),
    cum AS (
      SELECT SUM(cf) OVER (ORDER BY v) AS cum_f,
             SUM(co) OVER (ORDER BY v) AS cum_o,
             SUM(cf) OVER () AS n_f,
             SUM(co) OVER () AS n_o
      FROM grouped
    )
    SELECT CAST(MIN(n_f) AS BIGINT) AS n_f,
           CAST(MIN(n_o) AS BIGINT) AS n_o,
           FLOOR(MAX(ABS(CAST(cum_f AS DOUBLE) / n_f
                         - CAST(cum_o AS DOUBLE) / n_o))
                 * 1000000 + 0.5) / 1000000 AS ks_stat,
           CAST(MAX(ABS(CAST(cum_f AS DOUBLE) / n_f
                        - CAST(cum_o AS DOUBLE) / n_o))
                > 1.358 * SQRT((CAST(MIN(n_f) AS DOUBLE) + MIN(n_o))
                               / (CAST(MIN(n_f) AS DOUBLE) * MIN(n_o)))
                AS BOOLEAN) AS reject_95
    FROM cum
    """,
)
def d47_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the o_totalprice
    distributions of finished ('F') vs open ('O') orders, with the
    large-sample 5% rejection verdict (c(0.05) = 1.358 — Smirnov 1948).
    The distribution-drift primitive a training pipeline runs between data
    snapshots (p14's drift z-scores are per-moment; KS is whole-CDF). The
    sup is taken at every DISTINCT value after a value-grain pre-aggregate:
    integer cumulative counts make both empirical CDFs exact, so the only
    float ops are one division and one subtraction per distinct value —
    engine-identical, FLOOR(1e6)-quantized.

    100 TB: the value-grain reduce is one shuffle; the unpartitioned
    ordered window over distinct values is the honest cost of a global CDF
    (x26's discipline — one task at dimension-like cardinality). For
    billion-distinct-value columns, pre-bin to a fixed lattice (b12/d45)
    first: the binned KS lower-bounds the exact one at bin resolution."""
    o = load(spark, sf_dir, "orders")
    grouped = (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("cf"),
            F.sum(
                F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
            ).alias("co"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wa = Window.partitionBy()
    cum = grouped.select(
        F.sum("cf").over(w).alias("cum_f"),
        F.sum("co").over(w).alias("cum_o"),
        F.sum("cf").over(wa).alias("n_f"),
        F.sum("co").over(wa).alias("n_o"),
    )
    # try_divide: an input where one sample is EMPTY has n=0 — NULL stat
    # (DuckDB x/0 parity), not an ANSI crash (1-row sweep contract)
    d = F.abs(
        F.try_divide(F.col("cum_f").cast("double"), F.col("n_f"))
        - F.try_divide(F.col("cum_o").cast("double"), F.col("n_o"))
    )
    stat = F.max(d)
    crit = F.lit(1.358) * F.sqrt(
        F.try_divide(
            F.min("n_f").cast("double") + F.min("n_o"),
            F.min("n_f").cast("double") * F.min("n_o"),
        )
    )
    return cum.agg(
        F.min("n_f").cast("bigint").alias("n_f"),
        F.min("n_o").cast("bigint").alias("n_o"),
        (F.floor(stat * 1000000 + F.lit(0.5)) / 1000000).alias("ks_stat"),
        (stat > crit).cast("boolean").alias("reject_95"),
    )


@query(
    "d48_group_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, SUM(c) AS n FROM cnt GROUP BY user_id),
    terms AS (
      SELECT c.user_id, t.n,
             ROUND(-(CAST(c.c AS DOUBLE) / t.n)
                   * LN(CAST(c.c AS DOUBLE) / t.n), 6) AS h_term
      FROM cnt c JOIN tot t USING (user_id)
    ),
    ent AS (
      SELECT user_id, CAST(MIN(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CAST(h_term AS DECIMAL(38,18))) AS DOUBLE) AS h
      FROM terms GROUP BY user_id
    )
    SELECT n_types,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR(CAST(SUM(CAST(h AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
                 * 1000000 + 0.5) / 1000000 AS avg_entropy_nats,
           FLOOR(MAX(h) * 1000000 + 0.5) / 1000000 AS max_entropy_nats
    FROM ent GROUP BY n_types
    """,
)
def d48_group_entropy(spark, sf_dir):
    """Per-key categorical (Shannon) entropy of the event_type mix, rolled
    up by distinct-type count — the behavioral-diversity profile of an
    event stream (users whose events are all one type have H=0; uniform
    mixes approach ln(k)). The group-level categorical twin of l36's
    character entropy, and the diversity signal a curation pipeline uses
    next to l25's sampling weights (over-sample diverse interaction
    histories). Per-cell -p·ln p terms are ROUND(6)-quantized before exact
    DECIMAL sums at BOTH rollup levels (l13/d46 LN discipline), so the
    DuckDB twin agrees bit-for-bit.

    100 TB: one partial+final aggregate to (user, type) grain, the
    per-user total as a keyed WINDOW over that grain (one exchange on
    user_id, which the user-grain aggregate then reuses — no join, no
    second scan), one bounded rollup by type count. Nothing wider than
    the contingency grain ever shuffles."""
    e = load(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    wu = Window.partitionBy("user_id")
    terms = cnt.select(
        "user_id",
        F.sum("c").over(wu).alias("n"),
        F.col("c").alias("c"),
    ).select(
        "user_id",
        "n",
        F.round(
            -(F.col("c").cast("double") / F.col("n"))
            * F.log(F.col("c").cast("double") / F.col("n")),
            6,
        ).alias("h_term"),
    )
    ent = terms.groupBy("user_id").agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("h_term").cast("decimal(38,18)")).cast("double").alias("h"),
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return ent.groupBy("n_types").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        q6(
            F.sum(F.col("h").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_entropy_nats"),
        q6(F.max("h")).alias("max_entropy_nats"),
    )
