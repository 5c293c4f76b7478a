"""Group E — window functions (SURVEY.md §2-E).

Reference surface: Dask ``rolling(n)`` / ``rolling('1H')`` (overlap-partition
implementation), ``cumsum/cummax``, ``shift/diff``, grouped versions via
``groupby.apply``. Spark's ``Window.partitionBy().orderBy()`` with
row/range frames is strictly more general and runs as a single
Window physical operator after one exchange on the partition key.

Scale notes (100 TB):
- Every window here is keyed (``partitionBy``) — state per key is bounded and
  partitions parallelize. An *unpartitioned* ordered window would serialize
  the whole table through one task; none is used (f1 asserts global sort in
  tests instead).
- Dask's rolling implementation materializes overlapping partition edges
  (``map_overlap``); Spark's Window does the same internally per partition —
  no custom code needed.
- Window float sums use the decimal-cast pattern (exact, order-insensitive)
  — same hash-stability rationale as group D.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load

_DEC = "decimal(28,6)"


@query(
    "e1_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
    FROM orders
    """,
)
def e1_row_number(spark, sf_dir):
    """Per-group sequence (Dask ``groupby.cumcount``) — unique o_orderkey
    tiebreak makes row numbers deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
    )


@query(
    "e2_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INTEGER) AS drnk
    FROM lineitem
    """,
)
def e2_rank_dense(spark, sf_dir):
    """rank / dense_rank — tie-stable by definition (equal keys, equal rank)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "e3_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def e3_lag_lead(spark, sf_dir):
    """shift(±1) per key (Dask ``groupby.shift``)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@query(
    "e4_diff",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS value_diff
    FROM events
    """,
)
def e4_diff(spark, sf_dir):
    """diff() = x - shift(x): one subtraction on top of e3's lag."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(w)).alias("value_diff"),
    )


@query(
    "e5_cumsum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def e5_cumsum(spark, sf_dir):
    """Running total (Dask ``groupby.cumsum``) — decimal-cast for exactness."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_total"),
    )


@query(
    "e6_cummax",
    oracle="""
    SELECT o_custkey, o_orderkey,
           MAX(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max,
           MIN(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_min
    FROM orders
    """,
)
def e6_cummax(spark, sf_dir):
    """Running max/min (Dask ``cummax/cummin``) — exact, no float concerns."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.max("o_totalprice").over(w).alias("running_max"),
        F.min("o_totalprice").over(w).alias("running_min"),
    )


@query(
    "e7_rolling_rows",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS rolling_avg_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def e7_rolling_rows(spark, sf_dir):
    """Fixed-size rolling mean (Dask ``rolling(5).mean()``) — decimal sum over
    the frame divided by the frame count, hash-stable."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(F.col("value").cast(_DEC)).over(w).cast("double") / F.count("value").over(w)).alias(
            "rolling_avg_5"
        ),
    )


@query(
    "e8_rolling_time",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS value_1h
    FROM events
    """,
)
def e8_rolling_time(spark, sf_dir):
    """Time-based rolling window (Dask ``rolling('1H')``) as a RANGE frame
    over whole epoch-seconds. Both engines order by the *truncated* epoch —
    DuckDB's EPOCH() is fractional, Spark's unix_timestamp is integral, so
    the truncation is pinned explicitly on the oracle side."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("value_1h"),
    )


@query(
    "e9_ntile_share",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile,
           o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER (PARTITION BY o_custkey) AS DOUBLE) AS share_of_customer
    FROM orders
    """,
)
def e9_ntile_share(spark, sf_dir):
    """ntile + percent-of-partition (Dask: rank-apply idiom)."""
    o = load(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(wo).alias("quartile"),
        (
            F.col("o_totalprice")
            / F.sum(F.col("o_totalprice").cast(_DEC)).over(wp).cast("double")
        ).alias("share_of_customer"),
    )


@query(
    "e10_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def e10_topk_per_group(spark, sf_dir):
    """Per-group top-k (Dask ``groupby.apply(head)``) — the row_number≤k
    pattern; Spark pushes the rank filter into the Window operator
    (WindowGroupLimit) so only k rows per key survive the sort buffer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "e11_percent_rank_cume",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey), 6) AS cume
    FROM orders
    """,
)
def e11_percent_rank_cume(spark, sf_dir):
    """Relative ranks (pandas ``rank(pct=True)`` family): percent_rank and
    cume_dist per customer, total-ordered for determinism."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "e12_cumprod",
    oracle="""
    SELECT o_orderkey, l_linenumber,
           CAST(ROUND(CAST(EXP(SUM(LN(1.0 + l_discount)) OVER (
                 PARTITION BY o_orderkey ORDER BY l_linenumber)) AS DECIMAL(18,10)), 4)
                AS DOUBLE) AS cum_growth
    FROM (SELECT l_orderkey AS o_orderkey, l_linenumber, l_discount FROM lineitem)
    """,
)
def e12_cumprod(spark, sf_dir):
    """Running product (Dask ``cumprod``) over positive factors via the
    log-sum-exp identity — Spark has no product aggregate; ``exp(sum(ln))``
    stays in codegen and is numerically identical on both engines after
    one rounding. Factors here are (1 + discount) growth multipliers."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    cum = F.exp(F.sum(F.log(F.lit(1.0) + F.col("l_discount"))).over(w))
    return li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.round(cum.cast("decimal(18,10)"), 4).cast("double").alias("cum_growth"),
    )


@query(
    "e13_ewm",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i
      FROM events
    )
    SELECT user_id, event_id,
           FLOOR(
             CAST(SUM(CAST(value * POW(1.0 / 0.7, i) AS DECIMAL(38,10)))
                    OVER w AS DOUBLE)
             / CAST(SUM(CAST(POW(1.0 / 0.7, i) AS DECIMAL(38,10)))
                    OVER w AS DOUBLE)
             * 10000 + 0.5) / 10000 AS ewm_value
    FROM seq
    WINDOW w AS (PARTITION BY user_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def e13_ewm(spark, sf_dir):
    """Exponentially-weighted mean per key (Dask/pandas ``ewm.mean``,
    adjust=True) — promoted in round 2 from an ``applyInPandas`` recurrence
    to a PURE WINDOW closed form with a full SQL oracle:

        ewm_t = Σᵢ xᵢ·r⁻ⁱ / Σᵢ r⁻ⁱ   (r = 1-α; the rᵗ factors cancel)

    so two running windowed sums give the exact adjusted EWM with no Python
    in the row path. Products are DECIMAL-cast before summation (d6/d11
    discipline) so both engines add exactly regardless of their window-sum
    association order; the result is FLOOR-quantized (§7.6.2). Equality
    with pandas ``ewm(alpha=0.3, adjust=True)`` stays asserted in tests.

    Numerics at scale: r⁻ⁱ grows ~e^0.357i, overflowing double near
    i≈2000 — but weights older than ~200 lags contribute < 1e-31
    relative, so production restarts the recurrence per bounded block
    (size ≪ 2000) and stitches with one carry term; fixture histories are
    ≤ 99 rows, well inside the exact regime."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    i = F.row_number().over(w_ord) - 1
    seq = e.withColumn("i", i)
    w = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rinv = F.pow(F.lit(1.0 / 0.7), F.col("i"))
    num = F.sum((F.col("value") * rinv).cast("decimal(38,10)")).over(w)
    den = F.sum(rinv.cast("decimal(38,10)")).over(w)
    ewm = F.floor(
        num.cast("double") / den.cast("double") * 10000 + F.lit(0.5)
    ) / 10000
    return seq.select("user_id", "event_id", ewm.alias("ewm_value"))


@query(
    "e14_resample",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    agg AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    )
    SELECT grid.day AS day, COALESCE(cnt, 0) AS cnt,
           COALESCE(sum_value, 0.0) AS sum_value
    FROM grid LEFT JOIN agg ON grid.day = agg.day
    """,
)
def e14_resample(spark, sf_dir):
    """Time resampling with gap fill (pandas/Dask ``resample('1D').agg`` —
    empty buckets PRESENT with zeros, which plain date_trunc+groupBy loses):
    aggregate per day, then left-join onto the full day grid built with
    ``sequence(min, max, interval 1 day)`` exploded. The grid is derived
    from a bounded 2-value aggregate (broadcast), so the fill is
    scale-free; the data-side agg is the usual partial+final."""
    e = load(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return grid.join(agg, "day", "left").select(
        "day",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "e15_value_window",
    oracle="""
    SELECT user_id,
           MAX(fv) AS first_val, MAX(lv) AS last_val, MAX(nv2) AS second_val,
           MAX(fbig) AS first_big, COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             FIRST_VALUE(value) OVER w AS fv,
             LAST_VALUE(value) OVER w AS lv,
             NTH_VALUE(value, 2) OVER w AS nv2,
             FIRST_VALUE(CASE WHEN value >= 50.0 THEN value END IGNORE NULLS)
               OVER w AS fbig
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ) GROUP BY user_id
    """,
)
def e15_value_window(spark, sf_dir):
    """Window value functions — ``FIRST_VALUE``/``LAST_VALUE``/``NTH_VALUE``
    over a full frame, plus the IGNORE NULLS variant ("first event meeting a
    condition, in time order"). Ordering key (ts, event_id) is a total order
    (event_id unique), so every picked value is deterministic. One shuffle by
    user_id; the full-frame functions evaluate in a single sorted pass per
    partition. The per-user collapse reuses the same exchange (no second
    shuffle — groupBy key == window partition key)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    big = F.when(F.col("value") >= 50.0, F.col("value"))
    rows = e.select(
        "user_id",
        F.first("value").over(w).alias("fv"),
        F.last("value").over(w).alias("lv"),
        F.nth_value("value", 2).over(w).alias("nv2"),
        F.first(big, ignorenulls=True).over(w).alias("fbig"),
    )
    return rows.groupBy("user_id").agg(
        F.max("fv").alias("first_val"),
        F.max("lv").alias("last_val"),
        F.max("nv2").alias("second_val"),
        F.max("fbig").alias("first_big"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "e16_scd2_intervals",
    oracle="""
    SELECT user_id,
           ROW_NUMBER() OVER w AS version,
           value AS state_value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'click'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e16_scd2_intervals(spark, sf_dir):
    """SCD Type-2 interval construction from a changelog: each per-user
    change event becomes a versioned row with ``[valid_from, valid_to)``
    validity and an ``is_current`` flag (open interval) — the standard
    warehouse pattern for point-in-time joins. ROW_NUMBER + LEAD share one
    window spec, so Catalyst evaluates both in a single sorted pass after one
    shuffle by user_id; (ts, event_id) is a total order so versions are
    deterministic."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "e17_rolling_corr",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts, event_id, value AS x,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events WHERE event_type = 'view'
    ),
    sums AS (
      SELECT user_id, ts, event_id,
             COUNT(y) OVER w AS n,
             CAST(SUM(CASE WHEN y IS NOT NULL
                  THEN CAST(x AS DECIMAL(28,6)) END) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sxy,
             CAST(SUM(CASE WHEN y IS NOT NULL
                  THEN CAST(x * x AS DECIMAL(28,6)) END) OVER w AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,6))) OVER w AS DOUBLE) AS syy
      FROM lagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, n,
           ROUND((sxy - sx * sy / n)
                 / NULLIF(SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 0),
                 8) AS roll_autocorr
    FROM sums WHERE n >= 2
    """,
)
def e17_rolling_corr(spark, sf_dir):
    """Rolling autocorrelation (pandas ``rolling(20).corr(shifted)``): per
    user, Pearson corr between each view's value and the previous one over a
    trailing 20-row frame — computed from five DECIMAL rolling sums and the
    closed-form corr identity, so both engines agree bitwise before the
    rounded divide (same discipline as d11/d23, applied to moving frames).
    The lag window and all five rolling sums share one (partition, order)
    spec → Catalyst evaluates them in a single shuffle + sort; per-row state
    is the 20-row frame. Pairs where y is NULL (first row) are excluded from
    every sum so n/sx/sxx count the same rows the products do."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = order.rowsBetween(-19, Window.currentRow)
    dec = "decimal(28,6)"
    x = F.col("value")
    y = F.lag("value").over(order)
    pair = F.when(y.isNotNull(), x)
    n = F.count(y).over(w)
    sx = F.sum(pair.cast(dec)).over(w).cast("double")
    sy = F.sum(y.cast(dec)).over(w).cast("double")
    sxy = F.sum((x * y).cast(dec)).over(w).cast("double")
    sxx = F.sum(F.when(y.isNotNull(), x * x).cast(dec)).over(w).cast("double")
    syy = F.sum((y * y).cast(dec)).over(w).cast("double")
    corr = (sxy - sx * sy / n) / F.nullif(
        F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), F.lit(0.0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            n.alias("n"),
            F.round(corr, 8).alias("roll_autocorr"),
        )
        .filter(F.col("n") >= 2)
    )


def interpolate_time_weighted(df, key: str, ts: str, order: tuple, value: str):
    """Reusable time-weighted linear gap fill (pandas
    ``interpolate(method='index', limit_direction='both')``): adds
    ``v_interp`` — ``value`` where observed, otherwise the interpolation
    between the bracketing observations positioned on the
    epoch-microsecond axis, falling back to the nearest observation at
    partition edges. One per-key sort serves all four IGNORE-NULLS window
    frames (single Exchange). Property-tested against pandas in
    tests/test_operators.py."""
    tus = F.unix_micros(F.col(ts).cast("timestamp"))
    back = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value)
    t_obs = F.when(v.isNotNull(), tus)
    b = df.select(
        "*",
        tus.alias("_tus"),
        F.last(v, ignorenulls=True).over(back).alias("_pv"),
        F.last(t_obs, ignorenulls=True).over(back).alias("_pt"),
        F.first(v, ignorenulls=True).over(fwd).alias("_nv"),
        F.first(t_obs, ignorenulls=True).over(fwd).alias("_nt"),
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .when(F.col("_nt") == F.col("_pt"), F.col("_pv"))
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (F.col("_tus") - F.col("_pt"))
            / (F.col("_nt") - F.col("_pt"))
        )
    )
    return b.withColumn("v_interp", interp).drop("_tus", "_pv", "_pt", "_nv", "_nt")


@query(
    "e18_interpolate",
    oracle="""
    WITH gapped AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      FROM events
    ),
    bounds AS (
      SELECT event_id, user_id, ts, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM gapped
    )
    SELECT event_id, user_id, ts,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             WHEN nt = pt THEN pv
             ELSE pv + (nv - pv) * (epoch_us(ts) - pt) / (nt - pt)
           END, 6) AS v_interp
    FROM bounds
    """,
)
def e18_interpolate(spark, sf_dir):
    """Time-weighted linear interpolation of missing values (pandas
    ``Series.interpolate(method='index')`` on a DatetimeIndex — the standard
    sensor-gap fill). Nulls are synthesized deterministically ('view' events
    lose their value), then two IGNORE-NULLS window passes find the bracketing
    observations and their event times; the gap position interpolates on the
    epoch-microsecond axis. Boundary rows fall back to nearest-neighbor
    (pandas ``limit_direction='both'``). One sort per user partition serves
    all four window frames — a single Exchange in the plan; interpolation
    arithmetic is identical IEEE on both engines."""
    e = load(spark, sf_dir, "events")
    gapped = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_time_weighted(
        gapped, key="user_id", ts="ts", order=("ts", "event_id"), value="v"
    )
    return out.select(
        "event_id", "user_id", "ts", F.round(F.col("v_interp"), 6).alias("v_interp")
    )


@query(
    "e19_pct_change",
    oracle="""
    SELECT event_id, user_id, ts,
           FLOOR((value - LAG(value) OVER w)
                 / NULLIF(LAG(value) OVER w, 0.0) * 1000000 + 0.5) / 1000000
             AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e19_pct_change(spark, sf_dir):
    """Fractional change from the previous observation per key (pandas
    ``groupby.pct_change``): one LAG window; a zero base becomes NULL via
    NULLIF on both engines (pandas emits inf — NULL is the SQL convention,
    documented divergence). Rides the same per-user sort as every other
    e-group window — Catalyst reuses the Exchange when composed."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        # FLOOR quantizer, not round(): a midpoint pct (observed at sf0.1)
        # flips between Spark round and DuckDB ROUND; FLOOR is engine-exact
        (
            F.floor(
                (F.col("value") - prev) / F.nullif(prev, F.lit(0.0)) * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("pct_change"),
    )


@query(
    "e20_rank_average",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
             + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
               / 2.0 AS avg_rank
    FROM lineitem
    """,
)
def e20_rank_average(spark, sf_dir):
    """pandas' default ranking, ``rank(method='average')`` — tied values get
    the MEAN of the positions they occupy. Neither engine ships it as a
    builtin; the closed form is min-rank + (tie-size − 1)/2, i.e. one
    ordered RANK window plus one unordered per-(group, value) COUNT window
    over the same partition sort. Exact integer arithmetic until the final
    halving — no float-order risk."""
    li = load(spark, sf_dir, "lineitem")
    wr = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wt = Window.partitionBy("l_returnflag", "l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        (
            F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0
        ).alias("avg_rank"),
    )


@query(
    "e21_group_transform",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND((o_totalprice - sx / n)
                 / SQRT((sx2 - (sx / n) * (sx / n) * n) / (n - 1)), 6)
             AS z_price
    FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             COUNT(o_totalprice) OVER w AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w
                  AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,6)))
                  OVER w AS DOUBLE) AS sx2
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority)
    )
    """,
)
def e21_group_transform(spark, sf_dir):
    """pandas ``groupby().transform()`` — a group aggregate broadcast back
    onto every member row (here: within-priority z-score of the order
    price). No join: an unordered window partition computes the group's
    decimal-exact count/sum/sum-of-squares next to each row in one
    exchange, and the z-score arithmetic is the identical double-op
    sequence on both engines (mean = sx/n, var = (sx2 - mean²·n)/(n-1)),
    so the hash can't drift. The frame is the whole partition — Spark
    evaluates it once per group, not per row."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    x = F.col("o_totalprice")
    n = F.count(x).over(w)
    sx = F.sum(x.cast("decimal(28,6)")).over(w).cast("double")
    sx2 = F.sum((x * x).cast("decimal(28,6)")).over(w).cast("double")
    mean = sx / n
    var = F.try_divide(sx2 - mean * mean * n, n - 1)  # NULL for 1-row keys (DuckDB x/0 parity)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.try_divide(x - mean, F.sqrt(var)), 6).alias("z_price"),
    )


@query(
    "e22_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           ROUND(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_med
    FROM events
    """,
)
def e22_rolling_median(spark, sf_dir):
    """pandas ``rolling(5).median()`` — an order-statistic over a sliding
    row frame, the robust-smoothing cousin of e7's rolling mean (outliers
    shift a mean but not a median). Spark's ``median`` refuses a window
    frame but the equivalent ``percentile(x, 0.5)`` accepts one; both
    engines interpolate the even-count midpoint
    identically on doubles, and the computation is sort-based (no
    summation-order float drift). Keyed frames → one exchange + one
    in-partition sort; state is the 5-row frame."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias(
            "rolling_med"
        ),
    )


@query(
    "e23_ffill",
    oracle="""
    SELECT event_id, user_id,
           ROUND(LAST_VALUE(pv IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS last_purchase,
           ROUND(FIRST_VALUE(pv IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 4) AS next_purchase
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pv
      FROM events
    )
    """,
)
def e23_ffill(spark, sf_dir):
    """Forward / backward fill (pandas/Dask ``ffill``/``bfill``,
    ``groupby.ffill``): carry the last observed purchase value forward —
    and the next one backward — across each user's event sequence. The
    sparse column is NULL except on 'purchase' rows; the fill is
    ``last(..., ignorenulls=True)`` over an unbounded-preceding row frame
    (and ``first`` over the mirror frame), the direct Spark expression of
    pandas' fill semantics. Order is pinned (ts, event_id) so ties are
    deterministic.

    Dask implements ffill via ``map_overlap`` (each partition needs its
    predecessor's tail); Spark's Window does the same boundary exchange
    internally after one hash exchange on user_id.

    100 TB: keyed window — state per user is one running value, partitions
    parallelize; both fills share the single (user_id) exchange and sort.
    """
    e = load(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.last(pv, ignorenulls=True).over(wf), 4).alias("last_purchase"),
        F.round(F.first(pv, ignorenulls=True).over(wb), 4).alias("next_purchase"),
    )


@query(
    "e24_expanding",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS exp_n,
           FLOOR(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w * 10000 + 0.5) / 10000 AS exp_mean,
           MAX(value) OVER w AS exp_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def e24_expanding(spark, sf_dir):
    """pandas ``expanding()`` aggregates (count/mean/max) per user over the
    event sequence — the anytime-prefix statistics family. One keyed window
    (single exchange + sort) carries all three aggregates; the mean is a
    decimal-exact running sum divided by the running count, so the division
    is one IEEE op on both engines (the e5/d11 discipline).

    Rounding caveat (now a SURVEY §7.6 rule): quotients land on near-tie
    doubles like 38.045249999999996, where Spark's ``round`` (half-up on
    the SHORTEST-DECIMAL repr → .0452), DuckDB's ``ROUND`` (binary value),
    and DuckDB's double→DECIMAL casts (repeated-rounding carry → .0453)
    all disagree with each other. The only construct measured to agree
    bit-for-bit is arithmetic quantization from identical IEEE ops on both
    engines: ``FLOOR(x * 1e4 + 0.5) / 1e4`` — used here on both sides.

    100 TB: identical profile to e5 — per-key running state is O(1), keys
    parallelize; never a per-prefix re-aggregation.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        n.alias("exp_n"),
        (
            F.floor(
                F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
                / n
                * 10000
                + 0.5
            )
            / 10000
        ).alias("exp_mean"),
        F.max("value").over(w).alias("exp_max"),
    )


@query(
    "e25_lag_skip_nulls",
    oracle="""
    SELECT event_id, user_id,
           ROUND(LAG(pv IGNORE NULLS) OVER w, 4) AS prev_purchase,
           ROUND(LEAD(pv IGNORE NULLS) OVER w, 4) AS next_purchase_excl
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pv
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e25_lag_skip_nulls(spark, sf_dir):
    """``LAG/LEAD ... IGNORE NULLS`` — the STRICTLY-BEFORE variant of
    e23's fill family (pandas: shift the last-valid forward, excluding the
    current row): on a purchase row, ``prev_purchase`` is the PREVIOUS
    purchase, not itself — the semantics leak-free feature engineering
    needs ("value of the last prior conversion"), where e23's
    running-last would leak the current row's own label. Offset functions
    with null-skipping are ANSI; both engines agree exactly (probed,
    including the all-null prefix → NULL case).

    100 TB: same single keyed window pass as e3 — per-key state is one
    remembered value in each direction.
    """
    e = load(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # F.lag/F.lead don't expose ignoreNulls in PySpark; the SQL form does.
    return e.withColumn("pv", pv).select(
        "event_id",
        "user_id",
        F.round(F.expr("lag(pv, 1) IGNORE NULLS").over(w), 4).alias(
            "prev_purchase"
        ),
        F.round(F.expr("lead(pv, 1) IGNORE NULLS").over(w), 4).alias(
            "next_purchase_excl"
        ),
    )


@query(
    "e26_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts))
                  AS BIGINT) AS day_n
      FROM events
    ),
    islands AS (
      SELECT user_id, day_n,
             day_n - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_n)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_len,
             MIN(day_n) AS streak_start
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MIN(streak_start) AS BIGINT) AS first_active_day
    FROM streaks GROUP BY user_id
    """,
)
def e26_streaks(spark, sf_dir):
    """Gaps-and-islands (consecutive-day activity streaks per user — the
    engagement metric behind "7-day streak" features): distinct active
    day numbers per user, island id = day − row_number (constant within
    every consecutive run — the classic identity), then streak lengths
    and the per-user longest. Distinct from k3's session windows: islands
    are INTEGER-consecutive runs, not time-gap clusters.

    100 TB: dedup to (user, day) grain first — the only fact-scale
    shuffle; the island window and both rollups all reuse the user_id
    partitioning (one exchange total after the dedup).
    """
    e = load(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(
                F.date_trunc("day", F.col("ts")),
                F.lit("2024-01-01").cast("timestamp_ntz"),
            )
            .cast("bigint")
            .alias("day_n"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_n")
    islands = days.withColumn(
        "island", F.col("day_n") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day_n").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("streak_start").alias("first_active_day"),
    )


@query(
    "e27_last_touch_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'click'
                  THEN CAST(props->>'$.k' AS INTEGER) END AS click_channel
      FROM events
    ),
    attributed AS (
      SELECT user_id, event_type, value,
             LAG(click_channel IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS channel
      FROM tagged
    )
    SELECT COALESCE(CAST(channel AS VARCHAR), 'unattributed') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM attributed WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def e27_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution (the marketing-analytics standard): each
    purchase's revenue is credited to the channel of the most recent PRIOR
    click by the same user — e25's strictly-before null-skipping LAG
    carrying the click's channel (here the ``props.k`` field) onto every
    subsequent row; purchases with no preceding click fall into an
    explicit 'unattributed' bucket rather than dropping (the reporting
    contract). Revenue rolls up per channel decimal-exact.

    100 TB: one keyed window pass over the event stream plus a
    channel-cardinality aggregate — the same cost as e3; multi-touch
    models (linear/time-decay) extend the same pass with collect_list
    over the frame instead of LAG.
    """
    e = load(spark, sf_dir, "events")
    tagged = e.withColumn(
        "click_channel",
        F.when(
            F.col("event_type") == "click",
            F.get_json_object("props", "$.k").cast("int"),
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    attributed = tagged.withColumn(
        "channel", F.expr("lag(click_channel, 1) IGNORE NULLS").over(w)
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("channel").cast("string"), F.lit("unattributed")).alias(
                "channel"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "e28_twap",
    oracle="""
    WITH stepped AS (
      SELECT user_id, value,
             EPOCH_US(ts) AS t,
             LEAD(EPOCH_US(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    ),
    contrib AS (
      SELECT user_id,
             CAST(value * (t_next - t) AS DECIMAL(28,6)) AS vdt,
             t_next - t AS dt
      FROM stepped WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) + 1 AS n_samples,
           CAST(SUM(dt) AS BIGINT) AS span_us,
           FLOOR(CAST(SUM(vdt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS twap
    FROM contrib
    GROUP BY user_id
    HAVING SUM(dt) > 0
    """,
)
def e28_twap(spark, sf_dir):
    """Time-weighted average price/value (TWAP) over IRREGULARLY-sampled
    per-key series — the standard financial/IoT summary where a plain AVG
    over-weights bursts: each observation holds (step function) until the
    next one, contributing ``value·Δt``; the key's TWAP is
    Σ value·Δt / Σ Δt. One keyed window (LEAD over the user's time order)
    + one aggregation — the same two-exchange shape as any lag/diff
    operator, per-key state is a single row.

    Determinism: Δt is exact integer microseconds, ``value·Δt`` is
    quantized to DECIMAL(28,6) before the order-insensitive sum, and the
    final division is one double op — the SQL oracle matches bitwise.
    Keys with a zero time span (all events simultaneous) are excluded
    (HAVING span > 0) rather than emitting a 0/0.

    100 TB: hash-partition by key, sort within partition — AQE-skew-safe;
    nothing driver-side."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("t_next"),
    )
    contrib = stepped.filter(F.col("t_next").isNotNull()).select(
        "user_id",
        (F.col("value") * (F.col("t_next") - F.col("t")))
        .cast("decimal(28,6)")
        .alias("vdt"),
        (F.col("t_next") - F.col("t")).alias("dt"),
    )
    return (
        contrib.groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_samples"),
            F.sum("dt").cast("bigint").alias("span_us"),
            (
                F.floor(
                    F.sum("vdt").cast("double")
                    / F.sum("dt").cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("twap"),
        )
        .filter(F.col("span_us") > 0)
    )


@query(
    "e29_autocorr",
    oracle="""
    WITH lagged AS (
      SELECT user_id, value AS x,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT user_id,
             COUNT(y) AS n,
             CAST(SUM(CASE WHEN y IS NOT NULL
                  THEN CAST(x AS DECIMAL(28,6)) END) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CASE WHEN y IS NOT NULL
                  THEN CAST(x * x AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM lagged GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           FLOOR((sxy - sx * sy / n)
                 / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
                 * 1000000 + 0.5) / 1000000 AS lag1_autocorr
    FROM m
    WHERE n >= 10
      AND (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
    """,
)
def e29_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation per key (pandas/Dask ``Series.autocorr``) —
    the is-this-series-random screen monitoring runs before fitting any
    forecaster (x10) or alerting on drift (p14): Pearson correlation of
    each user's click-value series against itself shifted by one, from one
    LAG window pass + one-pass decimal moments (the e17/d11 discipline, so
    every correlation matches DuckDB exactly after FLOOR quantization).
    Keys need ≥10 lag pairs and nonzero variance on both sides — the same
    guard any statistics package applies before quoting a correlation.

    100 TB: one shuffle by key (the LAG window), then a keyed one-pass
    aggregate — identical cost profile to e4/e17; higher lags reuse the
    same plan with LAG(value, k)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = (
        e.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("value").alias("x"),
            F.lag("value").over(w).alias("y"),
        )
    )
    has_y = F.col("y").isNotNull()
    m = lagged.groupBy("user_id").agg(
        F.count("y").alias("n"),
        F.sum(F.when(has_y, F.col("x").cast("decimal(28,6)")))
        .cast("double")
        .alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.when(has_y, (F.col("x") * F.col("x")).cast("decimal(28,6)")))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("syy"),
    )
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    return (
        m.filter((F.col("n") >= 10) & (varx * vary > 0))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_pairs"),
            (
                F.floor(cov / F.sqrt(varx * vary) * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("lag1_autocorr"),
        )
    )
