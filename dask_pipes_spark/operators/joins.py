"""Group C — joins (SURVEY.md §2-C).

Reference surface: ``dd.merge`` (hash-shuffle equi-join, broadcast for small
sides, sorted-divisions merge), semi/anti via indicator idioms, ``merge_asof``.
Spark covers all of it natively and picks the physical strategy per-plan:
BroadcastHashJoin under the threshold, SortMergeJoin/ShuffledHashJoin above,
with AQE converting to broadcast at runtime and splitting skewed partitions.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier) are explicitly ``F.broadcast`` —
  no shuffle of the fact side.
- Fact-fact joins (orders⋈lineitem) shuffle both sides on the key; that is
  the correct plan — at 100 TB you'd additionally bucket both tables on the
  join key at write time to eliminate the exchange (see a3's partitioned
  write for the mechanism).
- The range join (c10) uses bucket-equi-join + residual filter instead of a
  BroadcastNestedLoopJoin — the BNLJ is O(n·m) and dies at scale; bucketing
  makes it O(n+m) shuffle plus a bounded candidate set.
- The as-of join (c11) is a union + running-last window — one shuffle, no
  per-key loops; Dask's merge_asof requires sorted divisions for the same
  reason.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import dsum, query, sql_dsum
from dask_pipes_spark.session import load, load_tables


@query(
    "c1_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def c1_join_inner(spark, sf_dir):
    """Equi inner join (Dask ``merge(how='inner')``); Catalyst picks the
    physical strategy (broadcast here — customer is small relative to the
    threshold; SMJ on a real cluster once both sides are large)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "c2_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def c2_join_left(spark, sf_dir):
    """Left outer join — customers with no orders survive with NULLs."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


@query(
    "c3_join_right",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def c3_join_right(spark, sf_dir):
    """Right outer join (mirror of c2, exercising the plan path)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey, "right")
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name")
    )


@query(
    "c4_join_full",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer FULL JOIN orders ON c_custkey = o_custkey
    """,
)
def c4_join_full(spark, sf_dir):
    """Full outer join (Dask ``how='outer'``)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "full")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


@query(
    "c5_join_broadcast",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_customers, {sql_dsum('c_acctbal')} AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def c5_join_broadcast(spark, sf_dir):
    """Explicit broadcast of a dimension table — the 100 TB enrich pattern:
    the fact side never shuffles for the join (only for the tiny group-agg)."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "c6_join_multikey",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, COUNT(*) AS pair_cnt,
             {sql_dsum('l_quantity')} AS pair_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
           ps.pair_cnt, ps.pair_qty
    FROM lineitem l JOIN ps ON l.l_partkey = ps.l_partkey
                           AND l.l_suppkey = ps.l_suppkey
    """,
)
def c6_join_multikey(spark, sf_dir):
    """Composite-key equi join (Dask ``on=[k1,k2]``): lineitem enriched with
    per-(part,supp) aggregates. Both sides hash-partition on the same
    composite key, so the agg's shuffle is reused by the join."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("pair_cnt"), dsum("l_quantity").alias("pair_qty")
    )
    return li.join(ps, ["l_partkey", "l_suppkey"]).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "pair_cnt", "pair_qty"
    )


@query(
    "c7_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def c7_join_semi(spark, sf_dir):
    """Left semi join (Dask spells this ``isin``/indicator): customers with at
    least one big order. Semi joins never duplicate the left side and the
    right side reduces to distinct keys — the scalable form of ``isin``."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "c8_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def c8_join_anti(spark, sf_dir):
    """Left anti join (Dask indicator ``left_only``): customers with no big
    order (the unfiltered variant is empty on the fixtures)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "c9_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def c9_join_cross(spark, sf_dir):
    """Cartesian product — bounded inputs only (5×25 here); anything larger
    must go through blocking/bucketing (see c10, l3)."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query(
    "c10_join_range",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal + 10
    """,
)
def c10_join_range(spark, sf_dir):
    """Interval/theta join (Dask: cross+filter idiom) via *bucketed* equi-join.

    OSS Spark would plan the raw theta condition as BroadcastNestedLoopJoin —
    O(n·m), a non-starter at scale. Instead each supplier row is exploded to
    the (at most 3) width-20 buckets its ±10 window can touch, the join is an
    equi-join on the bucket id, and the exact BETWEEN is a residual filter.
    Identical results, shuffle-sized like an equi-join.
    """
    t = load_tables(spark, sf_dir, ("supplier", "customer"))
    width = 20  # bucket width ≥ window span so ±1 bucket covers the window
    sup = t["supplier"].withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("s_acctbal") - 10) / width),
                    F.floor(F.col("s_acctbal") / width),
                    F.floor((F.col("s_acctbal") + 10) / width),
                )
            )
        ),
    )
    cust = t["customer"].withColumn("bucket", F.floor(F.col("c_acctbal") / width))
    return (
        sup.join(cust, "bucket")
        .filter(
            F.col("c_acctbal").between(F.col("s_acctbal") - 10, F.col("s_acctbal") + 10)
        )
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
    )


def asof_join(probe, build, by, on, direction="backward"):
    """Generic as-of join (Dask/pandas ``merge_asof``), all three directions,
    exact matches allowed, per-key.

    ``probe``/``build``: DataFrames sharing the ``by`` key column(s) and the
    ``on`` ordering column; every other ``build`` column is a value column
    appended to each probe row (column names must not collide — rename
    first). ``build`` must be unique per (by, on) — pre-aggregate ties, as
    ASOF semantics are undefined for duplicate build timestamps.

    Algorithm (no per-key loops, one hash partitioning): union both sides
    tagged, then running ``last(ignorenulls)`` over the preceding frame
    (backward) / ``first(ignorenulls)`` over the following frame (forward) /
    both with a per-row gap comparison (nearest, ties → backward). Sort
    places build rows so that equal-``on`` rows stay visible to the probe in
    the frame direction. Nearest gaps compare at microsecond precision for
    timestamps (``unix_micros``), exact double for numerics.

    Scale: state per key is one running row — the Window operator streams
    each partition once; cost equals one shuffle + in-partition sort
    (nearest: two sorts, same single Exchange), the same profile as Dask's
    divisions-aligned merge_asof without requiring pre-sorted input.
    """
    by = [by] if isinstance(by, str) else list(by)
    val_cols = [c for c in build.columns if c not in by + [on]]
    probe_cols = [c for c in probe.columns if c not in by + [on]]
    overlap = set(val_cols) & set(probe_cols)
    if overlap:
        raise ValueError(f"column collision between probe and build: {sorted(overlap)}")
    b = build.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_probe"),
        *val_cols,
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_probe"),
        *[F.lit(None).cast(dict(build.dtypes)[c]).alias(c) for c in val_cols],
        *probe_cols,
    )
    u = b.unionByName(p)
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_is_probe").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = [F.last(c, ignorenulls=True).over(wb).alias(f"_m_{c}") for c in val_cols]
        u = u.select("*", *matched)
    elif direction == "forward":
        matched = [F.first(c, ignorenulls=True).over(wf).alias(f"_m_{c}") for c in val_cols]
        u = u.select("*", *matched)
    elif direction == "nearest":
        is_ts = dict(u.dtypes)["_t"].startswith("timestamp")
        tnum = F.unix_micros(F.col("_t").cast("timestamp")) if is_ts else F.col("_t").cast("double")
        u = u.withColumn("_tn_src", F.when(F.col("_is_probe") == 0, tnum))
        u = u.select(
            "*",
            tnum.alias("_tn"),
            F.last("_tn_src", ignorenulls=True).over(wb).alias("_bt"),
            F.first("_tn_src", ignorenulls=True).over(wf).alias("_ft"),
            *[F.last(c, ignorenulls=True).over(wb).alias(f"_b_{c}") for c in val_cols],
            *[F.first(c, ignorenulls=True).over(wf).alias(f"_f_{c}") for c in val_cols],
        )
        use_fwd = F.col("_bt").isNull() | (
            F.col("_ft").isNotNull()
            & ((F.col("_ft") - F.col("_tn")) < (F.col("_tn") - F.col("_bt")))
        )
        u = u.select(
            "*",
            *[
                F.when(use_fwd, F.col(f"_f_{c}")).otherwise(F.col(f"_b_{c}")).alias(f"_m_{c}")
                for c in val_cols
            ],
        )
    else:
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    return u.filter(F.col("_is_probe") == 1).select(
        *by,
        F.col("_t").alias(on),
        *probe_cols,
        *[F.col(f"_m_{c}").alias(c) for c in val_cols],
    )


@query(
    "c11_join_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX_BY(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_value AS last_click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def c11_join_asof(spark, sf_dir):
    """As-of join (Dask ``merge_asof`` backward, per-key, exact matches
    allowed): each purchase event picks the most recent click value of the
    same user at-or-before its timestamp.

    No native OSS-Spark operator. Algorithm (one shuffle, no per-key loops):
    union build+probe tagged by side, then a running
    ``last(value, ignorenulls)`` over (partition by key, order by (t, side))
    — build rows sort before probe rows at equal t, so exact matches are
    visible; filtering back to probe rows yields the asof match. Ties inside
    the build side are pre-collapsed with max_by(event_id) because ASOF
    semantics are undefined for duplicate build timestamps.

    Scale: the window is keyed (bounded state per user) and Spark's Window
    operator streams each partition once — the same cost profile as Dask's
    divisions-aligned merge_asof, but without requiring pre-sorted input.
    (Implementation shared with c14/c15: :func:`asof_join`.)
    """
    clicks, purchases = _asof_fixture_sides(spark, sf_dir)
    return asof_join(purchases, clicks, by="user_id", on="ts", direction="backward").select(
        "event_id", "user_id", "ts", "value", F.col("click_value").alias("last_click_value")
    )


def _asof_fixture_sides(spark, sf_dir):
    """Shared build/probe frames for the asof operators: clicks (build,
    tie-collapsed per (user, ts) with max_by) and purchases (probe)."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return clicks, purchases


@query(
    "c12_self_join",
    oracle="""
    SELECT a.o_custkey AS o_custkey, COUNT(*) AS n_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderdate < b.o_orderdate
    GROUP BY a.o_custkey
    """,
)
def c12_self_join(spark, sf_dir):
    """Self equi+range join: ordered order-pairs per customer. Aliased sides,
    equi key carries the shuffle, the date predicate is a residual filter."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = orders.alias("a")
    b = orders.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderdate") < F.col("b.o_orderdate")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def salted_join(big, small, big_key, small_key, salt: int = 8, how: str = "inner"):
    """Skew-mitigating equi-join: salt the big (skewed) side deterministically,
    replicate the small side ``salt`` ways, join on (key, salt).

    Semantically identical to ``big.join(small, big_key == small_key, how)``
    for inner/left joins; the hot key's rows spread over ``salt`` reducer
    partitions instead of one straggler task. This is the manual form of what
    AQE skew-join does at runtime; keep it for engines/paths where AQE is off
    (streaming joins, fixed-partition writes) or where the skew is known ahead
    of time and you want the plan, not a runtime rescue.

    100 TB note: replication multiplies the small side by ``salt`` — keep the
    small side dimension-sized (it is usually also broadcastable; salting
    matters when the small side is too big to broadcast but far smaller than
    the skewed fact side).
    """
    salted_big = big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), salt))
    salted_small = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_big.join(salted_small, (big_key == small_key) & (salted_big["_salt"] == salted_small["_salt"]), how)
    return out.drop("_salt")


@query(
    "c13_join_skew_salted",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items, {rev} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
)
def c13_join_skew_salted(spark, sf_dir):
    """Salted skew join (fact=lineitem, dim=orders ×8): same rowset as the
    plain equi-join — the oracle IS the plain join — but no single reducer
    ever owns a hot key. Salting is deterministic on the big side row id, so
    results are exactly reproducible."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    joined = salted_join(
        t["lineitem"],
        t["orders"].select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey"),
        F.col("o_orderkey"),
        salt=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "c14_join_asof_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX_BY(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_value AS next_click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def c14_join_asof_forward(spark, sf_dir):
    """Forward as-of join (Dask ``merge_asof(direction='forward')``): each
    purchase picks the *earliest* click of the same user at-or-after its
    timestamp. Mirror of c11: same union-tag, but the running pick is
    ``first(value, ignorenulls)`` over the *following* frame, with probe rows
    ordered before build rows at equal timestamps so exact matches stay
    visible. One shuffle, keyed bounded state — identical cost to c11.
    (Implementation shared with c11/c15: :func:`asof_join`.)"""
    clicks, purchases = _asof_fixture_sides(spark, sf_dir)
    return asof_join(purchases, clicks, by="user_id", on="ts", direction="forward").select(
        "event_id", "user_id", "ts", "value", F.col("click_value").alias("next_click_value")
    )


@query(
    "c15_join_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX_BY(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             c.ts AS bt, c.click_value AS bv
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
      SELECT p.event_id, c.ts AS ft, c.click_value AS fv
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT b.event_id, b.user_id, b.ts, b.value,
           CASE WHEN bv IS NULL THEN fv
                WHEN fv IS NULL THEN bv
                WHEN EPOCH(ft) - EPOCH(b.ts) < EPOCH(b.ts) - EPOCH(bt) THEN fv
                ELSE bv END AS nearest_click_value
    FROM b JOIN f ON b.event_id = f.event_id
    """,
)
def c15_join_asof_nearest(spark, sf_dir):
    """Nearest as-of join (Dask ``merge_asof(direction='nearest')``): each
    purchase picks the click whose timestamp is closest in either direction;
    ties go backward (the earlier click), matching the oracle's CASE.

    Both directional candidates come from the same union in one hash
    partitioning — two Window operators (backward running-last, forward
    running-first) differ only in sort order within the partition, so
    Catalyst plans one Exchange and two in-partition sorts. Gap comparison
    is at microsecond precision (``unix_micros``), matching the oracle's
    fractional ``EPOCH``. (Implementation shared with c11/c14:
    :func:`asof_join`.)"""
    clicks, purchases = _asof_fixture_sides(spark, sf_dir)
    return asof_join(purchases, clicks, by="user_id", on="ts", direction="nearest").select(
        "event_id", "user_id", "ts", "value", F.col("click_value").alias("nearest_click_value")
    )


@query(
    "c16_join_nullsafe",
    oracle="""
    WITH l AS (
      SELECT NULLIF(c_nationkey % 5, 2) AS k, COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    r AS (
      SELECT NULLIF(s_nationkey % 5, 2) AS k, COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT l.k AS k, n_cust, n_supp
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def c16_join_nullsafe(spark, sf_dir):
    """Null-safe equi-join (``<=>`` / SQL ``IS NOT DISTINCT FROM`` — the
    pandas ``merge`` behavior where NaN keys pair with NaN). Spark's
    ``eqNullSafe`` stays a hash-joinable equality (NULL hashes to a regular
    bucket), so Catalyst still picks BHJ/SMJ — no fallback to a nested-loop
    plan. Null keys are synthesized deterministically with NULLIF on both
    engines."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    left = (
        t["customer"]
        .select(F.nullif(F.col("c_nationkey") % 5, F.lit(2)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    right = (
        t["supplier"]
        .select(F.nullif(F.col("s_nationkey") % 5, F.lit(2)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        left.alias("l")
        .join(right.alias("r"), F.col("l.k").eqNullSafe(F.col("r.k")))
        .select(F.col("l.k").alias("k"), "n_cust", "n_supp")
    )


@query(
    "c17_asof_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX_BY(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_value END
             AS click_value_1h
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def c17_asof_tolerance(spark, sf_dir):
    """As-of join with a tolerance bound (pandas ``merge_asof(...,
    tolerance=Timedelta('1h'))``): the backward match is kept only when it
    lies within the window, else the value columns go NULL — attribution
    semantics ("the click that drove this purchase") rather than
    last-known-state. Implemented as the shared :func:`asof_join` with the
    build timestamp carried through as a value column and a row-local
    post-predicate at microsecond precision — the tolerance adds ZERO cost
    to the single-exchange asof plan, unlike a range join which would
    re-shuffle into time buckets."""
    clicks, purchases = _asof_fixture_sides(spark, sf_dir)
    build = clicks.withColumn("click_ts", F.col("ts"))
    out = asof_join(purchases, build, by="user_id", on="ts", direction="backward")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("click_ts").cast("timestamp")
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(gap_us <= 3600 * 1000 * 1000, F.col("click_value")).alias(
            "click_value_1h"
        ),
    )


@query(
    "c18_join_indicator",
    oracle="""
    WITH l AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 0
    ),
    r AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           CASE WHEN c_custkey IS NULL THEN 'right_only'
                WHEN o_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS _merge,
           c_acctbal, n_big
    FROM l FULL JOIN r ON c_custkey = o_custkey
    """,
)
def c18_join_indicator(spark, sf_dir):
    """Dask/pandas ``merge(indicator=True)``: full outer join carrying a
    ``_merge`` provenance column (``both`` / ``left_only`` / ``right_only``)
    derived from key nullness. The reference builds this with an internal
    category column; here it is a plain CASE over the outer join's null
    pattern — one shuffle on the key, no extra pass. Left side is
    positive-balance customers, right side is big-order counts, so all
    three categories are populated in the fixtures.

    100 TB: identical plan to c4 (full outer SMJ); the indicator is a
    zero-cost map-side projection above it.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    left = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_acctbal")
    )
    right = (
        t["orders"]
        .filter(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    joined = left.join(right, F.col("c_custkey") == F.col("o_custkey"), "full")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "right_only")
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("both")
        .alias("_merge"),
        "c_acctbal",
        "n_big",
    )


@query(
    "c19_range_bucket_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           COUNT(*) AS n_purch_1h,
           ROUND(CAST(SUM(CAST(p.value AS DECIMAL(28,6))) AS DOUBLE), 4)
             AS purch_value_1h
    FROM events e
    JOIN events p
      ON p.user_id = e.user_id
     AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    GROUP BY e.event_id, e.user_id
    """,
)
def c19_range_bucket_join(spark, sf_dir):
    """Bucketed range join — the SCALE PATH for c10's interval join
    (SURVEY.md §4.3): purchases within one hour after each error, same
    user. OSS Spark plans a bare interval predicate as BNLJ (quadratic);
    here the range key is bucketed to the interval width (1 h), the
    bounded probe interval (ts, ts+1h] spans at most two buckets, so the
    probe side is exploded to those two bucket ids and the join becomes an
    EQUI-join on (user_id, bucket) + a residual µs-exact filter. Each
    build row lives in exactly one bucket, so no candidate pair is
    produced twice.

    100 TB: the 2× probe fan-out replaces an O(n·m) per-key BNLJ with a
    shuffle-hash/SMJ equi-join — linear shuffle, AQE-skew-splittable; the
    idiom generalizes to any bounded-width interval (width-w probe spans
    ⌈w/bucket⌉+1 buckets). µs epoch arithmetic matches DuckDB's INTERVAL
    arithmetic exactly.
    """
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour_us = 3_600_000_000
    errors = (
        e.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", us.alias("e_us"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.col("e_us") / hour_us).cast("long"),
                    (F.col("e_us") / hour_us).cast("long") + 1,
                )
            ),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        us.alias("p_us"),
        (us / hour_us).cast("long").alias("p_bucket"),
        "value",
    )
    joined = errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("bucket") == F.col("p_bucket"))
        & (F.col("p_us") > F.col("e_us"))
        & (F.col("p_us") <= F.col("e_us") + hour_us),
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_purch_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4
        ).alias("purch_value_1h"),
    )


@query(
    "c20_merge_ordered",
    oracle="""
    WITH a AS (
      SELECT date_trunc('day', ts) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS purch_val
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    b AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS err_cnt
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT day,
           LAST_VALUE(purch_val IGNORE NULLS) OVER w AS purch_val_ff,
           LAST_VALUE(err_cnt IGNORE NULLS) OVER w AS err_cnt_ff
    FROM (
      SELECT COALESCE(a.day, b.day) AS day, purch_val, err_cnt
      FROM a FULL JOIN b ON a.day = b.day
    )
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def c20_merge_ordered(spark, sf_dir):
    """pandas ``merge_ordered(..., fill_method='ffill')``: outer-merge two
    time series on their ordered key, then forward-fill the gaps each side
    leaves. Series A = daily purchase value, series B = daily error count;
    the merge is a full outer join on day, the fill is e23's
    ``last(ignorenulls)`` over the day order.

    The fill window is UNPARTITIONED — correct to merge_ordered's global
    order semantics, and safe here because the frame is already reduced to
    calendar-day grain (dimension-sized) before the window. At 100 TB the
    rule stands: aggregate to the merge grain first, window the small
    frame; per-key variants add the key to partitionBy (e23).
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    a = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4
            ).alias("purch_val")
        )
    )
    b = (
        e.filter(F.col("event_type") == "error")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("err_cnt"))
    )
    merged = (
        a.join(b, on="day", how="full")
        .select("day", "purch_val", "err_cnt")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return merged.select(
        "day",
        F.last("purch_val", ignorenulls=True).over(w).alias("purch_val_ff"),
        F.last("err_cnt", ignorenulls=True).over(w).alias("err_cnt_ff"),
    )


@query(
    "c21_interval_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           COUNT(*) AS n_overlaps,
           ROUND(CAST(SUM(CAST(p.value AS DECIMAL(28,6))) AS DOUBLE), 4)
             AS overlap_value
    FROM events e
    JOIN events p
      ON p.user_id = e.user_id
     AND e.ts <= p.ts + INTERVAL 20 MINUTE
     AND p.ts <= e.ts + INTERVAL 30 MINUTE
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    GROUP BY e.event_id, e.user_id
    """,
)
def c21_interval_join(spark, sf_dir):
    """Interval-OVERLAP join (both sides are intervals — the temporal-join
    generalization of c19's point-in-interval): error incident windows
    [ts, ts+30m] × purchase sessions [ts, ts+20m], overlapping, same user.

    Scale shape: both interval sets are bucketed at width W; an interval
    touching k buckets is exploded to all k, the join is an EQUI-join on
    (user_id, bucket) + the overlap residual, and the duplicate-candidate
    problem (a pair sharing several buckets would match once per shared
    bucket) is solved by the CANONICAL-BUCKET rule — the pair is kept only
    in the bucket containing the overlap's START (floor(max(a_s,b_s)/W)),
    which every overlapping pair hits exactly once. No post-hoc distinct.

    100 TB: O(n·(L/W+2)) exploded rows instead of a per-key O(n·m) BNLJ;
    W trades fan-out against candidate precision — set W ≈ the typical
    interval length (here 30 min, fan-out ≤2× either side).
    """
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    W = 1_800_000_000  # 30-minute buckets, µs
    m30 = 30 * 60_000_000
    m20 = 20 * 60_000_000
    errors = (
        e.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", us.alias("a_s"), (us + m30).alias("a_e"))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("a_s") / W).cast("long"), (F.col("a_e") / W).cast("long")
                )
            ),
        )
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            us.alias("b_s"),
            (us + m20).alias("b_e"),
            "value",
        )
        .withColumn(
            "p_bucket",
            F.explode(
                F.sequence(
                    (F.col("b_s") / W).cast("long"), (F.col("b_e") / W).cast("long")
                )
            ),
        )
    )
    joined = errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("bucket") == F.col("p_bucket"))
        & (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        & (
            (F.greatest("a_s", "b_s") / W).cast("long") == F.col("bucket")
        ),
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4
        ).alias("overlap_value"),
    )


@query(
    "c22_join_hint_shuffle_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    """,
)
def c22_join_hint_shuffle_hash(spark, sf_dir):
    """Explicit join-strategy control (`hint("shuffle_hash")`): same rowset
    as a plain equi-join, but the physical strategy is pinned to
    ShuffledHashJoin — the right call when both sides exceed the broadcast
    threshold but one is small enough to hash-build per partition: SHJ
    skips BOTH sort phases of the default SMJ (asserted in
    tests/test_operators.py). The hint travels with the plan, so the
    choice is reviewable in `explain` instead of buried in a session conf.

    100 TB: SMJ's sorts dominate when the build side fits executor memory
    per partition; SHJ trades them for a hash build — but falls back badly
    under skew (no spill-friendly merge), so pair with AQE skew handling
    or salting (c13) when keys are hot. `broadcast`/`merge`/
    `shuffle_replicate_nl` hints complete the family.
    """
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 100000)
        .join(
            t["customer"].hint("shuffle_hash"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@query(
    "c23_bloom_runtime_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    GROUP BY l_returnflag
    """,
)
def c23_bloom_runtime_filter(spark, sf_dir):
    """Runtime Bloom-filter join pruning — the 100 TB lever for selective
    dim-filtered fact joins: when one join side carries a selective filter,
    Spark can inject a Bloom filter built from that side's join keys into
    the OTHER side's scan (``spark.sql.optimizer.runtime.bloomFilter``),
    so fact rows that cannot match are dropped AT THE SCAN, before the
    shuffle — the runtime analog of a semi-join reduction. Values are
    filter-independent (a Bloom filter only prunes non-matches), so the
    key carries a plain SQL oracle; the plan-level assertion that the
    bloom filter was actually injected lives in tests/test_operators.py.

    100 TB: the filter is built once from the (small) filtered dim side
    and broadcast to every scan task; shuffle volume on the fact side
    drops by the dim filter's selectivity — often 10-100×. Works with AQE
    and survives any partitioning, unlike manual pre-join semi-filters.
    """
    # Scoped configs, restored after the plan is pinned: the injection only
    # fires for SHUFFLE joins (a broadcast dim needs no runtime filter), so
    # broadcast is disabled — at 100 TB both sides exceed the threshold and
    # this IS the natural plan; the application-side scan threshold
    # (default 10GB, same reasoning) is zeroed to exercise the rule at
    # fixture scale.
    scoped = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in scoped.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        t = load_tables(spark, sf_dir, ("orders", "lineitem"))
        sel = t["orders"].filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        df = (
            t["lineitem"]
            .join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        # materialize the QueryExecution NOW so the plan (with the Bloom
        # filter injected) is pinned before the configs are restored
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df
