"""Group F — sorts / limits / top-k / sampling (SURVEY.md §2-F).

Reference surface: Dask ``sort_values`` (full shuffle sort), ``set_index``
(range repartition + per-partition sort = the divisions builder),
``nlargest`` (per-partition top-k + tree reduce), ``head``, ``sample``.

Spark equivalents are strictly stronger:
- ``orderBy`` plans a range-partitioned sample-based sort (Exchange
  rangepartitioning) — the same algorithm Dask's ``set_index`` uses, but
  sampled and AQE-balanced automatically.
- ``orderBy().limit(k)`` collapses to ``TakeOrderedAndProject`` — per
  -partition heap + driver merge, no global sort, O(k) memory: the plan that
  survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load


@query(
    "f1_sort_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    """,
)
def f1_sort_global(spark, sf_dir):
    """Global total-order sort (Dask ``sort_values``) — range exchange then
    per-partition sort. Sortedness itself is asserted in tests/ (the driver
    hash is order-insensitive)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
    )


@query(
    "f2_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
)
def f2_topk(spark, sf_dir):
    """nlargest(k) → TakeOrderedAndProject. Unique (orderkey, linenumber)
    tiebreakers make the k-th row deterministic."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "f3_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50
    """,
)
def f3_limit(spark, sf_dir):
    """head(n) after a deterministic sort (bare limit is nondeterministic in
    any distributed engine — banned by §7.6)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "f4_range_partition_sort",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS sorted_within_partitions,
           TRUE AS partition_bounds_monotonic
    FROM lineitem
    """,
)
def f4_range_partition_sort(spark, sf_dir):
    """set_index analog: ``repartitionByRange + sortWithinPartitions``.

    This is exactly how Dask builds ``divisions``: range-partition on the key
    (sampled boundaries) then sort each partition, yielding a globally sorted
    dataset without a total-order merge. Full oracle since round 5 via the
    d5-style verdict contract: partition ids are engine-specific and stay
    out of the emitted frame; instead the frame PROVES global sortedness —
    ``sorted_within_partitions`` (every row ≥ its predecessor in physical
    partition order, via lag over (partition, arrival-rank)) and
    ``partition_bounds_monotonic`` (each partition's min ≥ the previous
    partition's max — range boundaries really are ordered), plus the exact
    row count (nothing was lost in the exchange). The oracle recomputes the
    count and pins both verdicts TRUE, so the layout contract is hash-gated
    on every run. 100 TB: the verdict is one narrow window pass over the
    laid-out data plus an O(num_partitions) bounds check."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    laid = (
        li.select("l_extendedprice")
        .repartitionByRange(8, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .select(
            "l_extendedprice",
            F.spark_partition_id().alias("pid"),
            # per-partition monotonic row id — captures physical row order
            F.monotonically_increasing_id().alias("rid"),
        )
    )
    w = Window.partitionBy("pid").orderBy("rid")
    flagged = laid.withColumn(
        "ok",
        F.col("l_extendedprice")
        >= F.coalesce(F.lag("l_extendedprice").over(w), F.lit(float("-inf"))),
    )
    per_part = flagged.groupBy("pid").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.bool_and("ok").alias("sorted_within"),
    )
    wp = Window.orderBy("pid")
    bounded = per_part.withColumn(
        "bok", F.col("mn") >= F.coalesce(F.lag("mx").over(wp), F.lit(float("-inf")))
    )
    return bounded.agg(
        F.sum("c").alias("n_rows"),
        F.bool_and("sorted_within").alias("sorted_within_partitions"),
        F.bool_and("bok").alias("partition_bounds_monotonic"),
    )


@query("f5_sample")  # weak: RNG is engine-specific
def f5_sample(spark, sf_dir):
    """Seeded Bernoulli sample (Dask ``sample``). The row *set* is
    engine-specific RNG → weak check; tests assert the fraction is within
    binomial bounds and that the same seed reproduces the same rows."""
    return load(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)


@query("f6_stratified_sample")  # weak: RNG is engine-specific
def f6_stratified_sample(spark, sf_dir):
    """Stratified sample (Dask ``groupby().sample()`` idiom / pandas
    ``groupby.sample``): per-stratum Bernoulli fractions via ``sampleBy`` —
    one scan, no shuffle, each row kept with its stratum's probability.
    Weak check (engine RNG); tests assert per-stratum fractions land within
    binomial bounds and the seed reproduces exactly."""
    li = load(spark, sf_dir, "lineitem")
    fractions = {"A": 0.05, "N": 0.2, "R": 0.1}
    return li.sampleBy("l_returnflag", fractions, seed=42).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )


@query(
    "f7_random_split",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN CAST(('0x' || substr(md5(l_orderkey || ':' || l_linenumber
                                          || ':42'), 1, 15)) AS BIGINT) % 100 < 80
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY 1, 2
    """,
)
def f7_random_split(spark, sf_dir):
    """``random_split([0.8, 0.2], seed)`` (train/test split) done the way a
    training pipeline must at scale: a *content-hash* threshold
    (``hash(row_key, seed) % 100 < 80``), NOT ``rand()`` —
    nondeterministic expressions are re-evaluated per-partition after any
    shuffle, so a rand()-based split silently reassigns rows between plans,
    while the hash split is a pure function of the row: disjoint,
    exhaustive, and reproducible on any cluster/partitioning (asserted in
    tests). Full SQL oracle since round 2 via the portable md5-60bit bucket
    hash (l16/l2 discipline; swap to xxhash64 at scale for speed)."""
    li = load(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        ":", F.col("l_orderkey"), F.col("l_linenumber"), F.lit("42")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint"), F.lit(100)
    )
    tagged = li.withColumn("split", F.when(bucket < 80, "train").otherwise("test"))
    return tagged.groupBy("l_returnflag", "split").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "f8_seeded_shuffle",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY MD5('epoch7:' || doc_id), doc_id)
             AS shuffle_pos
    FROM documents
    """,
)
def f8_seeded_shuffle(spark, sf_dir):
    """Seeded epoch shuffle for training-data ordering: a deterministic
    pseudo-random permutation via sort-by-keyed-hash — reproducible across
    re-runs, task retries, and any partitioning (the property `ORDER BY
    rand()` lacks), and a new epoch seed yields a fresh permutation. MD5 is
    the hash because both engines compute the identical digest (engine-
    native hashes differ); doc_id tiebreak keeps the order total even under
    hash collisions.

    A naive global ``row_number() OVER (ORDER BY h)`` collapses to ONE
    partition (WindowExec with no PARTITION BY) — fatal at 100 TB. Instead
    the global index is computed in two scalable phases: (1) rank within
    256 hash-prefix buckets in parallel (the bucket is a prefix of the sort
    key, so bucket-major order == global hash order), (2) broadcast-join
    the tiny cumulative bucket-offset table. Same exact output, no
    single-reducer stage — the zipWithIndex / TeraSort-index pattern."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    bucketed = d.select("doc_id", h.alias("h"), F.substring(h, 1, 2).alias("bkt"))
    within = F.row_number().over(Window.partitionBy("bkt").orderBy("h", "doc_id"))
    ranked = bucketed.withColumn("r", within)
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    return ranked.join(F.broadcast(offsets), "bkt").select(
        "doc_id", (F.col("off") + F.col("r")).cast("int").alias("shuffle_pos")
    )


@query(
    "f9_bottomk_sample",
    oracle="""
    SELECT doc_id,
           MD5('s9:' || doc_id) AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
)
def f9_bottomk_sample(spark, sf_dir):
    """Bottom-k-by-hash sampling: the distributed replacement for reservoir
    sampling. Keeping the k rows with the smallest keyed hash IS a uniform
    sample without replacement, and unlike a reservoir it is deterministic,
    mergeable (min-k of min-ks), and partitioning/retry-stable. Spark plans
    ``orderBy(h).limit(k)`` as TakeOrderedAndProject — each task keeps a
    local k-heap and only k rows per partition reach the driver-side merge,
    so no global sort materializes at 100 TB. doc_id tiebreak keeps the
    cutoff total under hash collisions."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("s9:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", h.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(100)
    )


@query(
    "f10_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(CAST(LN(('0x' || substr(md5('w10:' || doc_id), 1, 8))::BIGINT
                          / 4294967296.0) AS DECIMAL(18,10)) AS DOUBLE)
               / n_chars AS sample_key
      FROM documents
    )
    SELECT doc_id, n_chars, ROUND(sample_key, 10) AS sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 100
    """,
)
def f10_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (pandas ``sample(weights=...)``)
    via the Efraimidis–Spirakis A-Res scheme: each row gets key
    ln(u)/w (u uniform from a seeded content hash, w = n_chars here —
    longer documents proportionally likelier) and the top-k keys ARE the
    weighted sample. Deterministic (hash-derived u, the f8/f9 discipline),
    mergeable (top-k of top-ks), and planned as TakeOrderedAndProject —
    only k rows per partition reach the driver merge at any scale. The
    ln() is snapped to DECIMAL(18,10) before the weight divide so libm
    last-ulp differences can't reorder the cutoff."""
    d = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("w10:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    key = F.log(u).cast("decimal(18,10)").cast("double") / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", F.round(key, 10).alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(100)
    )


@query(
    "f11_group_sample",
    oracle="""
    SELECT doc_id, lang, pick_order FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('f11:' || doc_id), doc_id) AS pick_order
      FROM documents
    ) WHERE pick_order <= 5
    """,
)
def f11_group_sample(spark, sf_dir):
    """Per-group uniform sample of fixed size k (pandas
    ``groupby().sample(n=5)``, the class-balancing idiom for training
    sets): rank rows inside each group by a seeded content hash and keep
    the first k — deterministic (f8/f9 hash discipline), one exchange on
    the group key, and the per-partition sort short-circuits into a
    running top-k because only rank ≤ 5 survives. Unlike a fraction-based
    ``sampleBy``, small groups are never over- or under-drawn: every group
    yields exactly min(k, |group|) rows at any scale."""
    d = load(spark, sf_dir, "documents")
    hkey = F.md5(F.concat(F.lit("f11:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(hkey, "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("pick_order"))
        .filter(F.col("pick_order") <= 5)
    )


@query("f12_sample_replace")  # weak: RNG is engine-specific
def f12_sample_replace(spark, sf_dir):
    """Sampling WITH replacement (pandas/Dask ``sample(replace=True)``):
    each row is emitted k~Poisson(fraction) times — the distributed
    with-replacement semantics (a global multinomial draw would serialize
    through one node; Poisson per row is iid across partitions and is what
    both Dask and Spark implement). Seeded, so the draw is reproducible
    partition-for-partition; bounds and reproducibility are asserted in
    tests/test_operators.py.

    100 TB: embarrassingly parallel map-side operator — no exchange; the
    duplicated rows materialize only downstream (same row-count profile as
    bootstrap resampling at scale).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.sample(withReplacement=True, fraction=0.2, seed=7).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "f13_limit_offset",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50 OFFSET 100
    """,
)
def f13_limit_offset(spark, sf_dir):
    """Pagination (``LIMIT k OFFSET n`` / pandas ``iloc[n:n+k]`` on a sorted
    frame): page 3 of the price-ranked lineitems via ``DataFrame.offset``
    (Spark ≥3.4). Deterministic only over a TOTAL order — the sort key is
    extended with the primary key, the f1/f3 discipline; an offset over a
    partial order returns an arbitrary page.

    100 TB: plans as a global sort limited to offset+k rows
    (TakeOrderedAndProject-style: per-partition top-(n+k) then one merge),
    so cost scales with n+k, not table size — but deep pagination (n in
    the millions) degenerates; keyset pagination (WHERE key > last_seen
    ORDER BY key LIMIT k) is the scale-safe idiom, expressible with b8+f3.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .offset(100)
        .limit(50)
    )


@query("f15_freq_items")  # weak: sketch superset semantics
def f15_freq_items(spark, sf_dir):
    """Approximate frequent items (``df.stat.freqItems`` — the
    Karp/Misra-Gries one-pass heavy-hitter sketch, public Spark API): all
    lineitem ship-years whose frequency exceeds 10% of rows, as one
    array-valued row. The sketch guarantee is a SUPERSET: every true heavy
    hitter is present, false positives possible — asserted against exact
    frequencies in tests/test_operators.py (the d5/d20/d22 weak-sketch
    discipline).

    100 TB: single pass, per-partition bounded state (1/support counters),
    mergeable — the shape that finds hot keys BEFORE a skewed join picks a
    salting factor (c13's prerequisite diagnostic).
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("ship_year")
    )
    out = li.stat.freqItems(["ship_year"], support=0.1)
    # Comma-joined string, not a raw array: the harness canonicalizer
    # sorts rows via pandas and cannot hash ndarray cells (d10 discipline).
    return out.select(
        F.array_join(
            F.sort_array(F.col("ship_year_freqItems")).cast("array<string>"), ","
        ).alias("frequent_years")
    )


@query(
    "f16_zorder_layout",
    oracle="""
    WITH d AS (
      SELECT l_partkey % 1024 AS zx, l_suppkey % 1024 AS zy
      FROM lineitem
    ),
    z AS (
      SELECT zx, zy, ((((zx >> 0) & 1) << 0) + (((zy >> 0) & 1) << 1)) + ((((zx >> 1) & 1) << 2) + (((zy >> 1) & 1) << 3)) + ((((zx >> 2) & 1) << 4) + (((zy >> 2) & 1) << 5)) + ((((zx >> 3) & 1) << 6) + (((zy >> 3) & 1) << 7)) + ((((zx >> 4) & 1) << 8) + (((zy >> 4) & 1) << 9)) + ((((zx >> 5) & 1) << 10) + (((zy >> 5) & 1) << 11)) + ((((zx >> 6) & 1) << 12) + (((zy >> 6) & 1) << 13)) + ((((zx >> 7) & 1) << 14) + (((zy >> 7) & 1) << 15)) + ((((zx >> 8) & 1) << 16) + (((zy >> 8) & 1) << 17)) + ((((zx >> 9) & 1) << 18) + (((zy >> 9) & 1) << 19)) AS zval
      FROM d
    )
    SELECT CAST(FLOOR(zval / 65536) AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(zx) AS min_x, MAX(zx) AS max_x,
           MIN(zy) AS min_y, MAX(zy) AS max_y
    FROM z GROUP BY 1
    """,
)
def f16_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) clustering — the multi-dimensional layout
    primitive behind Delta/Iceberg ``ZORDER BY``: interleaving the bits of
    two key dimensions gives a single sort key whose ranges are tight
    RECTANGLES in (x, y) space, so range-partitioned files carry narrow
    min/max stats on BOTH columns and scans filtered on EITHER dimension
    prune files — impossible with a lexicographic two-column sort, which
    only prunes on the leading column.

    The operator buckets the curve into 16 z-ranges (the 'files') and
    reports each bucket's rectangle: every bucket spans at most 1/4 of
    each dimension's domain (asserted in tests/test_operators.py), which
    is exactly the pruning guarantee. Pure codegen bit arithmetic — zero
    shuffle before the 16-group aggregate; full SQL oracle.
    """
    li = load(spark, sf_dir, "lineitem")
    d = li.select(
        F.pmod("l_partkey", F.lit(1024)).alias("zx"),
        F.pmod("l_suppkey", F.lit(1024)).alias("zy"),
    )
    z = d.selectExpr("zx", "zy", "(shiftleft(shiftright(zx, 0) & 1, 0) + shiftleft(shiftright(zy, 0) & 1, 1)) + (shiftleft(shiftright(zx, 1) & 1, 2) + shiftleft(shiftright(zy, 1) & 1, 3)) + (shiftleft(shiftright(zx, 2) & 1, 4) + shiftleft(shiftright(zy, 2) & 1, 5)) + (shiftleft(shiftright(zx, 3) & 1, 6) + shiftleft(shiftright(zy, 3) & 1, 7)) + (shiftleft(shiftright(zx, 4) & 1, 8) + shiftleft(shiftright(zy, 4) & 1, 9)) + (shiftleft(shiftright(zx, 5) & 1, 10) + shiftleft(shiftright(zy, 5) & 1, 11)) + (shiftleft(shiftright(zx, 6) & 1, 12) + shiftleft(shiftright(zy, 6) & 1, 13)) + (shiftleft(shiftright(zx, 7) & 1, 14) + shiftleft(shiftright(zy, 7) & 1, 15)) + (shiftleft(shiftright(zx, 8) & 1, 16) + shiftleft(shiftright(zy, 8) & 1, 17)) + (shiftleft(shiftright(zx, 9) & 1, 18) + shiftleft(shiftright(zy, 9) & 1, 19)) AS zval")
    return (
        z.groupBy(F.floor(F.col("zval") / 65536).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").alias("min_x"),
            F.max("zx").alias("max_x"),
            F.min("zy").alias("min_y"),
            F.max("zy").alias("max_y"),
        )
    )


@query(
    "f17_systematic_sample",
    oracle="""
    WITH indexed AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
      FROM orders
    )
    SELECT idx, o_orderkey, o_custkey, o_totalprice
    FROM indexed WHERE idx % 50 = 0
    """,
)
def f17_systematic_sample(spark, sf_dir):
    """Systematic (every k-th row) sampling — pandas/Dask ``df.loc[::50]``
    on a sorted frame: deterministic, covers the key range uniformly, and
    unlike Bernoulli sampling yields an EXACT ceil(n/k) row count (the
    property survey/profiling jobs rely on). Built on the distributed
    global index (``_global_index``: parallel range sort, only per-partition
    counts cross the driver — no single-task global window), then a
    map-side ``idx % k`` filter.

    100 TB: the only full-data movement is the range partition for the
    order (the same cost as any global sort); the filter prunes 49/50 of
    rows before anything else happens. For unordered corpora the f7
    hash-threshold split is the cheaper sibling (zero shuffle)."""
    from dask_pipes_spark.operators.setops import _global_index

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return (
        _global_index(o, (F.col("o_orderkey"),))
        .filter(F.col("_idx") % 50 == 0)
        .select(
            F.col("_idx").alias("idx"),
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
        )
    )


@query(
    "f19_balanced_class_sample",
    oracle="""
    WITH sized AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ),
    target AS (SELECT MIN(n) AS k FROM sized),
    ranked AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY CAST(('0x' || substr(md5('bal:' ||
                              CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        vec_id
             ) AS rk
      FROM embeddings
    )
    SELECT r.label, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(t.k) AS BIGINT) AS target_per_class,
           CAST(SUM(r.vec_id) AS BIGINT) AS kept_id_sum
    FROM ranked r CROSS JOIN target t
    WHERE r.rk <= t.k
    GROUP BY r.label
    """,
)
def f19_balanced_class_sample(spark, sf_dir):
    """Class-balanced downsampling for training: every label keeps exactly
    min-class-count rows, chosen by a SEEDED CONTENT-HASH rank within the
    class (the f7/f8 discipline — partitioning-independent and replayable,
    where ``rand()`` would resample on every retry). The per-class
    row_number rides one shuffle by label; the minority count is a 10-row
    broadcast scalar. Output proves the balance (n_kept per class) and the
    exact membership (kept_id_sum — a checksum of WHICH rows survived,
    so the oracle verifies the selection itself, not just its size).

    100 TB: one shuffle by class + a broadcast threshold — same cost as
    e10's top-k-per-group; per-class ranks stream through a single sorted
    pass (WindowGroupLimit prunes rank > k where supported). For extreme
    class skew the hash rank can be replaced by a per-class reservoir
    (f10's A-Res) with identical determinism."""
    e = load(spark, sf_dir, "embeddings")
    k = (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("k"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("label").orderBy(h.asc(), F.col("vec_id").asc())
    ranked = e.select("vec_id", "label", F.row_number().over(w).alias("rk"))
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.min("k").cast("bigint").alias("target_per_class"),
            F.sum("vec_id").cast("bigint").alias("kept_id_sum"),
        )
    )
