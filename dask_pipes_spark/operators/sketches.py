"""Sketches WITH PROOFS — portable, fully-oracled implementations of the
three classic stream summaries, next to their Spark-internal cousins:

- `d42` count-min sketch — Cormode & Muthukrishnan 2005;
- `d43` HyperLogLog — Flajolet, Fusy, Gandouet, Meunier 2007 (vs the
  engine-internal HLL++ keys d5/d22/d38, which are weak rows-only);
- `d44` Bloom filter — Bloom 1970 (vs c23's runtime Bloom join filter,
  observable only in the plan).

All three ride the PORTABLE md5-60bit digest (l2/l16 discipline), integer
or decimal-exact register arithmetic, and FLOOR quantization, so every
cell, register, bit, estimate and error metric is bit-for-bit reproducible
by the DuckDB oracle — estimator ACCURACY itself is correctness-gated
(CMS one-sidedness, HLL ~13% stddev, Bloom textbook FPR + zero false
negatives; each asserted in tests/test_vectors.py too).

Scale notes (100 TB):
- The sketch build aggregates per-key counts FIRST (the same shuffle any
  exact count needs — partial map-side combine applies), then explodes only
  the distinct-key table by depth d=4. The fact table is never exploded.
- A CMS is a fixed-size (d×w) grid whatever the corpus size, and cells are
  pure SUMs — associative and mergeable, so partial sketches combine across
  partitions/days for free (the same property d22 demonstrates for HLL).
- Probe-side estimation is a broadcast join against the ≤d·w-row cell table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load

_W = 512  # sketch width (cells per row)
_D = 4  # sketch depth (hash rows)


def _cell(d_col, key_col):
    """Portable CMS cell index: md5-60bit of "<d>:<key>" mod width."""
    digest_in = F.concat(
        d_col.cast("string"), F.lit(":"), key_col.cast("string")
    )
    return F.pmod(
        F.conv(F.substring(F.md5(digest_in), 1, 15), 16, 10).cast("bigint"),
        F.lit(_W),
    )


_SQL_CELL = (
    "CAST(('0x' || substr(md5(CAST({d} AS VARCHAR) || ':' || "
    "CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT) % 512"
)


@query(
    "d42_cms_topk",
    oracle=f"""
    WITH exact AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ),
    ds AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT ds.d, {_SQL_CELL.format(d='ds.d', k='e.l_partkey')} AS cell,
             SUM(e.cnt) AS cellcnt
      FROM exact e CROSS JOIN ds
      GROUP BY 1, 2
    ),
    probe AS (SELECT l_partkey, cnt FROM exact WHERE l_partkey % 97 = 0),
    probe_cells AS (
      SELECT p.l_partkey, p.cnt, ds.d,
             {_SQL_CELL.format(d='ds.d', k='p.l_partkey')} AS cell
      FROM probe p CROSS JOIN ds
    ),
    est AS (
      SELECT pc.l_partkey, MIN(c.cellcnt) AS cms_est
      FROM probe_cells pc JOIN cells c ON c.d = pc.d AND c.cell = pc.cell
      GROUP BY 1
    )
    SELECT e.l_partkey,
           CAST(p.cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - p.cnt AS BIGINT) AS overcount
    FROM est e JOIN probe p ON e.l_partkey = p.l_partkey
    """,
)
def d42_cms_topk(spark, sf_dir):
    """Count-min sketch (Cormode & Muthukrishnan 2005) over lineitem part
    keys — depth 4 × width 512, portable md5-60bit row hashes — probed for
    a bounded key set (every 97th part key) and compared against the exact
    counts in the same result: ``cms_est >= exact_cnt`` always (one-sided
    error, asserted in tests), ``overcount`` shows the collision mass.
    Because the hashes are the portable digest, the WHOLE sketch is
    recomputed cell-for-cell by the DuckDB oracle — a sketch with a proof,
    unlike the engine-internal HLL keys (d5/d22) that can only be
    rows-only-checked.

    100 TB: per-key counts aggregate first (one shuffle with map-side
    combine — the sketch build itself adds NO fact-table pass), the d×w
    cell table is ≤2048 rows whatever the corpus (broadcast side of the
    probe join), and cells are plain SUMs, so per-partition / per-day
    partial sketches merge associatively (the d22 merge pattern applies
    unchanged)."""
    li = load(spark, sf_dir, "lineitem")
    # the per-key count feeds BOTH the cell build and the probe set; the
    # two consumers share one physical aggregate via exchange reuse (the
    # subtrees are canonically identical, so Spark plans a ReusedExchange —
    # the fact-table shuffle runs ONCE; round 12: this replaces a
    # localCheckpoint pin that hid the aggregate from the EXPLAIN gate)
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    ds = F.explode(F.array(*[F.lit(i) for i in range(_D)])).alias("d")
    keyed = exact.select("l_partkey", "cnt", ds)
    cells = (
        keyed.withColumn("cell", _cell(F.col("d"), F.col("l_partkey")))
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cellcnt"))
    )
    probe = exact.filter(F.col("l_partkey") % 97 == 0)
    probe_cells = probe.select("l_partkey", "cnt", ds).withColumn(
        "cell", _cell(F.col("d"), F.col("l_partkey"))
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("l_partkey")
        .agg(F.min("cellcnt").alias("cms_est"))
    )
    return est.join(probe, "l_partkey").select(
        "l_partkey",
        F.col("cnt").cast("bigint").alias("exact_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("bigint").alias("overcount"),
    )


@query(
    "d43_portable_hll",
    oracle="""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5('hll:' || CAST(l_partkey AS VARCHAR)),
                   1, 15)) AS BIGINT) AS hv
      FROM lineitem
    ),
    rho AS (
      SELECT hv % 64 AS b,
             CASE WHEN (hv >> 6) = 0 THEN 55
                  ELSE 55 - LENGTH(bin(hv >> 6)) END AS r
      FROM h
    ),
    bucket AS (SELECT b, MAX(r) AS m FROM rho GROUP BY b),
    s AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT) AS filled,
             COUNT(*) AS nb
      FROM bucket
    ),
    est AS (
      SELECT CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(36028797018963968 AS DOUBLE)
             / (filled + (64 - nb) * (CAST(1 AS BIGINT) << 55)) AS raw,
             64 - nb AS v
      FROM s
    ),
    ex AS (SELECT COUNT(DISTINCT l_partkey) AS n_exact FROM lineitem)
    SELECT CAST(ex.n_exact AS BIGINT) AS n_exact,
           FLOOR(CASE WHEN est.raw <= 160 AND est.v > 0
                      THEN 64 * LN(64.0 / est.v) ELSE est.raw END
                 * 10000 + 0.5) / 10000 AS hll_est,
           FLOOR(ABS(CASE WHEN est.raw <= 160 AND est.v > 0
                          THEN 64 * LN(64.0 / est.v) ELSE est.raw END
                     - ex.n_exact) / ex.n_exact * 10000 + 0.5) / 10000
             AS rel_err
    FROM est CROSS JOIN ex
    """,
)
def d43_portable_hll(spark, sf_dir):
    """HyperLogLog with a correctness proof (Flajolet et al. 2007): 64
    buckets from the low 6 bits of the PORTABLE md5-60bit hash, ρ = leading-
    zero rank of the remaining 54 bits (via ``bin()`` string length — the
    same primitive in Spark and DuckDB), harmonic-mean estimate with the
    α₆₄=0.709 constant and the small-range linear-counting branch. The
    register sum Σ2^-M rides EXACT integer arithmetic (Σ2^(55-M) as BIGINT,
    one double division at the end), so the estimate is bit-identical
    cross-engine — unlike d5/d22/d38, whose Spark-internal HLL++ can only
    be rows-only-checked. The result row carries the exact count and the
    relative error, so accuracy is itself part of the verified contract
    (expected |err| ≈ 1.04/√64 ≈ 13%).

    100 TB: identical merge story to d42 — per-partition MAX registers
    combine associatively (partial aggregation does it for free), state is
    64 integers whatever the corpus, and duplicates never matter (MAX is
    idempotent), which is the whole point of HLL for distinct counts."""
    li = load(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("l_partkey").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    rho = li.select(
        F.pmod(h, F.lit(64)).alias("b"),
        F.when(F.shiftright(h, 6) == 0, 55)
        .otherwise(55 - F.length(F.bin(F.shiftright(h, 6))))
        .alias("r"),
    )
    bucket = rho.groupBy("b").agg(F.max("r").alias("m"))
    s = bucket.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)"))
        .cast("bigint")
        .alias("filled"),
        F.count(F.lit(1)).alias("nb"),
    )
    est = s.select(
        (
            F.lit(0.709 * 64 * 64)
            * F.lit(36028797018963968.0)
            / (
                F.col("filled")
                + (64 - F.col("nb")) * F.lit(36028797018963968)
            )
        ).alias("raw"),
        (64 - F.col("nb")).alias("v"),
    )
    ex = li.agg(F.countDistinct("l_partkey").alias("n_exact"))
    corrected = F.when(
        (F.col("raw") <= 160) & (F.col("v") > 0),
        64 * F.log(F.lit(64.0) / F.col("v")),
    ).otherwise(F.col("raw"))
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return est.crossJoin(F.broadcast(ex)).select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        q4(corrected).alias("hll_est"),
        q4(F.abs(corrected - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


_BF_M = 4096  # bloom bits
_BF_K = 3  # hash functions


def _bf_pos(i: int, key_col):
    """Portable Bloom bit position i for a key: md5-60bit mod m."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"bf{i}:"), key_col.cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(_BF_M),
    )


_SQL_BF_POS = (
    "CAST(('0x' || substr(md5('bf{i}:' || CAST({k} AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 4096"
)


@query(
    "d44_portable_bloom",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT l_partkey FROM lineitem),
    members AS (SELECT l_partkey FROM keys WHERE l_partkey % 3 = 0),
    bits AS (
      SELECT DISTINCT pos FROM (
        SELECT {_SQL_BF_POS.format(i=0, k='l_partkey')} AS pos FROM members
        UNION ALL
        SELECT {_SQL_BF_POS.format(i=1, k='l_partkey')} FROM members
        UNION ALL
        SELECT {_SQL_BF_POS.format(i=2, k='l_partkey')} FROM members
      )
    ),
    probe AS (
      SELECT k.l_partkey,
             CASE WHEN {_SQL_BF_POS.format(i=0, k='k.l_partkey')} IN
                       (SELECT pos FROM bits)
                   AND {_SQL_BF_POS.format(i=1, k='k.l_partkey')} IN
                       (SELECT pos FROM bits)
                   AND {_SQL_BF_POS.format(i=2, k='k.l_partkey')} IN
                       (SELECT pos FROM bits)
                  THEN 1 ELSE 0 END AS positive,
             CASE WHEN k.l_partkey % 3 = 0 THEN 1 ELSE 0 END AS member
      FROM keys k
    )
    SELECT CAST(SUM(member) AS BIGINT) AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(positive) AS BIGINT) AS n_positives,
           CAST(SUM(CASE WHEN positive = 1 AND member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN positive = 0 AND member = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negatives,
           FLOOR(SUM(CASE WHEN positive = 1 AND member = 0 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) - SUM(member) AS DOUBLE) * 10000 + 0.5)
             / 10000 AS fpr
    FROM probe
    """,
)
def d44_portable_bloom(spark, sf_dir):
    """Bloom filter with a correctness proof (Bloom 1970): every third part
    key is inserted (k=3 portable md5 hashes into m=4096 bits), then EVERY
    key probes the filter and the result reports members, positives, false
    positives, the guaranteed-zero false negatives, and the measured FPR —
    all recomputed bit-for-bit by the DuckDB oracle, unlike c23's
    Spark-internal runtime Bloom pushdown which can only be observed in
    the plan. With ~660 members in 4096 bits the textbook FPR
    (1-e^(-kn/m))^k ≈ 4% is what the measured number lands on (asserted
    in tests).

    100 TB: the bit set is bounded by m (≤4096 distinct positions — a
    broadcast semi-join side), build is one distinct-aggregate over the
    member side, and probing is a map-side membership check against the
    broadcast bits — the exact shape of a join pre-filter; OR-merging
    per-partition bit sets is the same associative-merge story as d42/d43."""
    li = load(spark, sf_dir, "lineitem")
    # the distinct-key set feeds members, bits AND the probe — the
    # consumers' identical distinct subtrees share one physical exchange
    # (ReusedExchange), so the fact-table distinct still runs once while
    # the whole plan stays visible to the EXPLAIN gate (round 12; was a
    # localCheckpoint pin)
    keys = li.select("l_partkey").distinct()
    members = keys.filter(F.col("l_partkey") % 3 == 0)
    bits = (
        members.select(
            F.explode(
                F.array(
                    *[_bf_pos(i, F.col("l_partkey")) for i in range(_BF_K)]
                )
            ).alias("pos")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # one probe pass: explode each key to its k positions, membership-check
    # them against the broadcast bit set, a key is positive iff all k hit
    probe_pos = keys.select(
        "l_partkey",
        F.explode(
            F.array(*[_bf_pos(i, F.col("l_partkey")) for i in range(_BF_K)])
        ).alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos", "left")
        .groupBy("l_partkey")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
    )
    member = F.when(F.col("l_partkey") % 3 == 0, 1).otherwise(0)
    scored = hits.select(
        F.when(F.col("n_hits") == _BF_K, 1).otherwise(0).alias("positive"),
        member.alias("member"),
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return scored.agg(
        F.sum("member").cast("bigint").alias("n_members"),
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("positive").cast("bigint").alias("n_positives"),
        F.sum(F.when((F.col("positive") == 1) & (F.col("member") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum(F.when((F.col("positive") == 0) & (F.col("member") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_negatives"),
        q4(
            F.sum(F.when((F.col("positive") == 1) & (F.col("member") == 0), 1).otherwise(0))
            / (F.count(F.lit(1)) - F.sum("member")).cast("double")
        ).alias("fpr"),
    )


@query(
    "d45_histogram_quantile",
    oracle="""
    WITH stats AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             COUNT(*) AS n
      FROM lineitem
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - s.lo)
                               / ((s.hi - s.lo) / 256)) AS BIGINT),
                   255) AS bin,
             COUNT(*) AS c
      FROM lineitem CROSS JOIN stats s
      GROUP BY 1
    ),
    cum AS (
      SELECT bin, c,
             SUM(c) OVER (ORDER BY bin) AS cum,
             SUM(c) OVER (ORDER BY bin) - c AS cum_prev
      FROM binned
    ),
    qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
    hit AS (
      SELECT qs.q, MIN(cum.bin) AS qbin
      FROM qs JOIN cum ON cum.cum >= qs.q * (SELECT n FROM stats)
      GROUP BY qs.q
    ),
    est AS (
      SELECT h.q,
             s.lo + (h.qbin + (h.q * s.n - c2.cum_prev) / c2.c)
                    * ((s.hi - s.lo) / 256) AS hist_q
      FROM hit h
      JOIN cum c2 ON c2.bin = h.qbin
      CROSS JOIN stats s
    ),
    exact AS (
      SELECT 0.5 AS q, QUANTILE_CONT(l_extendedprice, 0.5) AS xq FROM lineitem
      UNION ALL
      SELECT 0.9, QUANTILE_CONT(l_extendedprice, 0.9) FROM lineitem
      UNION ALL
      SELECT 0.99, QUANTILE_CONT(l_extendedprice, 0.99) FROM lineitem
    )
    SELECT e.q,
           FLOOR(e.hist_q * 10000 + 0.5) / 10000 AS hist_quantile,
           FLOOR(x.xq * 10000 + 0.5) / 10000 AS exact_quantile,
           FLOOR(ABS(e.hist_q - x.xq) * 10000 + 0.5) / 10000 AS abs_err
    FROM est e JOIN exact x ON e.q = x.q
    """,
)
def d45_histogram_quantile(spark, sf_dir):
    """Quantiles from a mergeable equi-width histogram — the fourth sketch
    with a proof (counts d42, distincts d43, membership d44, quantiles
    here): 256 bins over [min, max], cumulative counts, linear
    interpolation inside the hit bin — reported next to the EXACT
    percentile so the approximation error is part of the verified result
    (Spark's own ``percentile_approx``/KLL is the engine-internal twin at
    d20, weak-checked because its sketch internals aren't portable).
    Every term — bin arithmetic, cumulative window, interpolation — is
    double-identical cross-engine; the 1-row (min, max, n) stats frame is
    a broadcast scalar.

    100 TB: two passes (exact min/max, then bin counts) — both
    map-side-combinable with 256-integer state that merges by plain
    addition across partitions/days, which is why fixed-bin histograms
    are the workhorse of warehouse EXPLAIN statistics; the window and
    interpolation run over ≤256 rows. A streaming variant needs only the
    same mergeable bin counts (k12's rollup shape)."""
    li = load(spark, sf_dir, "lineitem")
    # (lo, hi, n) is a 1-row scalar frame and the cumulative table ≤256
    # rows — both re-enter as driver-local literals (round 12: the l53
    # broadcast-cutoff pattern replacing two localCheckpoint pins): each
    # fact pass still runs exactly once, as its own bounded job, and the
    # serving plan — local bin table joined to 3 query rows plus the exact
    # percentile pass — is fully visible to the EXPLAIN gate
    from dask_pipes_spark.session import collect_local

    lo_, hi_, n_ = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    lo = F.lit(lo_).cast("double")
    hi = F.lit(hi_).cast("double")
    n = F.lit(n_).cast("bigint")
    binned = (
        li.select(
            F.least(
                F.floor(
                    # try_divide: a 1-row (or constant-column) input has
                    # hi == lo -> zero bin width -> NULL, which the
                    # null-SKIPPING least()/LEAST below absorbs into bin
                    # 255 on both engines (Spark least and DuckDB LEAST
                    # both ignore NULL operands) — no ANSI crash, and the
                    # degenerate input lands in the top bin, not a NULL bin
                    F.try_divide(
                        F.col("l_extendedprice") - lo,
                        (hi - lo) / 256,
                    )
                ).cast("bigint"),
                F.lit(255).cast("bigint"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin")
    cum = collect_local(
        binned.select(
            "bin",
            "c",
            F.sum("c").over(w).alias("cum"),
            (F.sum("c").over(w) - F.col("c")).alias("cum_prev"),
        )
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    )
    hit = (
        qs.join(F.broadcast(cum), F.col("cum") >= F.col("q") * n)
        .groupBy("q")
        .agg(F.min("bin").alias("qbin"))
    )
    est = (
        hit.join(
            F.broadcast(cum.select("bin", "c", "cum_prev")),
            F.col("qbin") == F.col("bin"),
        )
        .select(
            "q",
            (
                lo
                + (
                    F.col("qbin")
                    + (F.col("q") * n - F.col("cum_prev"))
                    / F.col("c")
                )
                * ((hi - lo) / 256)
            ).alias("hist_q"),
        )
    )
    exact = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))"
        ).alias("xs")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)).alias("q"),
                F.col("xs").alias("xq"),
            )
        ).alias("z")
    ).select(F.col("z.q").alias("qx"), F.col("z.xq").alias("xq"))
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return est.join(F.broadcast(exact), F.col("q") == F.col("qx")).select(
        "q",
        q4(F.col("hist_q")).alias("hist_quantile"),
        q4(F.col("xq")).alias("exact_quantile"),
        q4(F.abs(F.col("hist_q") - F.col("xq"))).alias("abs_err"),
    )
