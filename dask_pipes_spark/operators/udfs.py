"""Group J — UDF / UDAF / UDTF surface (SURVEY.md §2-J).

Reference surface: ``map_partitions`` (THE Dask primitive — a pandas function
per partition), row-wise ``apply``, ``groupby.apply``, custom ``Aggregation``
(partial+final UDAF). This group is where dask-pipes' own nodes live, so the
mapping is load-bearing:

- ``map_partitions(fn)``       → ``df.mapInPandas(fn, schema)``
- ``apply`` (row-wise)         → ``@pandas_udf`` (Arrow-vectorized series→series)
- ``groupby.apply``            → ``df.groupBy(k).applyInPandas(fn, schema)``
- ``dd.Aggregation``           → ``@pandas_udf`` GROUPED_AGG
- 1→many expansion             → Spark 4 Python UDTF

Scale notes (100 TB): every entry crosses the JVM↔Python boundary in Arrow
batches (10-100× over row-at-a-time pickling); grouped variants shuffle once
on the key exactly like a native aggregation. These are the *slow path* by
design — groups A-H stay entirely in codegen; J exists for logic SQL cannot
express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load


@query(
    "j1_scalar_pandas_udf",
    oracle="""
    SELECT event_id, ROUND(1.0 / (1.0 + EXP(-(value - 100.0) / 50.0)), 6) AS score
    FROM events
    """,
)
def j1_scalar_pandas_udf(spark, sf_dir):
    """Vectorized row-wise function (Dask ``apply``): logistic score.
    Arrow-batched series→series; rounded(6) since exp() is libm-dependent."""

    @pandas_udf(T.DoubleType())
    def logistic(v: pd.Series) -> pd.Series:
        import numpy as np

        return (1.0 / (1.0 + np.exp(-(v - 100.0) / 50.0))).round(6)

    e = load(spark, sf_dir, "events")
    return e.select("event_id", logistic("value").alias("score"))


@query(
    "j2_map_partitions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           CAST(LENGTH(l_returnflag || l_linestatus) AS BIGINT) AS tag_len
    FROM lineitem WHERE l_quantity >= 25
    """,
)
def j2_map_partitions(spark, sf_dir):
    """Partition-wise pandas function (Dask ``map_partitions`` — its core
    primitive). Each Spark partition arrives as an iterator of Arrow-backed
    pandas frames; the function filters and derives exactly like a Dask node."""

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("net", T.DoubleType()),
            T.StructField("tag_len", T.LongType()),
        ]
    )

    def per_partition(batches):
        for pdf in batches:
            out = pdf[pdf["l_quantity"] >= 25].copy()
            out["net"] = out["l_extendedprice"] * (1 - out["l_discount"])
            out["tag_len"] = (out["l_returnflag"] + out["l_linestatus"]).str.len()
            yield out[["l_orderkey", "l_linenumber", "net", "tag_len"]]

    return load(spark, sf_dir, "lineitem").mapInPandas(per_partition, schema)


@query(
    "j3_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           FLOOR(((value - AVG(value) OVER (PARTITION BY user_id))
                  / STDDEV_SAMP(value) OVER (PARTITION BY user_id))
                 * 10000 + 0.5) / 10000 AS zscore
    FROM events
    """,
)
def j3_grouped_map(spark, sf_dir):
    """Grouped-map pandas function (Dask ``groupby.apply``): per-user z-score.
    One shuffle on the key, then each group is a single pandas frame.
    Rounded(4): pandas/engine float summation orders differ ~1e-12."""

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        out = pdf[["event_id", "user_id"]].copy()
        z = (v - v.mean()) / v.std(ddof=1)
        out["zscore"] = np.floor(z * 1e4 + 0.5) / 1e4
        return out

    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(zscore, schema)


@query(
    "j4_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           FLOOR(SUM(l_extendedprice * l_quantity) / SUM(l_quantity)
                 * 10000 + 0.5) / 10000 AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def j4_grouped_agg_udaf(spark, sf_dir):
    """Custom UDAF (Dask ``dd.Aggregation`` partial+final): quantity-weighted
    mean price as a GROUPED_AGG pandas UDF. Rounded(4): numpy's pairwise
    summation vs DuckDB's sequential differ in the last bits."""

    @pandas_udf(T.DoubleType())
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        wm = (price * qty).sum() / qty.sum()
        return float(np.floor(wm * 1e4 + 0.5) / 1e4)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wmean("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@query(
    "j5_python_udtf",
    oracle="""
    SELECT doc_id, CAST(i AS INTEGER) AS pos,
           string_split(text, ' ')[i + 1] AS token
    FROM documents,
         LATERAL (SELECT unnest(range(len(string_split(text, ' ')))) AS i)
    """,
)  # full-oracle since round 2: LATERAL range-unnest is the SQL twin
def j5_python_udtf(spark, sf_dir):
    """One-row→many-rows function (Spark 4 Python UDTF): explode a document
    into (doc_id, position, token) triples. Fully deterministic —
    tests/test_udfs.py also cross-checks it against h4's split+explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, token in enumerate(text.split(" ")):
                yield doc_id, pos, token

    spark.udtf.register("dps_tokenize", Tokenize)
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("dps_docs_for_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM dps_docs_for_udtf d, LATERAL dps_tokenize(d.doc_id, d.text) t"
    )


def map_overlap(df, order_cols, before, fn, schema, npartitions=8, after=0):
    """Dask's ``map_overlap`` primitive re-expressed Spark-first: apply a
    pandas function per range-partition with ``before`` rows of preceding
    context copied in from the neighboring partition, then drop the rows the
    padding produced.

    Mechanism: range-partition on ``order_cols`` (Dask: divisions), tag each
    row with its partition id, duplicate the last ``before`` rows of every
    partition into partition id+1 flagged ``_pad=1``, group by partition id
    via ``applyInPandas``; the wrapper sorts each pandas group by
    ``order_cols``, runs ``fn`` (a same-length positional transform), and
    keeps only ``_pad=0`` outputs. Any partition boundary placement yields
    identical results as long as ``before`` covers the window — asserted by
    j6's SQL oracle.

    Cost: one range shuffle + one hash shuffle of body rows plus a
    ``before × npartitions``-row duplication — the same boundary-transfer
    profile as Dask's overlap layers, scale-independent of total row count.
    ``fn`` must return a frame positionally aligned with its (sorted) input.

    ``after`` adds the mirror halo (Dask ``map_overlap(before, after)``):
    the first ``after`` rows of every partition are also copied into
    partition id−1, giving ``fn`` trailing context for centered/look-ahead
    kernels.

    Constraint: ``before``/``after`` must not exceed the smallest
    partition's row count — context is copied only from the *adjacent*
    partition (Dask's map_overlap has the same single-neighbor depth).
    Range partitioning gives ~n/npartitions rows per partition; size
    npartitions so that n/npartitions ≫ before+after, which any realistic
    window satisfies at scale.
    """
    rp = df.repartitionByRange(npartitions, *order_cols)
    tagged = rp.withColumn("_pid", F.spark_partition_id())
    from pyspark.sql import Window

    w_desc = Window.partitionBy("_pid").orderBy(*[F.col(c).desc() for c in order_cols])
    pads = []
    if before:
        pads.append(
            tagged.withColumn("_rn", F.row_number().over(w_desc))
            .filter(F.col("_rn") <= before)
            .drop("_rn")
            .withColumn("_pid", F.col("_pid") + 1)
            .withColumn("_pad", F.lit(1))
        )
    if after:
        w_asc = Window.partitionBy("_pid").orderBy(*order_cols)
        pads.append(
            tagged.withColumn("_rn", F.row_number().over(w_asc))
            .filter((F.col("_rn") <= after) & (F.col("_pid") > 0))
            .drop("_rn")
            .withColumn("_pid", F.col("_pid") - 1)
            .withColumn("_pad", F.lit(1))
        )
    unioned = tagged.withColumn("_pad", F.lit(0))
    for p in pads:
        unioned = unioned.unionByName(p)
    cols = list(order_cols)

    def run(pdf):
        pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
        out = fn(pdf.drop(columns=["_pid", "_pad"]))
        return out.loc[pdf["_pad"].values == 0]

    return unioned.groupBy("_pid").applyInPandas(lambda _, pdf: run(pdf), schema)


@query(
    "j6_map_overlap",
    oracle="""
    SELECT event_id,
           FLOOR(AVG(value) OVER (ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 * 10000 + 0.5) / 10000 AS roll_avg
    FROM events
    """,
)
def j6_map_overlap(spark, sf_dir):
    """``map_overlap`` exercised end-to-end: a 5-row trailing rolling mean
    over the globally-ordered events stream, computed with *pandas*
    ``rolling`` inside overlap partitions — and proven equal to the pure-SQL
    window-function answer by the oracle. This is the escape hatch for
    pandas-only windowed logic (EWMs, custom decay kernels) that
    ``F.avg().over()`` can't express; for plain rolling means prefer e7."""
    e = load(spark, sf_dir, "events").select("event_id", "ts", "value")

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "roll_avg": np.floor(
                    pdf["value"].rolling(5, min_periods=1).mean() * 1e4 + 0.5
                )
                / 1e4,
            }
        )

    return map_overlap(
        e,
        order_cols=("ts", "event_id"),
        before=4,
        fn=roll,
        schema="event_id bigint, roll_avg double",
    )


@query(
    "j7_cogrouped_map",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_clicks,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS click_sum
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, COUNT(*) AS n_purchases,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS purchase_sum
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(click_sum, 0.0) AS click_sum,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(purchase_sum, 0.0) AS purchase_sum
    FROM c FULL OUTER JOIN p USING (user_id)
    """,
)
def j7_cogrouped_map(spark, sf_dir):
    """Cogrouped pandas map (Dask ``map_partitions`` over two aligned
    frames / Spark ``cogroup(...).applyInPandas``): both inputs are hash-
    partitioned on the key, then each key's two pandas groups arrive in ONE
    Python call — the escape hatch for per-key logic that needs both sides
    at once (custom conformance checks, per-entity reconciliation) without a
    join materializing the pairing. Arrow-batched; state is one key's rows.
    The pandas body here computes per-user click/purchase summaries so the
    whole operator carries a full SQL oracle: sums accumulate as
    ``decimal.Decimal`` (exact, order-insensitive — the Python twin of the
    engine-side DECIMAL(28,6) discipline; fixture values are ≤6dp so
    ``Decimal(str(v))`` equals the oracle's cast bitwise)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "value"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value"
    )

    def summarize(ckey, cdf, pdf):
        import decimal

        uid = ckey[0]
        # a key present on only one side cogroups with an EMPTY frame — and
        # depending on session Arrow config the empty side can arrive with
        # NO columns at all (found by driver-session simulation; the engine
        # session happened to deliver schema'd empties), so never index a
        # column on a frame that may be column-less
        cvals = cdf["value"] if "value" in cdf.columns else []
        pvals = pdf["value"] if "value" in pdf.columns else []
        csum = sum((decimal.Decimal(str(v)) for v in cvals), decimal.Decimal(0))
        psum = sum((decimal.Decimal(str(v)) for v in pvals), decimal.Decimal(0))
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [len(cdf)],
                "click_sum": [float(csum)],
                "n_purchases": [len(pdf)],
                "purchase_sum": [float(psum)],
            }
        )

    out_schema = (
        "user_id bigint, n_clicks bigint, click_sum double, "
        "n_purchases bigint, purchase_sum double"
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(summarize, out_schema)
    )


@query(
    "j8_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2))), 4) AS DOUBLE)
             AS charge
    FROM lineitem
    """,
)
def j8_map_in_arrow(spark, sf_dir):
    """The zero-copy UDF tier below ``mapInPandas``: ``mapInArrow`` hands
    each partition to Python as raw ``pyarrow.RecordBatch``es — no pandas
    materialization, no index bookkeeping, just Arrow buffers both ways.
    The right boundary when the Python side is itself Arrow-native
    (pyarrow.compute, polars, DuckDB-in-worker). Body computes the TPC-H
    charge expression with ``pyarrow.compute`` decimal kernels so the
    result is exact and the operator carries a full SQL oracle. Scale: the
    fused per-partition map pipelines with the scan — no shuffle, and the
    projection is pruned to the four columns the batch needs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )

    def charge_batches(batches):
        from decimal import Decimal

        one = pa.scalar(Decimal("1.00"), type=pa.decimal128(4, 2))
        for b in batches:
            # fixture money columns are exact at 2dp (checked) — the whole
            # product stays exact decimal: (12,2)×(5,2)×(5,2) ≤ scale 6
            price = pc.cast(b.column("l_extendedprice"), pa.decimal128(12, 2))
            disc = pc.cast(b.column("l_discount"), pa.decimal128(4, 2))
            tax = pc.cast(b.column("l_tax"), pa.decimal128(4, 2))
            net = pc.multiply(price, pc.subtract(one, disc))
            charge = pc.multiply(net, pc.add(one, tax))
            # half_towards_infinity == SQL half-away-from-zero on these
            # strictly-positive charges (DuckDB ROUND's decimal mode)
            rounded = pc.round(charge, 4, round_mode="half_towards_infinity")
            # Arrow's decimal→float multiplies by an inexact 10^-scale
            # (one ulp off on ~30% of values); the string path parses
            # correctly rounded, matching DuckDB's decimal→double cast
            rounded4 = pc.cast(rounded, pa.decimal128(24, 4))
            as_double = pc.cast(pc.cast(rounded4, pa.string()), pa.float64())
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber"),
                    as_double,
                ],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    return li.mapInArrow(
        charge_batches, "l_orderkey bigint, l_linenumber int, charge double"
    )


@query(
    "j9_map_overlap_centered",
    oracle="""
    SELECT event_id,
           FLOOR(AVG(value) OVER (ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                 * 10000 + 0.5) / 10000 AS centered_avg
    FROM events
    """,
)
def j9_map_overlap_centered(spark, sf_dir):
    """Two-sided ``map_overlap`` (Dask ``map_overlap(fn, before, after)``):
    a CENTERED 5-row rolling mean over the globally-ordered events stream,
    computed with pandas ``rolling(center=True)`` inside overlap
    partitions. Each range partition receives a 2-row halo from BOTH
    neighbors, so the kernel sees full context at every boundary; halo
    outputs are dropped after the transform. Proven equal to the pure-SQL
    centered window frame by the oracle — any partition boundary placement
    yields identical results.

    This closes j6's documented single-neighbor limitation: look-ahead
    kernels (centered smoothing, leak-free future-context features) need
    the ``after`` halo. Cost model is unchanged — one range shuffle plus a
    (before+after)×npartitions-row duplication, independent of total rows.
    """
    e = load(spark, sf_dir, "events").select("event_id", "ts", "value")

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "centered_avg": np.floor(
                    pdf["value"].rolling(5, min_periods=1, center=True).mean()
                    * 1e4
                    + 0.5
                )
                / 1e4,
            }
        )

    return map_overlap(
        e,
        order_cols=("ts", "event_id"),
        before=2,
        after=2,
        fn=roll,
        schema="event_id bigint, centered_avg double",
    )
