"""Group A — scans / sources / sinks (SURVEY.md §2-A).

Reference surface: ``dd.read_parquet/read_csv/from_pandas/to_parquet/to_csv``.
Spark: ``spark.read.*`` / ``df.write.*`` with Catalyst pushing projection and
predicates into the parquet scan (verified by tests/test_scans.py, which
asserts ``PushedFilters`` / pruned ``ReadSchema`` in the physical plan —
the §2 requirement that a 2-column projection never reads all columns).

Scale notes (100 TB):
- a3's ``partitionBy`` write is the layout primitive: downstream filters on
  the partition column become directory pruning (no file even opened).
- Writes go to ``$TMPDIR`` scratch; on a cluster the same code points at
  object storage — the API is path-agnostic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_pipes_spark.registry import dsum, query, sql_dsum
from dask_pipes_spark.session import load, load_tables, scratch_path


@query(
    "a1_scan_parquet",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
)
def a1_scan_parquet(spark, sf_dir):
    """Projection-pruned parquet scan (Dask ``read_parquet(columns=...)``).
    The plan's ReadSchema contains exactly these two columns."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@query(
    "a2_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity > 49.0
    """,
)
def a2_scan_filter_pushdown(spark, sf_dir):
    """Predicate pushed to parquet row-group stats (Dask
    ``read_parquet(filters=...)``); PushedFilters: [GreaterThan(l_quantity,49.0)]."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "a3_sink_parquet_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_returnflag
    """,
)  # scratch write covered by the same gate as a pure scan
def a3_sink_parquet_roundtrip(spark, sf_dir):
    """Partitioned parquet write + re-read (Dask ``to_parquet(partition_on)``).

    ``partitionBy("l_returnflag")`` produces hive-style directories; the
    re-read aggregation filters on the partition column, which Spark resolves
    by directory pruning — scans touch 1/3 of the files. tests/test_scans.py
    asserts the round trip preserves counts per partition value.
    """
    out = scratch_path("dps_a3_roundtrip")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    # schema-explicit read-back: an empty write leaves no part files, so
    # inference fails — the schema is known, declare it (100 TB posture:
    # never infer; also the empty-input sweep contract)
    back = spark.read.schema(li.schema).parquet(out)
    return (
        back.filter(F.col("l_returnflag") == "A")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "a4_from_local",
    oracle=f"""
    WITH seg_targets(segment, target) AS (
      VALUES ('AUTOMOBILE', 1000.0), ('BUILDING', 2000.0), ('MACHINERY', 3000.0)
    )
    SELECT segment, target, COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer JOIN seg_targets ON c_mktsegment = segment
    GROUP BY segment, target
    """,
)
def a4_from_local(spark, sf_dir):
    """In-memory rows → DataFrame (Dask ``from_pandas``) joined to a fixture
    table — the driver-side-literal join pattern (broadcast by construction).
    The literal enters through pandas/Arrow so it plans as a
    ``LocalTableScan``, not an opaque RDD — the whole join stays visible to
    the EXPLAIN gate (round 12)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("segment", T.StringType()),
            T.StructField("target", T.DoubleType()),
        ]
    )
    local = spark.createDataFrame(
        pd.DataFrame(
            [("AUTOMOBILE", 1000.0), ("BUILDING", 2000.0), ("MACHINERY", 3000.0)],
            columns=["segment", "target"],
        ),
        schema,
    )
    cust = load(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(local), cust.c_mktsegment == local.segment)
        .groupBy("segment", "target")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "a6_scan_json",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)  # full-oracle: JSON round trip must preserve doubles bit-exactly
def a6_scan_json(spark, sf_dir):
    """JSON-lines round-trip with explicit schema (Dask ``read_json``) —
    same schema-on-read discipline as a5; JDBC is the one Dask source left
    unimplemented here (no database in this environment — the Spark call is
    ``spark.read.jdbc(url, table, properties)``, one line, untestable)."""
    out = scratch_path("dps_a6_json")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value", "props")
    ev.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value")
    )


@query(
    "a5_scan_csv",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    """,
)  # full-oracle: the CSV round trip must reproduce the source exactly
def a5_scan_csv(spark, sf_dir):
    """CSV round-trip with an explicit schema (Dask ``read_csv(dtype=...)``) —
    schema-on-read, no inference pass (inference = a full extra scan at 100 TB).
    Timestamps ride ISO-8601 strings. Equality with the source is asserted in
    tests/test_scans.py."""
    out = scratch_path("dps_a5_csv")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
    ).write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).option("header", "true").csv(out)
    return back.withColumn(
        "o_orderdate", F.to_timestamp("o_orderdate").cast("timestamp_ntz")
    )


@query(
    "a7_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)  # full-oracle since r2: the bucketed co-located join must equal the plain join
def a7_bucketed_join(spark, sf_dir):
    """Bucketed co-located join — the 100 TB answer to repeated fact-fact
    joins: write both tables bucketed (and sorted) on the join key, and every
    later join on that key runs with ZERO shuffle of either side (the plan is
    SortMergeJoin with no Exchange under it; asserted in tests/test_scans.py).

    Dask's analog is ``set_index`` + divisions-aligned merge; Spark's bucketing
    persists the co-partitioning in the table layout so it is paid once at
    write time, not per query."""
    scratch = scratch_path("dps_a7_bucketed")
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    spark.sql("DROP TABLE IF EXISTS dps_orders_b")
    spark.sql("DROP TABLE IF EXISTS dps_lineitem_b")
    (
        t["orders"].select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", os.path.join(scratch, "orders"))
        .saveAsTable("dps_orders_b")
    )
    (
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", os.path.join(scratch, "lineitem"))
        .saveAsTable("dps_lineitem_b")
    )
    ob = spark.table("dps_orders_b")
    lb = spark.table("dps_lineitem_b")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "a8_partition_pruned_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)  # full-oracle: the pruned partitioned read must match the direct scan
def a8_partition_pruned_scan(spark, sf_dir):
    """Partitioned-layout scan pruning — the 100 TB layout primitive beyond
    row-group pushdown (a2): events written ``partitionBy(event_type)``, then
    a filtered read touches ONLY the matching directories (the plan shows
    ``PartitionFilters``, and with a dimension-driven filter Spark inserts
    *dynamic* partition pruning). tests/test_scans.py asserts both the
    PartitionFilters entry and the dynamicpruning subquery."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = scratch_path(f"dps_a8_events_by_type_{tag}")
    done = os.path.join(out, "_SUCCESS")
    ev = load(spark, sf_dir, "events")
    if not os.path.exists(done):
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    # schema-explicit read-back (see a3): empty writes leave nothing to infer
    back = spark.read.schema(
        load(spark, sf_dir, "events").schema
    ).parquet(out)
    return (
        back.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
    )


@query(
    "a9_scan_orc",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a9_scan_orc(spark, sf_dir):
    """ORC write + re-read (columnar alternative to parquet; both ship in
    Spark). ORC round-trips types exactly, so the post-roundtrip aggregate
    carries a full SQL oracle against the original table — the scratch write
    is covered by the same correctness gate as a pure scan. Predicate/column
    pushdown works on ORC scans the same as parquet (audited)."""
    out = scratch_path("dps_a9_orc")
    cust = load(spark, sf_dir, "customer")
    cust.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("c_acctbal").alias("sum_bal"),
    )


@query(
    "a10_scan_binary",
    oracle="""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           CAST(size AS BIGINT) AS meta_bytes,
           CAST(OCTET_LENGTH(content) AS BIGINT) AS content_bytes
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    ORDER BY 1
    """,
)
def a10_scan_binary(spark, sf_dir):
    """Raw-file ingestion via the ``binaryFile`` source — the entry point for
    multimodal corpora (images/audio arrive as whole files, not rows): each
    file becomes (path, modificationTime, length, content) with the bytes as
    one opaque binary cell, feeding the m1-m4 decode plumbing. Scanned here
    over the fixture parquet files themselves; ``pathGlobFilter`` prunes at
    listing time (no bytes read for filtered files), and content is only
    materialized for rows that survive. Per-file sizes are re-derived from
    ``length`` AND from ``content`` to pin the contract that both agree
    (asserted in tests against the on-disk sizes).

    FULL oracle since round 3 via DuckDB ``read_blob`` over the same files.
    Like a13, the oracle path is pinned to the driver's contractual sf0.01
    fixture dir (an oracle string cannot receive the sf_dir parameter), so
    multi-SF parity sweeps report a known-benign diff here at other SFs."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return (
        files.select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("meta_bytes"),
            F.length("content").cast("long").alias("content_bytes"),
        )
        .orderBy("file_name")
    )


@query(
    "a11_scan_text",
    oracle="""
    SELECT doc_id, text, CAST(LEN(text) AS INTEGER) AS n_chars FROM documents
    """,
)  # full-oracle: the text-line round trip must reproduce the source
def a11_scan_text(spark, sf_dir):
    """Line-oriented text source (Dask ``db.read_text`` / ``dd.read_csv`` on
    raw logs — the landing format of every crawl dump): documents are
    written as one ``<doc_id>\\t<text>`` line each, re-read with
    ``spark.read.text`` (one ``value`` column, no parsing on the scan —
    splitting is an explicit projection, so malformed lines are data, not
    errors). Round-trip equality vs the source table is asserted in
    tests/test_scans.py; the scan parallelizes by file split exactly like
    any other file source at 100 TB."""
    out = scratch_path("dps_a11_text")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias(
            "value"
        )
    ).write.mode("overwrite").text(out)
    back = spark.read.text(out)
    parts = F.split("value", "\t", 2)
    return (
        back.select(
            parts.getItem(0).cast("bigint").alias("doc_id"),
            parts.getItem(1).alias("text"),
        )
        .withColumn("n_chars", F.length("text"))
    )


@query(
    "a12_schema_evolution_merge",
    oracle="""
    SELECT (o_orderkey % 2 = 1) AS is_v2,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END)
                AS BIGINT) AS n_with_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)  # full-oracle: v1 rows must carry NULL for the evolved column, v2 all
def a12_schema_evolution_merge(spark, sf_dir):
    """Schema evolution across parquet generations (``mergeSchema`` — the
    data-lake reality at 100 TB: yesterday's files lack the column added
    today): generation v1 writes (o_orderkey, o_totalprice), generation v2
    adds o_orderpriority; one read over BOTH directories with
    ``mergeSchema=true`` reconciles to the superset schema, v1 rows
    carrying NULL for the later column. The aggregate proves both
    generations scanned and the evolved column null-partitioned exactly at
    the generation boundary (asserted in tests/test_scans.py).

    Scale note: mergeSchema reconciles footers at LISTING time (cost ∝
    file count, driver-side) — production tables register the evolved
    schema in a catalog instead and read with an explicit schema; the
    per-file NULL-fill behavior is identical, which is what this verifies.
    """
    base = scratch_path("dps_a12_evo")
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(os.path.join(base, "g=1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "g=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "g=1"), os.path.join(base, "g=2")
    )
    # alias the grouping expression directly — withColumnRenamed on the
    # auto-generated name would silently no-op if codegen naming changes
    return merged.groupBy((F.col("o_orderkey") % 2 == 1).alias("is_v2")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "a13_rowgroup_stats",
    oracle="""
    SELECT row_group_id,
           CAST(row_group_num_rows AS BIGINT) AS n_rows,
           CAST(stats_min_value AS BIGINT) AS min_key,
           CAST(stats_max_value AS BIGINT) AS max_key,
           CAST(stats_null_count AS BIGINT) AS null_count
    FROM parquet_metadata('/root/testdata/sf0.01/orders.parquet')
    WHERE path_in_schema = 'o_orderkey'
    """,
)
def a13_rowgroup_stats(spark, sf_dir):
    """Parquet row-group statistics introspection — the metadata that
    row-group skipping (a2's PushedFilters) and min/max zone-map pruning
    actually consult: per row group, the key column's row count, min/max,
    and null count, read from the FOOTER (KBs) without touching data
    pages. The operational tool for answering "will this predicate prune?"
    and "is the layout sorted enough for skipping?" (pair with
    f16_zorder_layout, which builds skippable layouts).

    The oracle is DuckDB's own independent footer parser
    (``parquet_metadata``) — two unrelated parquet implementations must
    agree on every statistic. NOTE: oracle paths are literal, so the SQL
    side is pinned to the driver's contractual sf=0.01 fixture; the Spark
    side honors ``sf_dir`` (the pytest contract cross-checks at sf0.001
    with a matching path).

    100 TB: footers are the ONLY thing read — per-file KBs, fetched on the
    driver exactly as a query planner's stats pass does (bounded like the
    fit-param exemption, SURVEY §7.7); at fleet scale you'd parallelize
    the footer fetch with a binaryFile scan of magic+footer ranges, same
    output contract."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "orders.parquet")
    meta = pq.ParquetFile(path).metadata
    col_idx = next(
        i for i in range(meta.num_columns)
        if meta.row_group(0).column(i).path_in_schema == "o_orderkey"
    )
    rows = []
    for g in range(meta.num_row_groups):
        rg = meta.row_group(g)
        st = rg.column(col_idx).statistics
        rows.append(
            (g, rg.num_rows, int(st.min), int(st.max), int(st.null_count))
        )
    schema = (
        "row_group_id int, n_rows bigint, min_key bigint, "
        "max_key bigint, null_count bigint"
    )
    import pandas as pd

    # pandas/Arrow entry → LocalTableScan, keeping the plan audit-visible
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "row_group_id", "n_rows", "min_key", "max_key", "null_count",
            ],
        ),
        schema,
    )


@query(
    "a14_csv_malformed_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN (l_orderkey + l_linenumber) % 7 = 0
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN (l_orderkey + l_linenumber) % 7 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
    FROM lineitem
    """,
)
def a14_csv_malformed_audit(spark, sf_dir):
    """Malformed-input accounting at the scan — the ingestion-robustness
    contract: a CSV copy of lineitem is written with a DETERMINISTIC
    corruption (rows where ``(l_orderkey+l_linenumber) % 7 = 0`` get a
    non-numeric quantity field), then read back in PERMISSIVE mode with an
    explicit schema and a ``_corrupt_record`` column; the audit reports
    total / parsed / corrupt row counts. Because the corruption is planted
    by rule, the oracle predicts every count from the clean fixture — the
    parser's classification itself is what gets verified (a reader that
    silently coerced or dropped rows would diverge). The malformed lines
    are quarantined, not lost: PERMISSIVE keeps them as raw text for a
    dead-letter sink, which is the 100 TB operational pattern (fail the
    row, never the job).

    100 TB: line synthesis and parsing are per-partition map work (text in,
    text out — no shuffle); the audit is one partial+final count aggregate.
    DROPMALFORMED equivalence (n_good) is asserted in tests/test_scans.py —
    including the measured operational trap that a zero-column scan
    (``count()``) skips parsing entirely, so DROPMALFORMED reports the RAW
    line count there and only column-materializing queries actually drop —
    one more reason PERMISSIVE + explicit corrupt-record accounting (this
    audit) is the mode that tells the truth."""
    out = scratch_path("dps_a14_csv")
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bad = (F.col("l_orderkey") + F.col("l_linenumber")) % 7 == 0
    lines = li.select(
        F.concat_ws(
            ",",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.when(bad, F.lit("NOT_A_NUMBER")).otherwise(
                F.col("l_quantity").cast("string")
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    # Spark disallows queries whose only referenced scan column is the
    # corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN). Rather than cache() the parse (leaks storage across repeated
    # invocations — ADVICE r2), reference a data column: the planted
    # corruption hits exactly the quantity field, so PERMISSIVE nulls
    # l_quantity on precisely the corrupt rows and n_good = count(l_quantity)
    # — cross-verified against the _corrupt_record classification by the
    # oracle's n_good + n_corrupt = n_rows arithmetic AND asserted as an
    # explicit invariant in tests/test_scans.py (ADVICE r3: if the planted
    # corruption ever moved to a non-quantity column, n_good would double
    # count and that assert goes red before the oracle does).
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.col("l_quantity")).cast("bigint").alias("n_good"),
        F.count_if(F.col("_corrupt_record").isNotNull())
        .cast("bigint")
        .alias("n_corrupt"),
    )


def zonemap_overlap_factor(
    path: str, column: str = "l_partkey"
) -> tuple[int, float]:
    """Score a parquet layout's zone-map quality: (#row groups, average
    number of row groups whose [min,max] range of ``column`` intersects
    each row group — 1.0 = perfectly disjoint, N = zone maps useless).
    Reads only footers. Module-level so tests can assert the STRICT raw
    factors (sorted == 1.0, sorted < arrival) next to a15's threshold
    verdicts — a Spark sampler/row-group-sizing drift then fails a
    diagnosable assertion instead of an opaque hash (round-5 advice)."""
    import pyarrow.parquet as pq

    ranges = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        if meta.num_row_groups == 0:  # empty write → nothing to score
            continue
        idx = next(
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == column
        )
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            ranges.append((st.min, st.max))
    n = len(ranges)
    if n == 0:
        return 0, 0.0
    total = sum(
        sum(1 for lo2, hi2 in ranges if lo <= hi2 and lo2 <= hi)
        for lo, hi in ranges
    )
    return n, total / n


@query(
    "a15_sorted_write_zonemap",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_roundtrip,
           TRUE AS sorted_disjoint,
           TRUE AS sorted_not_worse
    FROM lineitem
    """,
)
def a15_sorted_write_zonemap(spark, sf_dir):
    """Write-side layout quality, quantified — the producer-side twin of
    a13's zone-map introspection: lineitem is written twice (key-sorted vs
    arrival order) into multi-row-group parquet, and each layout is scored
    by its o v e r l a p  f a c t o r — for every row group, how many row
    groups' [min,max] key ranges intersect it (1.0 = perfectly disjoint =
    every point predicate prunes to one group; N = zone maps useless).
    This is the number that decides whether a 100 TB table supports
    min/max skipping BEFORE anyone runs a query against it — the write-
    side acceptance test for f16-style layout jobs.

    Full oracle since round 5 via the d5-style verdict contract: the raw
    overlap factors and row-group counts are layout/engine-specific and
    stay out of the emitted frame; instead it carries the exact row count
    read BACK from the sorted files (write → read roundtrip lost nothing)
    plus two pinned verdicts — ``sorted_disjoint`` (the key-sorted layout's
    overlap factor ≤ 1.25: every row group intersects at most ~its own
    range — range partitioning keeps equal keys together, so only
    duplicate-key ties at row-group boundaries can push it above 1.0) and
    ``sorted_not_worse`` (sorted overlap ≤ arrival overlap: sorting never
    degrades zone-map quality). The oracle recomputes the count and pins
    both TRUE.

    100 TB: the sort is one range-exchange (what any sorted write costs);
    scoring reads ONLY footers (a13's posture — KBs per file) and the
    row-group count is bounded by layout config, so the overlap matrix is
    tiny. The same score generalizes to Z-order by scoring each z-dimension
    column's ranges."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_partkey", "l_quantity"
    )
    out_sorted = scratch_path("dps_a15_sorted")
    out_arrival = scratch_path("dps_a15_arrival")
    (
        li.repartitionByRange(4, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(out_sorted)
    )
    li.repartition(4).write.mode("overwrite").parquet(out_arrival)

    ns, fs = zonemap_overlap_factor(out_sorted)
    na, fa = zonemap_overlap_factor(out_arrival)
    n_roundtrip = spark.read.parquet(out_sorted).count()
    import pandas as pd

    # pandas/Arrow entry → LocalTableScan (audit-visible, round 12)
    return spark.createDataFrame(
        pd.DataFrame(
            [(n_roundtrip, fs <= 1.25, fs <= fa)],
            columns=["n_rows_roundtrip", "sorted_disjoint", "sorted_not_worse"],
        ),
        "n_rows_roundtrip bigint, sorted_disjoint boolean, sorted_not_worse boolean",
    )


_A19_BLOOM_K = 5        # md5 hex slices per key: 5 x 5 hex chars = 20 bits
_A19_BLOOM_BITS = 5     # hex chars per slice -> m = 16^5 = 2^20 positions


def _a19_positions_py(key: int) -> list[int]:
    """Driver-side twin of the build's hash: k bit positions from ONE md5
    of the decimal key string — byte-identical to Spark's ``md5(CAST(key
    AS STRING))`` (the l16/l2 portability discipline), so the prober and
    the builder can never disagree on a position."""
    import hashlib

    hx = hashlib.md5(str(key).encode()).hexdigest()
    w = _A19_BLOOM_BITS
    return [int(hx[i * w:(i + 1) * w], 16) for i in range(_A19_BLOOM_K)]


@query(
    "a19_bloom_file_skip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT o_custkey FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 1000 = 7
        ORDER BY o_custkey DESC LIMIT 3
      )
    )
    """,
)
def a19_bloom_file_skip(spark, sf_dir):
    """File-level bloom skipping for point lookups on an UNCLUSTERED
    column (round 9 — the data-skipping mechanism min/max zone maps
    cannot provide; Iceberg/Delta file-statistics pruning with bloom
    sidecars, Databricks' bloom-filter indexes): the base table is
    laid out by o_orderkey (32 range-sorted files), so every file spans
    nearly the full o_custkey domain and a13/a15-style [min,max] zone
    maps prune NOTHING for a custkey lookup. A per-file bloom sidecar —
    k=5 positions in a 2^20-bit space, hashed from a single portable md5
    per key — answers "might this file contain this key?" from KBs of
    metadata, and the prober plans the scan over ONLY the candidate
    files before Spark ever opens one.

    Build (staged once under ensure_index): distinct (file, custkey)
    pairs map to k bit positions each (one md5, five 20-bit hex slices —
    16^5 = 2^20 exactly, no modulo bias), aggregated to a sorted set-bit
    array per file; a stats row records the 3 probe keys (the largest
    distinct ``%1000==7`` custkeys — data-derived, so the key works at
    every SF). Serving is two-phase, the Iceberg planning contract:
    (1) DRIVER-SIDE metadata pruning — probe each file's bloom with each
    key's positions (no false negatives by construction: the sidecar was
    built from the actual key set, and the oracle's from-scratch IN-scan
    diverges if a candidate file was wrongly dropped); (2) a Spark scan
    of only the candidate paths with the exact ``isin`` residual filter
    (false positives cost IO, never wrong rows). The base write also
    enables parquet's NATIVE column bloom filters
    (``parquet.bloom.filter.enabled#o_custkey``), so even within a
    candidate file the reader's row-group machinery can consult a bloom
    under the pushed isin predicate — sidecar prunes files, footer
    blooms prune row groups.

    100 TB: a 3-key point lookup on a 100k-file table reads ~p·k files
    (p = per-file key hit rate, ~27% here) instead of all of them, and
    the decision costs one sidecar scan (KBs/file, O(files) driver work —
    the same metadata-plane budget as a13). At saturation (files ≫ 2^20
    set bits) m scales with the file row target, or the sidecar defers
    entirely to the parquet footer blooms it already enables."""
    from dask_pipes_spark.session import ensure_index

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = scratch_path(f"dps_a19_bloom_{tag}")
    k, w = _A19_BLOOM_K, _A19_BLOOM_BITS

    def _stage(d: str) -> None:
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        (
            orders.repartitionByRange(32, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#o_custkey", "true")
            .parquet(os.path.join(d, "base"))
        )
        back = spark.read.parquet(os.path.join(d, "base"))
        pairs = back.select(
            F.col("_metadata.file_name").alias("file_name"), "o_custkey"
        ).distinct()
        hx = F.md5(F.col("o_custkey").cast("string"))
        positions = F.array(
            *[
                F.conv(F.substring(hx, 1 + i * w, w), 16, 10).cast("int")
                for i in range(k)
            ]
        )
        (
            pairs.select("file_name", F.explode(positions).alias("pos"))
            .distinct()
            .groupBy("file_name")
            .agg(F.sort_array(F.collect_set("pos")).alias("bits"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "bloom"))
        )
        (
            back.filter(F.col("o_custkey") % 1000 == 7)
            .select("o_custkey")
            .distinct()
            .orderBy(F.col("o_custkey").desc())
            .limit(3)
            .agg(F.sort_array(F.collect_list("o_custkey")).alias("probe_keys"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "stats"))
        )

    idx = ensure_index(
        base,
        os.path.join(sf_dir, "orders.parquet"),
        version="bloom-skip-v1",
        build=_stage,
    )
    # --- phase 1: driver-side metadata pruning (KBs, never the base) ---
    # the sidecars are read with pyarrow directly: the metadata plane
    # must not launch Spark jobs — two collect() round-trips here would
    # cost more than the scan they save. Membership tests run as binary
    # searches over the zero-copy arrow buffer (the bit arrays are
    # sort_array'd at build time); materializing them as Python lists
    # was the measured hot spot (~1s at sf1; SCALING.md round 9)
    import numpy as np
    import pyarrow.parquet as pq

    def _sidecar(sub: str):
        d = os.path.join(idx, sub)
        parts = [
            pq.read_table(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        import pyarrow as pa

        return pa.concat_tables(parts) if parts else None

    stats = _sidecar("stats")
    probe_keys = (
        list(stats["probe_keys"][0].as_py()) if stats and stats.num_rows else []
    )
    key_pos = [
        np.asarray(_a19_positions_py(key), dtype=np.int64)
        for key in probe_keys
    ]
    candidates = []
    blooms = _sidecar("bloom")
    if blooms is not None and blooms.num_rows:
        names = blooms["file_name"].to_pylist()
        bits_col = blooms["bits"].combine_chunks()
        values = bits_col.values.to_numpy(zero_copy_only=False)
        offsets = bits_col.offsets.to_numpy()
        for i, name in enumerate(names):
            row = values[offsets[i]:offsets[i + 1]]  # sorted at build time
            for pos in key_pos:
                j = np.searchsorted(row, pos)
                if (j < len(row)).all() and (row[np.minimum(j, len(row) - 1)] == pos).all():
                    candidates.append(name)
                    break
    schema = "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    if not candidates:  # nothing can match (e.g. the zero-row fixture)
        return spark.createDataFrame([], schema)
    # --- phase 2: scan ONLY the candidate files, exact residual filter ---
    paths = [os.path.join(idx, "base", f) for f in sorted(candidates)]
    return (
        spark.read.schema(schema)
        .parquet(*paths)
        .filter(F.col("o_custkey").isin(probe_keys))
    )
