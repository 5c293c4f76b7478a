"""Group H — scalar functions: string / date / math / array / map / json
(SURVEY.md §2-H).

Reference surface: pandas ``Series.str.*`` / ``Series.dt.*`` / numpy ufuncs /
``explode`` / json-in-object-columns, executed interpreted per partition.
Spark runs every one of these as a built-in JVM expression inside
WholeStageCodegen — no Python in the hot path, which is the entire 100 TB
story for this group.

Cross-engine traps handled here (SURVEY §7.6):
- ``dayofweek`` numbering: Spark 1=Sunday…7 vs DuckDB 0=Sunday…6 → oracle
  adds +1 explicitly.
- libm functions (ln/exp/sqrt/pow) may differ in the last ulp between JVM and
  C runtimes → rounded(6) on both sides.
- float arrays: per-element sums are folded in engine-specific order →
  rounded(4) after casting elements to double.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load


@query(
    "h1_string_basic",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name) AS name_lower,
           UPPER(c_mktsegment) AS seg_upper,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           TRIM(CONCAT(c_name, ' ')) AS name_trim,
           CONCAT_WS('|', c_name, c_mktsegment) AS name_seg,
           SUBSTRING(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def h1_string_basic(spark, sf_dir):
    """lower/upper/length/trim/concat/substring (pandas ``Series.str.*``)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


@query(
    "h2_string_match",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           CONTAINS(p_name, 'red') AS has_red,
           STARTS_WITH(p_type, 'ECO') AS is_eco,
           p_name LIKE '%bolt%' AS like_bolt,
           REGEXP_MATCHES(p_name, '^(red|blue) ') AS color_start
    FROM part
    """,
)
def h2_string_match(spark, sf_dir):
    """contains/startswith/like/rlike predicates as columns."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        "p_type",
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("is_eco"),
        F.col("p_name").like("%bolt%").alias("like_bolt"),
        F.col("p_name").rlike("^(red|blue) ").alias("color_start"),
    )


@query(
    "h3_regex",
    oracle="""
    SELECT c_custkey,
           REGEXP_REPLACE(c_name, '0+', '0', 'g') AS name_squeezed,
           REGEXP_EXTRACT(c_name, '#(\\d+)', 1) AS id_digits,
           CAST(REGEXP_EXTRACT(c_name, '#(\\d+)', 1) AS BIGINT) AS id_num
    FROM customer
    """,
)
def h3_regex(spark, sf_dir):
    """regex replace + capture-group extract (pandas ``str.replace/extract``)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "0+", "0").alias("name_squeezed"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("id_digits"),
        F.regexp_extract("c_name", r"#(\d+)", 1).cast("long").alias("id_num"),
    )


@query(
    "h4_split_explode",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    """,
)
def h4_split_explode(spark, sf_dir):
    """tokenize: split + explode (pandas ``str.split`` + ``explode``) — the
    text-pipeline workhorse; stays entirely in codegen."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "h5_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS y,
           CAST(MONTH(o_orderdate) AS INTEGER) AS m,
           CAST(DAY(o_orderdate) AS INTEGER) AS d,
           CAST(HOUR(o_orderdate) AS INTEGER) AS h,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate
    FROM orders
    """,
)
def h5_date_parts(spark, sf_dir):
    """Datetime component extraction (pandas ``Series.dt.*``). DuckDB numbers
    dayofweek 0=Sunday, Spark 1=Sunday — the oracle pins the offset. The DATE
    value is emitted as an ISO string: raw DATE surfaces as engine-specific
    logical types under a value-hash."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("odate"),
    )


@query(
    "h6_date_trunc",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           DATE_TRUNC('month', l_shipdate) AS ship_month,
           DATE_TRUNC('day', l_shipdate) AS ship_day
    FROM lineitem
    """,
)
def h6_date_trunc(spark, sf_dir):
    """Timestamp floor to month/day (pandas ``dt.floor`` / ``to_period``)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", "l_shipdate").cast("timestamp_ntz").alias("ship_month"),
        F.date_trunc("day", "l_shipdate").cast("timestamp_ntz").alias("ship_day"),
    )


@query(
    "h7_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
             AS days_since_epoch_start,
           o_orderdate + INTERVAL 7 DAY AS due_date,
           o_orderdate - INTERVAL 90 DAY AS quarter_back
    FROM orders
    """,
)
def h7_date_arith(spark, sf_dir):
    """datediff and timestamp ± interval (pandas ``-`` / ``Timedelta``)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("quarter_back"),
    )


@query(
    "h8_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_round,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def h8_math(spark, sf_dir):
    """numpy-ufunc equivalents. Transcendentals (ln/exp/sqrt/pow) are
    rounded(6): JVM StrictMath and C libm can differ in the final ulp."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "h9_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' AND o_totalprice > 200000 THEN 'open_big'
                WHEN o_orderstatus = 'O' THEN 'open_small'
                ELSE 'pending' END AS status_band
    FROM orders
    """,
)
def h9_case_when(spark, sf_dir):
    """Nested conditionals (np.select / chained np.where)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000), "open_big")
        .when(F.col("o_orderstatus") == "O", "open_small")
        .otherwise("pending")
        .alias("status_band"),
    )


@query(
    "h10_null_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0), 0.5) AS disc_coal,
           NULLIF(l_returnflag, 'N') AS flag_or_null,
           (NULLIF(l_discount, 0) IS NULL) AS was_zero
    FROM lineitem
    """,
)
def h10_null_fns(spark, sf_dir):
    """coalesce / nullif / isnull (pandas ``fillna``/``mask``/``isna``)."""
    li = load(spark, sf_dir, "lineitem")
    zero_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(zero_null, F.lit(0.5)).alias("disc_coal"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        zero_null.isNull().alias("was_zero"),
    )


@query(
    "h11_json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val
    FROM events
    """,
)
def h11_json_extract(spark, sf_dir):
    """JSON path extraction from a string column (pandas: object-apply; Spark:
    ``get_json_object`` — codegen'd, no Python)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "h12_array_basic",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           LIST_CONTAINS([label, label + 1], 5) AS near_five
    FROM embeddings
    """,
)
def h12_array_basic(spark, sf_dir):
    """Array length / element access / membership (object-dtype lists in the
    reference; first-class ArrayType here)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        F.array_contains(
            F.array(F.col("label"), F.col("label") + 1), F.lit(5)
        ).alias("near_five"),
    )


@query(
    "h13_array_hof",
    oracle="""
    SELECT vec_id,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4)
             AS vec_sum,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS vec_norm2
    FROM embeddings
    """,
)
def h13_array_hof(spark, sf_dir):
    """Higher-order array functions: transform + aggregate (fold). This is the
    dot-product primitive l3 builds on. Rounded(4): fold order is
    engine-specific for float addition."""
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("vec_norm2"),
    )


@query(
    "h14_map_ops",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(json_keys(props), ',') AS prop_keys,
           CAST(props->>'$.k' AS INTEGER) AS k_val
    FROM events
    """,
)
def h14_map_ops(spark, sf_dir):
    """JSON → MapType with key/value extraction (``from_json`` + map ops)."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@query(
    "h15_hash",
    oracle="""
    SELECT doc_id, SHA256(text) AS text_sha FROM documents
    """,
)
def h15_hash(spark, sf_dir):
    """Content hashing — the exact-dedup primitive (l1). ``sha2`` matches
    DuckDB's sha256 hex; Spark's faster ``xxhash64`` is used in l2's MinHash
    where no cross-engine oracle is needed."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("text_sha"))


@query(
    "h16_levenshtein_pairs",
    oracle="""
    WITH top_tokens AS (
      SELECT t AS token, COUNT(*) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
      GROUP BY t ORDER BY cnt DESC, token LIMIT 30
    )
    SELECT a.token AS tok_a, b.token AS tok_b,
           levenshtein(a.token, b.token) AS dist
    FROM top_tokens a JOIN top_tokens b ON a.token < b.token
    WHERE levenshtein(a.token, b.token) <= 2
    """,
)
def h16_levenshtein_pairs(spark, sf_dir):
    """Edit-distance typo candidates (fuzzy-dedup primitive): the 30 most
    frequent tokens, all ordered pairs within Levenshtein distance 2 —
    ``F.levenshtein`` is a JVM builtin, and the pair space is bounded by the
    top-k cut, the same blocking discipline as the near-dup operators (never
    all-pairs over the raw vocabulary)."""
    d = load(spark, sf_dir, "documents")
    top = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(30)
        .select("token")
    )
    a = top.select(F.col("token").alias("tok_a"))
    b = top.select(F.col("token").alias("tok_b"))
    return (
        a.join(b, F.col("tok_a") < F.col("tok_b"))
        .withColumn("dist", F.levenshtein("tok_a", "tok_b"))
        .filter(F.col("dist") <= 2)
    )


@query(
    "h17_parse_datetime",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
             AS reparsed,
           CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS year_str
    FROM orders
    """,
)
def h17_parse_datetime(spark, sf_dir):
    """String↔datetime round-trip (Dask ``dd.to_datetime`` / ``dt.strftime``):
    format out with ``date_format``, parse back with ``to_timestamp`` —
    pattern pinned on both engines so the round-trip is exact."""
    o = load(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss").cast("timestamp_ntz").alias("reparsed"),
        F.date_format("o_orderdate", "yyyy").cast("long").alias("year_str"),
    )


@query(
    "h18_string_extra",
    oracle="""
    SELECT c_custkey,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           REVERSE(c_name) AS rev_name,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           REPEAT('-', CAST(c_custkey % 5 AS INTEGER)) AS bar
    FROM customer
    """,
)
def h18_string_extra(spark, sf_dir):
    """Second string tier (pandas ``str.pad/translate``, numpy repeat):
    lpad / reverse / translate / repeat — all JVM builtins."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_name").alias("rev_name"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.repeat(F.lit("-"), F.pmod("c_custkey", F.lit(5)).cast("int")).alias("bar"),
    )


@query(
    "h19_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS band,
           l_orderkey | l_linenumber AS bor,
           xor(l_orderkey, l_linenumber) AS bxor,
           l_orderkey << 2 AS shl,
           l_orderkey >> 3 AS shr
    FROM lineitem
    """,
)
def h19_bitwise(spark, sf_dir):
    """Bitwise operators (numpy ``& | ^ << >>`` over int series) — codegen
    integer ops, the partitioner/bucketing primitive family."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("band"),
        (F.col("l_orderkey").bitwiseOR(F.col("l_linenumber"))).alias("bor"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber"))).alias("bxor"),
        F.shiftleft("l_orderkey", 2).alias("shl"),
        F.shiftright("l_orderkey", 3).alias("shr"),
    )


@query(
    "h20_struct_json_roundtrip",
    oracle="""
    SELECT doc_id, doc_id AS rt_doc_id, lang AS rt_lang,
           n_chars AS rt_n_chars
    FROM documents
    """,
)
def h20_struct_json_roundtrip(spark, sf_dir):
    """Nested-type construction + JSON serialization round-trip:
    ``struct() → to_json → from_json(schema) → field access`` must be the
    identity on the packed scalars — the contract that lets pipelines ship
    typed payloads through JSON columns (event buses, props fields) without
    drift. The oracle is the identity projection, so any serialization
    asymmetry (quoting, key order, type coercion) surfaces as a value-hash
    mismatch. All four steps are codegen'd JVM expressions — no Python."""
    d = load(spark, sf_dir, "documents")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    packed = d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("payload"),
    )
    back = packed.select("doc_id", F.from_json("payload", schema).alias("p"))
    return back.select(
        "doc_id",
        F.col("p.doc_id").alias("rt_doc_id"),
        F.col("p.lang").alias("rt_lang"),
        F.col("p.n_chars").alias("rt_n_chars"),
    )


@query(
    "h21_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_q,
           regexp_extract(url, '([^./?#]+\\.[^./?#]+)(?:[/?#]|$)', 1)
             AS registered_domain
    FROM urls
    """,
)
def h21_url_parse(spark, sf_dir):
    """URL decomposition — the first projection of every web-crawl curation
    pipeline (host-level dedup, domain blocklists, per-TLD mixture weights
    all key on it). Spark's Hive-inherited ``parse_url`` handles HOST / PATH
    / per-key QUERY natively; the registered domain (last two labels of the
    host) is plain string algebra on the codegen'd path. URLs are
    synthesized deterministically from fixture columns (the corpus carries
    no real URLs); the oracle re-derives the same fields with regexes, so
    the check exercises the extraction semantics, not string echo."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    labels = F.split(host, r"\.")
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_q"),
        F.concat_ws(
            ".",
            F.element_at(labels, -2),
            F.element_at(labels, -1),
        ).alias("registered_domain"),
    )


@query(
    "h22_array_setops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(text, ' '))) AS n_types,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['a', 'the'])) AS n_stop,
           list_sort(list_distinct(string_split(text, ' ')))[-1] AS last_type,
           list_sort(list_filter(list_distinct(string_split(text, ' ')),
                                 x -> x NOT IN ('a', 'the')))[1] AS first_content
    FROM documents
    """,
)
def h22_array_setops(spark, sf_dir):
    """Array set algebra (Dask ``object``-column list ops done with Python
    ``set``; Spark has first-class kernels): ``array_distinct`` /
    ``array_intersect`` / ``array_except`` / ``sort_array`` compose per-row
    inside whole-stage codegen — no explode, no shuffle, output stays at
    document grain. Set-valued results are compared via sizes and sorted
    extremes because the engines' intersect/except kernels emit different
    element orders (both are set-semantics correct)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    types = F.array_distinct(toks)
    stop = F.array(F.lit("a"), F.lit("the"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(types).alias("n_types"),
        F.size(F.array_intersect(types, stop)).alias("n_stop"),
        F.element_at(F.sort_array(types), -1).alias("last_type"),
        F.element_at(F.sort_array(F.array_except(types, stop)), 1).alias(
            "first_content"
        ),
    )


@query(
    "h23_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, 100 * l_discount, 100 * l_tax) AS hi,
           LEAST(l_quantity, 100 * l_discount, 100 * l_tax) AS lo,
           GREATEST(l_shipdate, TIMESTAMP '1998-01-01') AS ship_floor
    FROM lineitem
    """,
)
def h23_greatest_least(spark, sf_dir):
    """Row-wise extrema across columns (numpy ``maximum.reduce`` /
    ``np.minimum`` over pandas columns): ``GREATEST``/``LEAST`` are n-ary
    codegen'd scalar kernels — the idiomatic replacement for chained
    ``F.when`` comparisons, and they null-skip per SQL semantics. Works on
    any orderable type; exercised on doubles and timestamps."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(
            F.col("l_quantity"), 100 * F.col("l_discount"), 100 * F.col("l_tax")
        ).alias("hi"),
        F.least(
            F.col("l_quantity"), 100 * F.col("l_discount"), 100 * F.col("l_tax")
        ).alias("lo"),
        F.greatest(
            F.col("l_shipdate"), F.lit("1998-01-01").cast("timestamp_ntz")
        ).alias("ship_floor"),
    )


@query(
    "h24_value_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none'
                             WHEN 'R' THEN 'returned' END AS flag_label,
           COALESCE(CASE l_linestatus WHEN 'O' THEN 'open' END, 'closed')
             AS status_label
    FROM lineitem
    """,
)
def h24_value_map(spark, sf_dir):
    """Dict-driven value mapping (pandas ``Series.map({...})`` /
    ``replace``): a literal ``MAP`` built with ``F.create_map`` and indexed
    per row — unmatched keys yield NULL exactly like ``Series.map``, with
    ``coalesce`` supplying the default. The map literal is a plan constant
    (no join, no broadcast table needed at any scale); the oracle spells the
    same lookup as simple CASE."""
    li = load(spark, sf_dir, "lineitem")
    flag_map = F.create_map(
        F.lit("A"), F.lit("accepted"),
        F.lit("N"), F.lit("none"),
        F.lit("R"), F.lit("returned"),
    )
    status_map = F.create_map(F.lit("O"), F.lit("open"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(flag_map, F.col("l_returnflag")).alias("flag_label"),
        F.coalesce(
            F.element_at(status_map, F.col("l_linestatus")), F.lit("closed")
        ).alias("status_label"),
    )


@query(
    "h26_date_extra",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS qtr,
           dayofyear(o_orderdate) AS doy,
           STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           STRFTIME(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d')
             AS plus2m
    FROM orders
    """,
)
def h26_date_extra(spark, sf_dir):
    """Date-part tier 2 (pandas ``dt.quarter/dayofyear``, offsets
    ``MonthEnd``/``DateOffset(months=)``): quarter, day-of-year, month-end
    snap, and calendar-aware month addition (both engines clamp Jan 31 + 1
    month to the shorter month's end — same convention). ``weekofyear`` is
    deliberately excluded: ISO-week numbering differs across engines
    (SURVEY §7.6.5)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 2), "yyyy-MM-dd").alias("plus2m"),
    )


@query(
    "h27_regexp_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'ta[a-z]*')) AS n_ta,
           len(regexp_extract_all(text, '[aeiou]{2}')) AS n_vowel_pairs,
           regexp_extract_all(text, '\\b[a-z]{6,}\\b')[1] AS first_long
    FROM documents
    """,
)
def h27_regexp_count(spark, sf_dir):
    """Pattern-occurrence counting and all-match extraction (pandas
    ``str.count`` / ``str.findall``): ``regexp_count`` and
    ``regexp_extract_all`` are JVM-regex kernels inside codegen — per-row,
    no explode. Patterns avoid engine-divergent regex dialect corners
    (both JVM and RE2-style engines agree on literal classes and bounded
    repeats used here)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("ta[a-z]*")).alias("n_ta"),
        F.regexp_count("text", F.lit("[aeiou]{2}")).alias("n_vowel_pairs"),
        F.try_element_at(
            F.regexp_extract_all("text", F.lit(r"\b[a-z]{6,}\b"), 0), F.lit(1)
        ).alias("first_long"),
    )


@query(
    "h28_array_tier3",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           list_position(toks, 'the') AS pos_the,
           list_has_any(toks, ['a', 'the']) AS has_stop,
           array_to_string(toks[1:5], '-') AS first5,
           len(list_filter(toks, x -> x NOT IN ('a', 'the'))) AS n_content
    FROM t
    """,
)
def h28_array_tier3(spark, sf_dir):
    """Array tier 3 — positional and membership kernels (pandas list-column
    idioms done with Python loops; Spark runs them codegen'd per row):
    ``array_position`` (1-based first occurrence, 0 when absent — both
    engines agree), ``arrays_overlap`` membership test, ``slice`` + join
    for a bounded prefix, and ``array_remove``-style filtering counted.
    All row-local — zero shuffle at any scale."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_position(toks, "the").alias("pos_the"),
        F.arrays_overlap(toks, F.array(F.lit("a"), F.lit("the"))).alias(
            "has_stop"
        ),
        F.array_join(F.slice(toks, 1, 5), "-").alias("first5"),
        F.size(
            F.filter(toks, lambda x: ~x.isin("a", "the"))
        ).alias("n_content"),
    )


@query(
    "h29_to_numeric",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(TRY_CAST(raw AS BIGINT)) AS n_parsed,
           CAST(COALESCE(SUM(TRY_CAST(raw AS BIGINT)), 0) AS BIGINT) AS sum_parsed
    FROM (
      SELECT event_type,
             CASE WHEN event_type = 'click' THEN CAST(user_id AS VARCHAR)
                  WHEN event_type = 'view' THEN CONCAT('#', user_id)
                  ELSE event_type END AS raw
      FROM events
    )
    GROUP BY event_type
    """,
)
def h29_to_numeric(spark, sf_dir):
    """Lenient numeric parsing (pandas ``to_numeric(errors='coerce')``):
    ``TRY_CAST`` turns unparseable strings into NULL instead of failing the
    job — the coerce contract. The derived column mixes clean digit
    strings, '#'-prefixed junk, and bare words, so parsed and rejected
    paths are both exercised; counts/sums of the parsed values summarize
    per event_type.

    100 TB: TRY_CAST is a codegen'd row-local kernel (no Python, no
    exception unwinding per bad row — Spark's ANSI try expressions return
    null on error by design), so the coerce path costs the same as a plain
    cast.
    """
    e = load(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "click", F.col("user_id").cast("string"))
        .when(F.col("event_type") == "view", F.concat(F.lit("#"), F.col("user_id")))
        .otherwise(F.col("event_type"))
    )
    parsed = raw.try_cast("bigint")
    return (
        e.select("event_type", parsed.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_parsed"),
            F.coalesce(F.sum("v"), F.lit(0)).alias("sum_parsed"),
        )
    )


@query(
    "h30_format_string",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           printf('%s/%s-%06d#%02d', l_returnflag, l_linestatus,
                  l_orderkey, l_linenumber) AS line_tag,
           printf('Q%03d', CAST(l_quantity AS INTEGER)) AS qty_tag
    FROM lineitem
    """,
)
def h30_format_string(spark, sf_dir):
    """printf-style string formatting (pandas ``'{}-{}'.format`` columns /
    Dask ``map`` string building): composite business keys and padded
    labels built with ``format_string`` — codegen'd, no Python. Restricted
    to %s/%d conversions ON PURPOSE: %f formatting is where Java
    (HALF_UP) and C (round-half-even) printf disagree on binary ties, the
    same family of divergence as SURVEY §7.6.2 — float *formatting*
    belongs to the presentation layer, not the engine contract.

    100 TB: row-local projection, zero exchange.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.format_string(
            "%s/%s-%06d#%02d",
            "l_returnflag",
            "l_linestatus",
            "l_orderkey",
            "l_linenumber",
        ).alias("line_tag"),
        F.format_string("Q%03d", F.col("l_quantity").cast("int")).alias("qty_tag"),
    )


@query(
    "h31_explode_outer",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> LENGTH(t) >= 9)
               AS long_toks
      FROM documents
    )
    SELECT doc_id, u.tok
    FROM base LEFT JOIN LATERAL (
      SELECT unnest(long_toks) AS tok
    ) u ON TRUE
    """,
)
def h31_explode_outer(spark, sf_dir):
    """Null-preserving explode (``explode_outer`` / pandas
    ``explode`` which keeps NaN rows for empty lists): documents whose
    token list filters down to EMPTY still emit one row with a NULL token
    — the row-preserving contract that plain ``explode`` (inner-unnest)
    silently breaks, and the difference that corrupts left-side counts in
    downstream joins when fan-out hits empty lists. Oracle is the LEFT
    JOIN LATERAL unnest form — SQL's spelling of the same semantics.

    100 TB: generator projection, no exchange; row count is
    Σ max(1, |list|).
    """
    d = load(spark, sf_dir, "documents")
    long_toks = F.filter(F.split("text", " "), lambda t: F.length(t) >= 9)
    return d.select("doc_id", F.explode_outer(long_toks).alias("tok"))


@query(
    "h32_iso_calendar",
    oracle="""
    SELECT CAST(isoyear(l_shipdate) AS INTEGER) AS iso_year,
           CAST(week(l_shipdate) AS INTEGER) AS iso_week,
           COUNT(*) AS n,
           CAST(MIN(isodow(l_shipdate)) AS INTEGER) AS first_dow,
           CAST(MAX(isodow(l_shipdate)) AS INTEGER) AS last_dow
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def h32_iso_calendar(spark, sf_dir):
    """ISO-8601 calendar surface — THE documented cross-engine divergence
    risk (§7.6.5: week/dow numbering differs between engines' default
    functions): pinned here to the ISO definitions on both sides, where
    they agree EXACTLY (probed on the year-boundary edge cases:
    2024-01-01 → W1/2024, 1995-01-01 → W52/1994, 2000-12-31 → W52/2000).
    Spark: ``weekofyear`` / ``extract(yearofweek)`` / ``extract(dow_iso)``;
    DuckDB: ``week`` / ``isoyear`` / ``isodow``. Weekly cohort aggregation
    over the ship dates proves the full fixture range round-trips.

    100 TB: row-local date kernels + one small-cardinality aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("extract(yearofweek FROM l_shipdate)")
            .cast("int")
            .alias("iso_year"),
            F.weekofyear("l_shipdate").alias("iso_week"),
            F.expr("extract(dayofweek_iso FROM l_shipdate)")
            .cast("int")
            .alias("dow"),
        )
        .groupBy("iso_year", "iso_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dow").alias("first_dow"),
            F.max("dow").alias("last_dow"),
        )
    )


@query(
    "h33_surrogate_key",
    oracle="""
    WITH minted AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5(concat_ws('|',
                 'orders',
                 CAST(o_custkey AS VARCHAR),
                 strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                 CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT) AS sk
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT sk) AS n_distinct_sk,
           MIN(sk) AS min_sk,
           MAX(sk) AS max_sk
    FROM minted
    """,
)
def h33_surrogate_key(spark, sf_dir):
    """Deterministic surrogate-key minting — the warehouse pattern for
    stable dimension keys that survive re-loads, task retries, and
    re-partitioning (what ``monotonically_increasing_id()`` famously does
    NOT): the key is the portable 60-bit digest of a NAMESPACED natural
    key ('orders' + business columns), so every engine, run, and replica
    mints the identical key with no coordination — the same reason f7
    splits by content hash instead of rand(). The query reports row and
    distinct-key counts (collision audit: with 15k rows in a 2^60 space a
    collision would be a digest bug, and would fail parity) plus the key
    range. Map-side-only minting; the distinct audit is the single
    shuffle."""
    o = load(spark, sf_dir, "orders")
    sk = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit("orders"),
                    F.col("o_custkey").cast("string"),
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                    F.col("o_orderkey").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return o.select(sk.alias("sk")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("sk").alias("n_distinct_sk"),
        F.min("sk").alias("min_sk"),
        F.max("sk").alias("max_sk"),
    )


@query(
    "h34_jaro_winkler",
    oracle="""
    WITH top_tokens AS (
      SELECT t AS token, COUNT(*) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
      GROUP BY t ORDER BY cnt DESC, token LIMIT 30
    )
    SELECT a.token AS tok_a, b.token AS tok_b,
           FLOOR(jaro_winkler_similarity(a.token, b.token) * 10000 + 0.5)
             / 10000 AS jw
    FROM top_tokens a JOIN top_tokens b ON a.token < b.token
    WHERE FLOOR(jaro_winkler_similarity(a.token, b.token) * 10000 + 0.5)
            / 10000 >= 0.70
    """,
)
def h34_jaro_winkler(spark, sf_dir):
    """Jaro-Winkler typo candidates (the record-linkage standard beside
    h16's Levenshtein; Winkler 1990, p=0.1, prefix<=4, 0.7 boost gate —
    the exact variant DuckDB's ``jaro_winkler_similarity`` implements,
    fuzz-verified to 1e-12 over 3000 random pairs): the 30 most frequent
    tokens, all ordered pairs scoring >= 0.70 — a cut that straddles the
    boost-gate boundary, so the gate itself is hash-checked. Spark has no
    JW builtin,
    so the kernel is an Arrow-batched pandas UDF over the BOUNDED pair
    set (top-k blocking, <=435 pairs — the h16 discipline, never
    all-pairs over the raw vocabulary); similarity quantized to the 1e-4
    grid on both engines (the house float-parity grid — coarse enough
    that a last-ulp difference in the three-term Jaro average cannot
    straddle a grid or 0.70-gate boundary; round-5 advice item)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _jaro(s1: str, s2: str) -> float:
        if not s1 or not s2:
            return 0.0
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        window = max(l1, l2) // 2 - 1
        m1, m2 = [False] * l1, [False] * l2
        matches = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - window), min(l2, i + window + 1)):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        t, k = 0, 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0

    def _jw(s1: str, s2: str) -> float:
        j = _jaro(s1, s2)
        if j <= 0.7:  # Winkler boost gate (DuckDB-matching)
            return j
        pref = 0
        for a, b in zip(s1, s2):
            if a != b or pref == 4:
                break
            pref += 1
        return j + pref * 0.1 * (1 - j)

    def _jw_kernel(a, b):
        import math

        return pd.Series(
            [
                math.floor(_jw(x, y) * 1e4 + 0.5) / 1e4
                for x, y in zip(a, b)
            ]
        )

    # real annotation objects (the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf cannot
    # resolve against function-local imports)
    _jw_kernel.__annotations__ = {
        "a": pd.Series,
        "b": pd.Series,
        "return": pd.Series,
    }
    jw_udf = pandas_udf(_jw_kernel, "double")

    d = load(spark, sf_dir, "documents")
    top = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(30)
        .select("token")
    )
    a = top.select(F.col("token").alias("tok_a"))
    b = top.select(F.col("token").alias("tok_b"))
    return (
        a.join(b, F.col("tok_a") < F.col("tok_b"))
        .withColumn("jw", jw_udf("tok_a", "tok_b"))
        .filter(F.col("jw") >= 0.70)
    )
