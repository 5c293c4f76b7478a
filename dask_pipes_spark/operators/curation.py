"""Group L (continued) — corpus-curation operators a production training-data
pipeline runs between "raw scrape" and "tokenizer": text normalization, PII
redaction, fixed-window chunking, concat-and-chunk sequence packing, and
quality-percentile filtering (SURVEY.md §2-X).

Published grounding: C4 cleaning heuristics (Raffel et al. 2020); Gopher
rule-based quality filters (Rae et al. 2021); concat-and-chunk packing is the
standard LM pretraining batching scheme (GPT-2/3 data pipelines).

Scale notes (100 TB):
- l19/l20 are pure per-row codegen expressions — no shuffle, no Python;
  throughput is scan-bound and the regexes run in the JVM.
- l21 chunking fans one row out to O(len/stride) rows via ``explode`` —
  still narrow (no shuffle); output row count is bounded by corpus
  bytes / stride, and the explode happens after scan-side column pruning.
- l22 packing windows over (source) shards: each shard's cumsum is one
  sorted window partition, so parallelism = #shards and no global sort is
  required. A single global pack order would serialize; per-shard packing is
  what real pipelines do (shard-local bin ids, shard id disambiguates).
- l23 ranks within lang partitions — the quantile threshold comes from a
  window rank, not a driver collect, so it scales with the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import fanout, load, pin_scratch

#: fixed accent-fold table applied by l19 (both engines have ``translate``)
_ACCENTS_FROM = "áéíóúüñàèìòùâêîôûç"
_ACCENTS_TO = "aeiouunaeiouaeiouc"

#: l21 chunking geometry (chars): window 128, stride 96 → 32-char overlap
CHUNK_SIZE = 128
CHUNK_STRIDE = 96

#: l22 packing context length (whitespace tokens)
PACK_CTX = 512


def normalize_text(col):
    """Canonical text form: lowercase, accent-fold, collapse runs of
    whitespace to single spaces, trim. Matches the oracle's
    ``TRANSLATE(LOWER(..))`` + global regexp_replace exactly."""
    c = F.translate(F.lower(col), _ACCENTS_FROM, _ACCENTS_TO)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


@query(
    "l19_text_normalize",
    oracle=f"""
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(TRANSLATE(LOWER(text),
                '{_ACCENTS_FROM}', '{_ACCENTS_TO}'), '\\s+', ' ', 'g'))
             AS norm_text,
           CAST(LENGTH(TRIM(REGEXP_REPLACE(TRANSLATE(LOWER(text),
                '{_ACCENTS_FROM}', '{_ACCENTS_TO}'), '\\s+', ' ', 'g')))
             AS BIGINT) AS norm_chars
    FROM documents
    """,
)
def l19_text_normalize(spark, sf_dir):
    """C4-style canonicalization: lowercase, accent-fold (fixed table),
    whitespace collapse, trim. Pure codegen string expressions — the
    upstream step every dedup hash (l1/l2/l9) should consume."""
    d = load(spark, sf_dir, "documents")
    n = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        n.alias("norm_text"),
        F.length(n).cast("long").alias("norm_chars"),
    )


# Redaction patterns — RE2-safe (no backreferences/lookaround) so the same
# pattern text runs on Spark (Java regex) and DuckDB (RE2) identically.
_PAT_URL = r"https?://\S+"
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PAT_LONGNUM = r"\b\d{7,}\b"


def redact_pii(col):
    """URL → <URL>, email → <EMAIL>, 7+-digit runs → <NUM>; URL first so
    emails inside URLs don't double-fire."""
    c = F.regexp_replace(col, _PAT_URL, "<URL>")
    c = F.regexp_replace(c, _PAT_EMAIL, "<EMAIL>")
    return F.regexp_replace(c, _PAT_LONGNUM, "<NUM>")


@query(
    "l20_pii_redact",
    oracle=f"""
    SELECT doc_id,
           REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
               '{_PAT_URL}', '<URL>', 'g'),
               '{_PAT_EMAIL}', '<EMAIL>', 'g'),
               '{_PAT_LONGNUM}', '<NUM>', 'g') AS redacted,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_PAT_URL}'))
              + LEN(REGEXP_EXTRACT_ALL(text, '{_PAT_EMAIL}'))
              + LEN(REGEXP_EXTRACT_ALL(text, '{_PAT_LONGNUM}'))
             AS BIGINT) AS n_hits
    FROM documents
    """,
)
def l20_pii_redact(spark, sf_dir):
    """PII scrubbing: URLs, emails, long digit runs → typed placeholders,
    plus a per-doc hit count. Single-pass JVM regex chain; the fixture
    corpus is synthetic (mostly zero hits) — crafted-input behavior is
    pinned in tests/test_curation.py."""
    d = load(spark, sf_dir, "documents")
    hits = (
        F.regexp_count("text", F.lit(_PAT_URL))
        + F.regexp_count("text", F.lit(_PAT_EMAIL))
        + F.regexp_count("text", F.lit(_PAT_LONGNUM))
    )
    return d.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        hits.cast("long").alias("n_hits"),
    )


@query(
    "l21_doc_chunk",
    oracle=f"""
    SELECT doc_id,
           i AS chunk_id,
           SUBSTRING(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}) AS chunk_text,
           CAST(LENGTH(SUBSTRING(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))
             AS BIGINT) AS chunk_len
    FROM documents,
         UNNEST(GENERATE_SERIES(0,
             GREATEST(0, CAST(FLOOR((n_chars - 1) / {CHUNK_STRIDE}.0) AS BIGINT))
         )) AS t(i)
    """,
)
def l21_doc_chunk(spark, sf_dir):
    """Sliding-window chunking: 128-char windows every 96 chars (32-char
    overlap) — the context-window splitter for long documents. One narrow
    ``explode`` per row (no shuffle); chunk count = ceil(len/stride)."""
    d = load(spark, sf_dir, "documents")
    n_last = F.greatest(
        F.lit(0), F.floor((F.col("n_chars") - 1) / CHUNK_STRIDE).cast("long")
    )
    chunk = F.substring(
        "text", F.col("chunk_id").cast("int") * CHUNK_STRIDE + F.lit(1), CHUNK_SIZE
    )
    return (
        d.select("doc_id", "text", F.explode(F.sequence(F.lit(0).cast("long"), n_last)).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            chunk.alias("chunk_text"),
            F.length(chunk).cast("long").alias("chunk_len"),
        )
    )


@query(
    "l22_seq_pack",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), placed AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
      FROM toks
    )
    SELECT source,
           CAST(FLOOR(start_tok / {PACK_CTX}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM placed
    GROUP BY source, CAST(FLOOR(start_tok / {PACK_CTX}.0) AS BIGINT)
    """,
)
def l22_seq_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing: within each source shard, docs are
    laid end-to-end in doc_id order and assigned to 512-token context bins
    by their start offset (the GPT-2/3 pretraining batching scheme). The
    cumsum windows over (source) shards, so parallelism = #shards and no
    global sort exists; bin ids are shard-local by design."""
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(F.split("text", " ")).cast("long")
    placed = d.select("source", "doc_id", n_tok.alias("n_tokens")).withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        placed.withColumn(
            "bin_id", F.floor(F.col("start_tok") / float(PACK_CTX)).cast("long")
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "l23_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             -- identical composite to l14, FLOOR-quantized (section 7.6.2):
             -- exact 1e-6 midpoints flip between engines under ROUND
             FLOOR((
                 LEAST(CAST(n_chars AS DOUBLE) / 200.0, 1.0) * 0.4
                 + (1.0 - CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   t -> t IN ('a', 'the'))) AS DOUBLE)
                         / LEN(STRING_SPLIT(text, ' '))) * 0.3
                 + CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                         / LEN(STRING_SPLIT(text, ' ')) * 0.3
               ) * 1000000 + 0.5) / 1000000 AS quality
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, quality,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM scored
    )
    SELECT doc_id, lang, quality, rn
    FROM ranked
    WHERE rn * 2 <= n_lang + 1
    """,
)
def l23_quality_filter(spark, sf_dir):
    """Keep the top half of each language by quality score (l14's composite)
    — percentile filtering done with a window rank, not a driver-side
    threshold collect, so the cut scales with the lang shuffle. Integer rank
    arithmetic (rn*2 <= n+1) avoids any float-threshold comparison; ties
    break on doc_id for determinism."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    stop_raw = F.size(F.filter(toks, lambda t: t.isin("a", "the"))).cast("double") / n_tok
    ttr_raw = F.size(F.array_distinct(toks)).cast("double") / n_tok
    len_norm = F.least(F.col("n_chars").cast("double") / 200.0, F.lit(1.0))
    # FLOOR quantizer, not round() — see l14: exact 1e-6 midpoints flip
    # between engines under round(); identical under FLOOR(x*1e6+0.5)
    quality = (
        F.floor(
            (len_norm * 0.4 + (1.0 - stop_raw) * 0.3 + ttr_raw * 0.3)
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    scored = d.select("doc_id", "lang", quality.alias("quality"))
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    ranked = scored.select(
        "doc_id",
        "lang",
        "quality",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
    )
    return ranked.filter(F.col("rn") * 2 <= F.col("n_lang") + 1).select(
        "doc_id", "lang", "quality", "rn"
    )


@query(
    "l24_repetition_ratio",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(1.0 - CAST(SUM(n_uniq) AS DOUBLE) / SUM(n_tok), 8)
             AS corpus_rep,
           ROUND(MAX(1.0 - CAST(n_uniq AS DOUBLE) / n_tok), 8) AS max_rep,
           COUNT(*) FILTER (1.0 - CAST(n_uniq AS DOUBLE) / n_tok > 0.5)
             AS n_highrep
    FROM (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    ) GROUP BY lang
    """,
)
def l24_repetition_ratio(spark, sf_dir):
    """Token-repetition quality signal (Gopher rep-filters, Rae et al. 2021
    §A1.1: high duplicate-token fraction predicts boilerplate/spam). Per doc:
    1 - distinct_tokens/total_tokens; per lang: corpus-level ratio from exact
    integer sums, max per-doc ratio, and the count above the 0.5 cut. Pure
    narrow per-row array ops feeding one map-side-combined groupBy — all
    float outputs are single divides over exact BIGINT sums, so the hash is
    stable without decimal scaffolding."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    per_doc = d.select(
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    rep = 1.0 - F.col("n_uniq").cast("double") / F.col("n_tok")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            1.0 - F.sum("n_uniq").cast("double") / F.sum("n_tok"), 8
        ).alias("corpus_rep"),
        F.round(F.max(rep), 8).alias("max_rep"),
        F.count_if(rep > 0.5).alias("n_highrep"),
    )


@query(
    "l25_sampling_weights",
    oracle="""
    WITH per_lang AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS char_mass
      FROM documents GROUP BY lang
    ),
    probs AS (
      SELECT lang, n_docs, char_mass,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p
      FROM per_lang
    )
    SELECT lang, n_docs, char_mass,
           ROUND(p, 8) AS p_raw,
           ROUND(SQRT(p) / SUM(SQRT(p)) OVER (), 6) AS q_temp
    FROM probs
    """,
)
def l25_sampling_weights(spark, sf_dir):
    """Temperature-scaled data-mixture sampling weights (the multilingual
    rebalancing rule of XLM-R / mT5: q_i ∝ p_i^α flattens head languages and
    boosts the tail; α = 0.5 here so the exponent is IEEE-exact ``sqrt``).
    The mixture table is tiny (one row per lang/source), so the normalizing
    window sums run on a broadcast-sized frame — at 100 TB only the per-lang
    counting pass touches data."""
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("char_mass"),
    )
    wall = Window.partitionBy()
    probs = per_lang.select(
        "lang",
        "n_docs",
        "char_mass",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(wall)).alias("p"),
    )
    return probs.select(
        "lang",
        "n_docs",
        "char_mass",
        F.round("p", 8).alias("p_raw"),
        F.round(F.sqrt("p") / F.sum(F.sqrt("p")).over(wall), 6).alias("q_temp"),
    )


@query(
    "l26_dedup_keep_best",
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY substr(text, 1, 32)
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (rn = 1) AS n_kept,
           COUNT(*) FILTER (rn > 1) AS n_purged,
           CAST(SUM(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM r GROUP BY lang
    """,
)
def l26_dedup_keep_best(spark, sf_dir):
    """Dedup with a quality-keeper policy: group near-identical docs (shared
    32-char prefix — the cheap URL/boilerplate-prefix heuristic of
    C4/RefinedWeb-style cleaning) and keep the HIGHEST-QUALITY member
    (longest, doc_id tiebreak) instead of an arbitrary one. One shuffle keyed
    by the prefix; the survivor rule is a rank-1 window, total-ordered so the
    pick is deterministic. Contrast l1 (keep min id) — real pipelines keep
    the best copy, not the first."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.substring("text", 1, 32)).orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    r = d.select("lang", "n_chars", F.row_number().over(w).alias("rn"))
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("rn") == 1).alias("n_kept"),
        F.count_if(F.col("rn") > 1).alias("n_purged"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


@query(
    "l27_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, len(t) - 3),
                                   i -> array_to_string(t[i:i+3], ' '))) AS g
      FROM toks WHERE len(t) >= 4
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT gr.doc_id
      FROM grams gr JOIN bench b USING (g)
      WHERE gr.doc_id % 97 <> 0
    )
    SELECT d.lang,
           COUNT(*) AS n_train,
           COUNT(c.doc_id) AS n_contaminated,
           ROUND(CAST(COUNT(c.doc_id) AS DOUBLE) / COUNT(*), 6) AS contam_rate
    FROM documents d
    LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id % 97 <> 0
    GROUP BY d.lang
    """,
)
def l27_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 §C / PaLM-style n-gram overlap): flag
    training docs sharing any word n-gram with the held-out eval set. Eval set
    here = ``doc_id % 97 = 0`` (~1%); n = 4 because the synthetic corpus has a
    tiny vocabulary (production uses 8–13). The eval-side gram set is small by
    construction, so it is BROADCAST and the corpus-side probe is a map-side
    semi-join — the 100 TB scan never shuffles; at larger eval sets the grams
    would be 64-bit-hashed first to shrink the broadcast."""
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 3, 0)),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 4)))"
            )
        ).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(1))
    )
    train = d.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("is_contam").alias("n_contaminated"),
            F.round(
                F.count("is_contam").cast("double") / F.count(F.lit(1)), 6
            ).alias("contam_rate"),
        )
    )


@query(
    "l28_vocab_induction",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS pair
      FROM toks WHERE len(t) >= 2
    ),
    counted AS (SELECT pair, COUNT(*) AS n_occ FROM pairs GROUP BY pair)
    SELECT pair, n_occ, rank FROM (
      SELECT pair, n_occ,
             ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair) AS rank
      FROM counted
    ) WHERE rank <= 20
    """,
)
def l28_vocab_induction(spark, sf_dir):
    """One BPE merge round (Sennrich et al. 2016): count adjacent token
    pairs corpus-wide and rank the top merge candidates — the inner loop of
    tokenizer training, run as data-parallel counting. The pair explode is
    narrow; the groupBy shuffles only (pair, partial-count) — cardinality is
    vocab², not corpus size — and the final top-20 window sorts that small
    aggregate, so the global ORDER BY never touches raw data. (count, pair)
    is a total order, so ranks are deterministic."""
    d = load(spark, sf_dir, "documents")
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 1, 0)),"
                " i -> concat(element_at(split(text, ' '), i), ' ',"
                "             element_at(split(text, ' '), i + 1)))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_occ"))
    w = Window.orderBy(F.col("n_occ").desc(), F.col("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("pair", "n_occ", "rank")
    )


@query(
    "l30_unigram_xent",
    oracle="""
    WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                  FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab),
    scored AS (
      SELECT doc_id,
             CAST(-LN(CAST(c AS DOUBLE) / t) AS DECIMAL(28,6)) AS lp
      FROM toks JOIN vocab USING (tok) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tok,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS cross_entropy
    FROM scored GROUP BY doc_id
    """,
)
def l30_unigram_xent(spark, sf_dir):
    """Language-model quality scoring, unigram edition (the CCNet / LLaMA
    pipeline filters on LM perplexity; a corpus-fit unigram model is its
    data-parallel floor): token cross-entropy = avg −ln p(token) per doc,
    with p from corpus-wide counts. Two passes: (1) vocab counts — shuffle
    bounded by vocab size, not corpus size; (2) token→prob lookup as a
    BROADCAST join onto the exploded stream (vocab is small by Heaps' law),
    then one per-doc aggregation. Per-token logs are quantized to DECIMAL(6)
    before summing so the per-doc sum is order-insensitive and both engines
    agree bitwise."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").cast("long").alias("t"))
    probs = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        (-F.log(F.col("c").cast("double") / F.col("t")))
        .cast("decimal(28,6)")
        .alias("lp"),
    )
    scored = toks.join(F.broadcast(probs), "tok")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(
            F.sum("lp").cast("double") / F.count(F.lit(1)), 4
        ).alias("cross_entropy"),
    )


@query(
    "l31_tokenize_ids",
    oracle="""
    WITH lists AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (SELECT doc_id, t, UNNEST(generate_series(1, len(t))) AS i
            FROM lists),
    toks AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok FROM pos),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    ids AS (SELECT tok,
                   ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS token_id
            FROM vocab)
    SELECT doc_id, pos, token_id FROM toks JOIN ids USING (tok)
    """,
)
def l31_tokenize_ids(spark, sf_dir):
    """Tokenizer id-mapping: assign each vocabulary token a dense id by
    frequency rank (the layout every trained tokenizer ships) and emit the
    corpus as (doc, position, token_id) — the numeric form that feeds
    sequence packing (l22) and model input pipelines. The vocab is counted
    once (shuffle bounded by |V|), ranked with a total-order window over the
    tiny vocab frame, then BROADCAST back onto the positional token stream —
    the 100 TB corpus is mapped map-side, no data-sized shuffle. Position
    comes from ``posexplode`` (0-based, matches the oracle's ordinality)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok"))
    ids = vocab.select("tok", F.row_number().over(w).alias("token_id"))
    return toks.join(F.broadcast(ids), "tok").select("doc_id", "pos", "token_id")


@query(
    "l32_dup_ngram_coverage",
    oracle="""
    WITH lists AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 4)) AS i
            FROM lists WHERE len(t) >= 5),
    shingles AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
                  AS BIGINT) AS h
      FROM pos),
    dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM shingles GROUP BY h)
            WHERE c >= 2)
    SELECT doc_id, COUNT(*) AS n_shingles,
           ROUND(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS dup_frac
    FROM shingles s LEFT JOIN dup d ON s.h = d.h
    GROUP BY doc_id
    """,
)
def l32_dup_ngram_coverage(spark, sf_dir):
    """Exact-substring duplication coverage (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): the fraction of a
    document's word 5-grams that occur >=2 times corpus-wide — the signal
    behind exact-substring dedup and memorization audits. Plan shape (round-4
    rework, the SCALING.md fix): 5-grams are hashed to a portable 60-bit
    integer AT THE EXPLODE (one md5 per occurrence), so every downstream
    shuffle carries 8-byte keys instead of ~30-byte strings; the count pass
    is reduced to the duplicated-key SET (c >= 2, no count payload — on
    natural corpora a small fraction of distinct n-grams), and the join back
    is a LEFT join against that set with a null-flag aggregate per doc.
    The dup set is corpus-sized at 100 TB — NOT broadcastable, unlike a
    vocab — but the join's right side carries one bigint per duplicated
    n-gram and AQE splits the heavy-hitter keys on the left. A 60-bit hash
    collision would fold two n-grams (prob ~n^2/2^61); both engines hash
    identically so the oracle sees the same folding."""
    d = fanout(load(spark, sf_dir, "documents"))  # n-gram map on all cores
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 5
    )
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 4),
                lambda i: F.conv(
                    F.substring(F.md5(F.array_join(F.slice("t", i, 5), " ")), 1, 15),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("h"),
    # referenced by BOTH the dup-set count and the probe side below; the
    # scratch-parquet pin materializes the (doc_id, h) frame once (16 B/row)
    # instead of re-running the explode+md5 per branch (measured 2x at sf1).
    # Round 12: parquet instead of eager localCheckpoint — same single
    # materialization, but fault-tolerant (lost executors re-READ) and the
    # serving plan stays a visible parquet scan for the EXPLAIN gate.
    )
    shingles = pin_scratch(shingles, "dps_l32_shingles")
    dup = (
        shingles.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        shingles.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )


@query(
    "l33_mixture_sample",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n,
             CAST(SQRT(COUNT(*)) AS DECIMAL(28,6)) AS w
      FROM documents GROUP BY source
    ),
    quota AS (
      SELECT source,
             CAST(CEIL(200 * CAST(w AS DOUBLE)
                       / CAST(SUM(w) OVER () AS DOUBLE)) AS BIGINT) AS k
      FROM counts
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY MD5('mix:' || doc_id), doc_id)
               AS sample_rank
      FROM documents
    )
    SELECT doc_id, source, sample_rank
    FROM ranked JOIN quota USING (source)
    WHERE sample_rank <= k
    """,
)
def l33_mixture_sample(spark, sf_dir):
    """Temperature-scaled data-mixture sampling (the XLM-R / multilingual
    recipe l25 computes weights for, executed): per-source quotas
    q_s = ceil(K * sqrt(n_s) / sum sqrt(n)), filled deterministically by
    taking each source's bottom-q_s docs by keyed hash — i.e. stratified
    bottom-k (f9) driven by a computed mixture. sqrt weights are quantized
    to DECIMAL before the cross-source sum so the normalizer is
    order-insensitive; the quota table is per-source-tiny and broadcast;
    the per-source ranking runs parallel across sources (partitioned
    window, no global sort). Retry/partition-stable like f8/f9."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sqrt(F.count(F.lit(1))).cast("decimal(28,6)").alias("w")
    )
    quota = counts.select(
        "source",
        F.ceil(
            F.lit(200)
            * F.col("w").cast("double")
            / F.sum(F.col("w")).over(Window.partitionBy()).cast("double")
        ).alias("k"),
    )
    h = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(h, "doc_id"))
        .alias("sample_rank"),
    )
    return ranked.join(F.broadcast(quota), "source").filter(
        F.col("sample_rank") <= F.col("k")
    ).select("doc_id", "source", "sample_rank")


@query(
    "l48_incremental_dedup",
    oracle="""
    WITH corpus AS (
      SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 5 = 0
    ),
    batch AS (
      SELECT doc_id, lang, sha256(text) AS h FROM documents
      WHERE doc_id % 5 <> 0
    ),
    tagged AS (
      SELECT b.doc_id, b.lang, b.h,
             (c.h IS NOT NULL) AS in_corpus,
             ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn
      FROM batch b LEFT JOIN corpus c ON b.h = c.h
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(COUNT(*) FILTER (WHERE in_corpus) AS BIGINT)
             AS n_dropped_vs_corpus,
           CAST(COUNT(*) FILTER (WHERE NOT in_corpus AND rn > 1) AS BIGINT)
             AS n_dropped_in_batch,
           CAST(COUNT(*) FILTER (WHERE NOT in_corpus AND rn = 1) AS BIGINT)
             AS n_kept
    FROM tagged GROUP BY lang
    """,
)
def l48_incremental_dedup(spark, sf_dir):
    """Incremental corpus ingest dedup — the shape a CONTINUOUSLY-growing
    training corpus actually runs (nobody re-dedups 100 TB per day): the
    existing corpus is represented by its content-digest state table
    (here: docs with ``doc_id % 5 = 0``), and each new batch is deduped
    (a) against that state via a digest anti/left join and (b) within
    itself by the min-doc_id survivor rule, reporting per-language ingest
    accounting. Kept docs' digests then append to the state table —
    making the next batch's join input, the incremental loop.

    100 TB: the state table is digests only (32 bytes/doc, ~1/1000th of
    corpus bytes), bucketed by digest so each day's batch join is
    co-partitioned; the batch-internal dedup is one keyed window. Fully
    SQL-oracled end-to-end."""
    d = fanout(load(spark, sf_dir, "documents"))  # digest map on all cores
    corpus = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(F.sha2("text", 256).alias("h"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    batch = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", F.sha2("text", 256).alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    tagged = (
        batch.join(corpus, "h", "left")
        .withColumn("in_corpus", F.coalesce("in_corpus", F.lit(False)))
        .withColumn("rn", F.row_number().over(w))
    )
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count_if(F.col("in_corpus")).alias("n_dropped_vs_corpus"),
        F.count_if(~F.col("in_corpus") & (F.col("rn") > 1)).alias(
            "n_dropped_in_batch"
        ),
        F.count_if(~F.col("in_corpus") & (F.col("rn") == 1)).alias("n_kept"),
    )


@query(
    "l50_dsir_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 128 AS b
      FROM (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok
            FROM documents)
    ),
    tgt AS (
      SELECT b, COUNT(*) AS c FROM toks WHERE lang = 'en' GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
               AS nt,
             CAST(COUNT(*) AS DOUBLE) AS ns
      FROM toks
    ),
    src AS (SELECT b, COUNT(*) AS c FROM toks GROUP BY b),
    ratio AS (
      SELECT src.b,
             CAST(CAST(LN((COALESCE(tgt.c, 0) + 1) / (tot.nt + 128))
                       - LN((src.c + 1) / (tot.ns + 128))
                  AS DECIMAL(18,10)) AS DOUBLE) AS logr
      FROM src LEFT JOIN tgt ON src.b = tgt.b CROSS JOIN tot
    ),
    docw AS (
      SELECT t.doc_id, t.lang,
             CAST(SUM(CAST(r.logr AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*) AS logw
      FROM toks t JOIN ratio r ON t.b = r.b
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(CAST(SUM(CAST(logw AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS avg_logw,
           FLOOR(MIN(logw) * 10000 + 0.5) / 10000 AS min_logw,
           FLOOR(MAX(logw) * 10000 + 0.5) / 10000 AS max_logw
    FROM docw GROUP BY lang
    """,
)
def l50_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — Data
    Selection via Importance Resampling): score every document by the
    log-likelihood ratio of hashed n-gram features under a TARGET
    distribution (here: the English slice) vs the SOURCE (whole corpus) —
    the method behind targeted pretraining mixtures. Features are word
    unigrams hashed into 128 buckets with the portable md5-60bit hash
    (l2/l16 discipline), both bucket models Laplace-smoothed; per-doc
    weight = mean log ratio over its tokens. English docs must score
    highest (asserted in tests), and everything — hashing, models, log
    ratios (snapped to DECIMAL(18,10), l34 discipline), per-doc decimal
    sums — is recomputed in the SQL oracle.

    100 TB: the feature models are 128 rows (broadcast scalars); the only
    corpus-scale work is the token explode + one bucket-keyed aggregate
    and a broadcast join back — no vocabulary pass, which is the point of
    the hashing trick. Resampling itself is l25/l33's machinery fed by
    these weights."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"),
            F.lit(128),
        ).alias("b"),
    )
    tot = toks.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("nt"),
        F.count(F.lit(1)).cast("double").alias("ns"),
    )
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    src = toks.groupBy("b").agg(F.count(F.lit(1)).alias("sc"))
    ratio = (
        src.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.coalesce("tc", F.lit(0)) + 1) / (F.col("nt") + 128))
                - F.log((F.col("sc") + 1) / (F.col("ns") + 128))
            )
            .cast("decimal(18,10)")
            .cast("double")
            .alias("logr"),
        )
    )
    docw = (
        toks.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum(F.col("logr").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("logw")
        )
    )
    q = lambda x: F.floor(x * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return docw.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        q(
            F.sum(F.col("logw").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_logw"),
        q(F.min("logw")).alias("min_logw"),
        q(F.max("logw")).alias("max_logw"),
    )


@query(
    "l58_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS g
      FROM toks,
           LATERAL (SELECT UNNEST(range(GREATEST(len(t) - 3, 0) + 1)) AS i)
      WHERE len(t) >= 3
    ),
    first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           FLOOR(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
             AS novelty
    FROM sh s JOIN first_seen f USING (g)
    GROUP BY s.doc_id
    """,
)
def l58_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty — the fraction of a document's DISTINCT
    word 3-grams it is the FIRST (lowest doc_id) to contribute to the
    corpus. The incremental-value signal behind curriculum ordering and
    ingest-time novelty filters (a batch twin of l48's incremental dedup:
    l48 asks "is this exact content new", this asks "how much of this
    content is new"); documents full of already-seen phrasing score near 0
    and are downsampling candidates (composes with l25's weights).
    Deterministic end to end: distinct shingles, an integer MIN per
    n-gram, integer counts, one FLOOR-quantized division.

    100 TB: one explode to 3-gram grain, one n-gram-grain aggregate
    (MIN doc_id — partial+final, order-free), one equi-join back at
    n-gram grain (corpus-sized, NOT broadcast — l32's discipline), one
    per-doc aggregate. At scale the n-gram key would be xxhash64-packed to
    shrink shuffle payloads; kept as text so both engines group on
    identical keys. Docs under 3 tokens contribute no rows (novelty is
    undefined without an n-gram — same rows absent on both engines)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.array_join(F.slice("t", i, 3), " "),
                )
            )
        ).alias("g"),
    )
    first_seen = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            (
                F.floor(
                    F.sum(
                        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                    )
                    / F.count(F.lit(1)).cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("novelty"),
        )
    )


_L60_TOPK = 1000  # Zipf fit over the top-K frequency ranks (standard practice)


def _l60_oracle(k: int = _L60_TOPK) -> str:
    """DuckDB twin of l60: same tokenization, same total-order ranking, the
    same ROUND(6)-quantized log-log terms and decimal sums (d23/d46 OLS
    discipline), so the slope/r2 match bitwise."""
    q6 = lambda e: f"FLOOR(({e}) * 1000000 + 0.5) / 1000000"  # noqa: E731
    dsum = lambda e: f"CAST(SUM(CAST({e} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r, c FROM vocab
    ),
    pts AS (
      SELECT {q6('LN(r)')} AS x, {q6('LN(c)')} AS y
      FROM ranked WHERE r <= {k}
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             {dsum('x')} AS sx, {dsum('y')} AS sy,
             {dsum('x * y')} AS sxy, {dsum('x * x')} AS sxx,
             {dsum('y * y')} AS syy
      FROM pts
    ),
    tot AS (SELECT COUNT(*) AS vocab_size FROM vocab)
    SELECT CAST(t.vocab_size AS BIGINT) AS vocab_size,
           CAST(s.n AS BIGINT) AS n_ranks,
           FLOOR((s.sxy - s.sx * s.sy / s.n)
                 / (s.sxx - s.sx * s.sx / s.n) * 1000000 + 0.5) / 1000000
             AS zipf_slope,
           FLOOR(POW(s.sxy - s.sx * s.sy / s.n, 2)
                 / ((s.sxx - s.sx * s.sx / s.n)
                    * (s.syy - s.sy * s.sy / s.n)) * 1000000 + 0.5) / 1000000
             AS r2
    FROM sums s CROSS JOIN tot t
    """


@query("l60_zipf_slope", oracle=_l60_oracle())
def l60_zipf_slope(spark, sf_dir):
    """Corpus-level Zipf-law audit: OLS slope of log(frequency) on log(rank)
    over the top-1000 token ranks. Natural language sits near slope -1
    (Zipf 1949; Piantadosi 2014 review); template/boilerplate-heavy or
    machine-generated corpora flatten or steepen the curve, making this a
    one-row drift signal a curation pipeline tracks per ingest batch next
    to l5's raw frequency table. Fully SQL-oracled: log terms are
    ROUND(6)-quantized before exact decimal sums (d23/d46 OLS discipline),
    so both engines agree bitwise on slope and r2.

    100 TB: the vocab count is one hash aggregate (shuffle bounded by |V|);
    the top-1000 cut is a TakeOrdered (no global sort materialization), and
    the window ranking runs on 1000 rows. A 1-token corpus yields a zero
    denominator -> NULL slope via try_divide (DuckDB x/0 parity)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # reused by the top-K cut AND the size count — the scratch-parquet pin
    # runs the |V|-bounded hash aggregate once and keeps both consumers'
    # plans audit-visible (round 12; was an eager localCheckpoint)
    vocab = pin_scratch(vocab, "dps_l60_vocab")
    top = vocab.orderBy(F.col("c").desc(), "tok").limit(_L60_TOPK)
    w = Window.orderBy(F.col("c").desc(), "tok")
    q6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    pts = top.withColumn("r", F.row_number().over(w)).select(
        q6(F.log(F.col("r"))).alias("x"), q6(F.log(F.col("c"))).alias("y")
    )
    dec = "decimal(38,12)"
    n = F.count(F.lit(1))
    sx = F.sum(F.col("x").cast(dec)).cast("double")
    sy = F.sum(F.col("y").cast(dec)).cast("double")
    sxy = F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
    syy = F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double")
    sums = pts.agg(
        n.cast("bigint").alias("n_ranks"),
        q6(
            F.try_divide(sxy - sx * sy / n, sxx - sx * sx / n)
        ).alias("zipf_slope"),
        q6(
            F.try_divide(
                F.pow(sxy - sx * sy / n, F.lit(2)),
                (sxx - sx * sx / n) * (syy - sy * sy / n),
            )
        ).alias("r2"),
    )
    size = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("vocab_size"))
    return size.crossJoin(sums).select(  # 1-row x 1-row
        "vocab_size", "n_ranks", "zipf_slope", "r2"
    )
