"""Curation-operator behavioral tests on crafted inputs — the fixture corpus
is lowercase/ascii/spaced, so normalization and redaction are near-identity
there; these tests pin the real semantics (SURVEY §2-X l19–l23)."""

from pyspark.sql import functions as F

from dask_pipes_spark.operators.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_CTX,
    normalize_text,
    redact_pii,
)
from tests.conftest import SF_SMOKE


def test_normalize_text_crafted(spark):
    df = spark.createDataFrame(
        [("  Héllo\t WORLD \n  ", ), ("café  ñandú", ), ("plain", )], ["text"]
    )
    got = [r.n for r in df.select(normalize_text("text").alias("n")).collect()]
    assert got == ["hello world", "cafe nandu", "plain"]


def test_redact_pii_crafted(spark):
    df = spark.createDataFrame(
        [
            ("mail me at a.b+c@ex-ample.org now",),
            ("see https://ex.com/p?q=1 and http://t.co",),
            ("card 12345678 short 123456",),
            ("clean text",),
        ],
        ["text"],
    )
    got = [r.r for r in df.select(redact_pii("text").alias("r")).collect()]
    assert got == [
        "mail me at <EMAIL> now",
        "see <URL> and <URL>",
        "card <NUM> short 123456",
        "clean text",
    ]


def test_chunks_reconstruct_document(spark, registry):
    """Every char of every doc is covered; adjacent chunks overlap by
    size-stride; stripping the overlap re-concatenates to the original."""
    queries, _ = registry
    rows = queries["l21_doc_chunk"](spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        rebuilt = chunks[0].chunk_text + "".join(
            c.chunk_text[CHUNK_SIZE - CHUNK_STRIDE:] for c in chunks[1:]
        )
        assert rebuilt == docs[doc_id]
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk_text[CHUNK_STRIDE:] == b.chunk_text[: CHUNK_SIZE - CHUNK_STRIDE]


def test_seq_pack_invariants(spark, registry):
    """Shard token totals are conserved; bins are contiguous from 0; every
    bin except a shard's last starts before its nominal boundary closes
    (concat-and-chunk leaves no empty bins)."""
    queries, _ = registry
    rows = queries["l22_seq_pack"](spark, SF_SMOKE).collect()
    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
    )
    want = {r.source: r.t for r in toks.collect()}
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(want)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r.bin_id)
        assert sum(b.bin_tokens for b in bins) == want[src]
        assert [b.bin_id for b in bins] == list(range(len(bins)))
        # doc ranges of consecutive bins don't interleave
        for a, b in zip(bins, bins[1:]):
            assert a.last_doc < b.first_doc
        # a bin holding >1 doc can't have started at/past its boundary with
        # room for a second doc unless docs fit: weaker sanity — every bin's
        # token load is at least 1 and bounded by ctx + one max doc
        max_doc = PACK_CTX + 1024
        assert all(0 < b.bin_tokens <= max_doc + PACK_CTX for b in bins)


def test_quality_filter_keeps_top_half_per_lang(spark, registry):
    queries, _ = registry
    kept = queries["l23_quality_filter"](spark, SF_SMOKE)
    sizes = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.lang: r.cnt for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for lang, n in sizes.items():
        assert got[lang] == (n + 1) // 2
    # kept docs' min quality >= dropped docs' max quality within each lang
    ranks = kept.groupBy("lang").agg(F.max("rn").alias("max_rn")).collect()
    for r in ranks:
        assert r.max_rn == (sizes[r.lang] + 1) // 2


def test_hll_merge_invariance_and_accuracy(spark, registry):
    """Union of per-type sketches must equal sketching the column directly
    (HLL is hash-deterministic), and land within 5% of exact — both now
    emitted as verdict columns (round-4 contract; the oracle pins them
    TRUE), so this asserts every row's verdicts."""
    queries, _ = registry
    rows = {r.event_type: r for r in queries["d22_hll_merge"](spark, SF_SMOKE).collect()}
    assert "ALL" in rows and len(rows) > 1
    for r in rows.values():
        assert r.within_5pct is True, r
        assert r.merge_consistent is True, r


def test_orc_roundtrip_preserves_values(spark, registry):
    queries, _ = registry
    got = {
        r.c_mktsegment: (r.n_cust, round(r.sum_bal, 4))
        for r in queries["a9_scan_orc"](spark, SF_SMOKE).collect()
    }
    want = {
        r.c_mktsegment: (r.n, round(r.s, 4))
        for r in spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == want


def test_semantic_dedup_matches_union_find(spark, registry):
    """p4's per-label purge counts must equal a driver-side union-find over
    the same cosine pairs."""
    queries, _ = registry
    from dask_pipes_spark.operators.llm_ext import cosine_pairs

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pairs = [(r.vec_a, r.vec_b) for r in cosine_pairs(e, 0.30).collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep = {n: find(n) for n in parent}
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    purged_by_label: dict = {}
    for n, r in rep.items():
        if r != n:
            purged_by_label[labels[n]] = purged_by_label.get(labels[n], 0) + 1
    got = {r.vec_label: (r.n_vecs, r.n_purged, r.n_kept)
           for r in queries["p4_semantic_dedup"](spark, SF_SMOKE).collect()}
    from collections import Counter
    n_by_label = Counter(labels.values())
    for lab, n in n_by_label.items():
        want_purged = purged_by_label.get(lab, 0)
        assert got[lab] == (n, want_purged, n - want_purged)


def test_l50_dsir_targets_score_highest(spark, registry):
    """DSIR sanity: the target slice (English) must get the highest average
    importance weight — that's the selection signal the method exists for."""
    queries, _ = registry
    rows = {r.lang: r.avg_logw for r in queries["l50_dsir_weights"](spark, SF_SMOKE).collect()}
    assert "en" in rows and len(rows) >= 3
    others = [v for k, v in rows.items() if k != "en"]
    assert rows["en"] > max(others), rows
