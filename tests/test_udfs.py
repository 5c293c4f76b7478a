"""Cross-checks for weak-declared UDF/scan/stream/LLM keys that carry no SQL
oracle: each asserted against an independent computation of the same answer."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_j5_udtf_matches_split_explode(spark, registry):
    """The tokenizing UDTF must emit exactly the split+explode rowset."""
    queries, _ = registry
    udtf_out = queries["j5_python_udtf"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ref = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    assert udtf_out.count() == ref.count()
    assert udtf_out.exceptAll(ref.select("doc_id", "pos", "token")).count() == 0


def test_a6_json_roundtrip_matches_source_agg(spark, registry):
    """JSON sink+scan agg equals the same agg straight off the parquet."""
    from dask_pipes_spark.session import load

    queries, _ = registry
    back = {
        (r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in queries["a6_scan_json"](spark, SF_SMOKE).collect()
    }
    from dask_pipes_spark.registry import dsum

    src = {
        (r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
        .collect()
    }
    assert back == src


def test_k7_stream_static_join_equals_batch(spark, registry):
    """Stream-static enrichment drained via availableNow equals the batch join."""
    from dask_pipes_spark.registry import dsum
    from dask_pipes_spark.session import load_tables

    queries, _ = registry
    streamed = {
        r.c_mktsegment: (r.n_events, round(r.sum_value, 4))
        for r in queries["k7_stream_static_join"](spark, SF_SMOKE).collect()
    }
    t = load_tables(spark, SF_SMOKE, ("events", "customer"))
    batch = {
        r.c_mktsegment: (r.n_events, round(r.sum_value, 4))
        for r in t["events"]
        .join(t["customer"], t["events"].user_id == t["customer"].c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .collect()
    }
    assert streamed == batch


def test_l16_fingerprints_deterministic_and_shift_robust(spark, registry):
    """Winnowing fingerprints: same doc → same fingerprint set on re-run."""
    queries, _ = registry
    a = {r.doc_id: (r.n_fingerprints, r.min_fp, r.max_fp)
         for r in queries["l16_doc_fingerprint"](spark, SF_SMOKE).collect()}
    b = {r.doc_id: (r.n_fingerprints, r.min_fp, r.max_fp)
         for r in queries["l16_doc_fingerprint"](spark, SF_SMOKE).collect()}
    assert a == b
    assert all(n > 0 for n, _, _ in a.values())


def test_l7_cluster_stats_consistent_with_l2(spark, registry):
    """Near-dup cluster stats must describe exactly l2's candidate pairs."""
    queries, _ = registry
    n_pairs = queries["l2_minhash_lsh"](spark, SF_SMOKE).count()
    stats = queries["l7_dup_cluster_stats"](spark, SF_SMOKE)
    total = stats.agg(F.sum("n_pairs").alias("s")).collect()[0].s or 0
    assert total == n_pairs


def test_map_overlap_partition_invariance(spark, registry):
    """The bilateral halo must make results independent of the partition
    count — the core map_overlap contract (any boundary placement sees
    enough context)."""
    import pandas as pd

    from dask_pipes_spark.operators.udfs import map_overlap
    from dask_pipes_spark.session import load

    e = load(spark, SF_SMOKE, "events").select("event_id", "ts", "value")

    def roll(pdf):
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "c": pdf["value"].rolling(5, min_periods=1, center=True).mean().round(4),
            }
        )

    outs = []
    for nparts in (1, 3, 8):
        rows = map_overlap(
            e, ("ts", "event_id"), before=2, after=2, fn=roll,
            schema="event_id bigint, c double", npartitions=nparts,
        ).collect()
        outs.append(sorted((r.event_id, r.c) for r in rows))
    assert outs[0] == outs[1] == outs[2]


def test_global_index_partition_invariance(spark, registry):
    """g11's distributed row index must be a dense 0..n-1 permutation of the
    order for ANY partition count (offset arithmetic ⊥ boundary placement)."""
    from dask_pipes_spark.operators.setops import _global_index
    from dask_pipes_spark.session import load

    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    expected = [
        r.o_orderkey
        for r in o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").collect()
    ]
    for nparts in (1, 4, 8):
        got = {
            r._idx: r.o_orderkey
            for r in _global_index(
                o, (F.col("o_totalprice").desc(), F.col("o_orderkey")), nparts
            ).collect()
        }
        assert [got[i] for i in range(len(expected))] == expected
