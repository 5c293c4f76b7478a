"""Physical-plan audit — the scale gate next to check_parity's correctness gate.

For every registered operator, build its DataFrame at sf0.01 and inspect the
*executed* (post-AQE-prep) physical plan for the invariants that decide
whether the operator survives a 100 TB / 1000-executor scale-up:

- **no row-at-a-time Python** (`BatchEvalPython`) anywhere — Python touches
  data only through Arrow (`ArrowEvalPython`, `MapInPandas`,
  `FlatMapGroupsInPandas`, `PythonMapInArrow`), and only in the declared
  UDF/LLM/multimodal groups (J, L, M, K6, P1);
- **scan hygiene**: `a1` must prune columns at the parquet reader
  (ReadSchema), `a2` must push its predicate (PushedFilters);
- **join strategy**: `c5` must be a `BroadcastHashJoin`; unbounded
  `CartesianProduct` appears only where declared (`c9` cross join, `c10`
  range/theta join as BNLJ, `l3`/`l11` blocked all-pairs at toy scale —
  their 100 TB paths are `l12_ivf_topk` / LSH blocking, see operator docs);
- **codegen**: every relational (non-Python-boundary) query runs inside
  WholeStageCodegen spans.

Usage:
    python tools/explain_audit.py [key ...]    # default: all keys
Writes EXPLAIN_AUDIT.md at the repo root and exits non-zero on violations.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The dedup chain's deployment default (round 11, verdict item 7): signatures
# come from the persisted generation (l80's boundary), so the audit sees the
# FULL chain plan instead of the no-index fallback's localCheckpoint — l2/l7
# previously carried the post-checkpoint caveat for that reason alone. Set
# before any query is built; honored at query-call time by _chain_signatures.
os.environ.setdefault("SPARK_GRAFT_DEDUP_INDEX", "1")

from dask_pipes_spark import operators  # noqa: F401  (registers everything)
from dask_pipes_spark.registry import ORACLES, QUERIES
from dask_pipes_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Keys whose ExistingRDD comes from PER-ROUND lineage truncation inside an
# iterative algorithm (connected-components min-label propagation, pagerank
# power iteration) — the standard Pregel-style discipline, NOT a removable
# materialization boundary: without it the logical plan grows with the
# iteration count. The audited plan is the final round + serving stages;
# the per-round exchange shape (one shuffle per round) is documented and
# test-pinned in the operator docstrings.
ITERATIVE_TRUNCATION = {
    "l18_dup_components",
    "l29_pagerank",
    "l80_dedup_chain_persisted",
    "p4_semantic_dedup",
}

# Operators whose *contract* is a Python boundary (pandas UDF / mapInPandas /
# applyInPandas / UDTF): Arrow-batched Python is expected there.
ARROW_OK = {
    "j1_scalar_pandas_udf",
    "j2_map_partitions",
    "j3_grouped_map",
    "j4_grouped_agg_udaf",
    "j5_python_udtf",
    "j6_map_overlap",
    "j7_cogrouped_map",
    "j9_map_overlap_centered",
    "j8_map_in_arrow",
    "e13_ewm",
    "k6_stream_stateful",
    "l2_minhash_lsh",
    "l7_dup_cluster_stats",
    "l9_simhash",
    "l11_embedding_neardup",
    "l12_ivf_topk",
    "l16_doc_fingerprint",
    "m1_multimodal_decode",
    "m2_multimodal_meta",
    "m3_frame_sample",
    "m4_image_resize",
    "m5_audio_segment",
    "m6_feature_extract",
    "m7_png_decode",
    "m8_png_resize",
    "m9_multiformat_dispatch",
    "m10_audio_features",
    "m11_framestream_decode",
    "m12_scene_cuts",
    "p1_pipeline_fit_transform",
    "a16_scan_avro",
    "a17_avro_schema_evolution",
    "a18_avro_split_scan",
    "k17_compact_generations",  # a18 split reader (mapInPandas block decode)
    "k18_vacuum_generations",  # same a18 split-reader boundary post-vacuum
    "m13_jpeg_decode",
    "m14_mjpeg_decode",
    "m15_jpeg_color_decode",
    "m16_jpeg_420_decode",
    "h34_jaro_winkler",
}

# Unbounded-product shapes that are *declared*: c9 is the cartesian operator
# itself; c10 is a theta join (BNLJ is the only strategy); l3/l11 are the
# brute-force all-pairs baselines whose scale path is IVF/LSH blocking.
CARTESIAN_OK = {
    "c9_join_cross",
    "c10_join_range",
    "l3_cosine_topk",
    "l11_embedding_neardup",
    # IVF coarse assignment: every vector × the (tiny, broadcast, constant-K)
    # centroid table — bounded O(N·K) BNLJ, the correct distributed shape.
    "l12_ivf_topk",
    # k-means coarse assignment (round 11): every vector × the K=64
    # broadcast codebook — the same bounded O(N·K) BNLJ shape as l12.
    "l83_kmeans_coarse_ivfpq",
    # round 12: the same bounded coarse-assignment BNLJ, now over the
    # K=⌈√N⌉ broadcast codebook (query slice × persisted centroids).
    "l84_kmeans_ivfpq_serving",
    "l85_quantizer_retrain_txn",
    # k27 serves the streamed state through l84's pruned composition — the
    # identical bounded query-slice × broadcast-⌈√N⌉-codebook BNLJ.
    "k27_stream_kivfpq_ivm",
    # theta self-join over a top-30 token block — 30×30 bounded by the limit.
    "h16_levenshtein_pairs",
    "h34_jaro_winkler",  # same 30x30 bounded token block as h16
    # 1×1 crossJoin attaching the global exact count to the merged-sketch row.
    "d22_hll_merge",
    # 1×1 crossJoin attaching the vocab size to the one-row OLS sums.
    "l60_zipf_slope",
    # scalar token-total broadcast onto the vocab-bounded prob table (1×|V|).
    "l30_unigram_xent",
    # 1-row global-average broadcast cross join fanned onto customer (1×N).
    "x5_dormant_customers",
    # 1-row exact-quartile-edges broadcast cross join onto lineitem (1×N).
    "b15_qcut",
    # 1-row global-value-threshold broadcast cross join onto the per-part
    # aggregate (1×|parts|) — the Q11 HAVING decorrelation.
    "x19_important_parts",
    # 1-row corpus stats (N, avgdl) broadcast cross join onto the tf table.
    "l40_bm25",
    # 1-row vocab-size broadcast cross join onto the bigram stream.
    "l42_bigram_xent",
    # 1-row order-count broadcast cross join onto the pair table.
    "x27_market_basket",
    # 1-row token-total broadcast onto the 128-row hash-bucket feature models.
    "l50_dsir_weights",
    # scalar corpus-total broadcast onto the vocab-bounded per-source counts.
    "l52_kl_drift",
    # scalar token-total + 1-row percentile-cutoff broadcasts (l30 pattern).
    "l53_perplexity_buckets",
    # 1-row serving-count broadcast cross join onto the 5-row PSI terms.
    "p14_drift_monitor",
    # 1-row drilled-row-count broadcast onto the (typically 1-row) diff set.
    "g13_checksum_drilldown",
    # 1-row minority-class-count broadcast onto the ranked class table.
    "f19_balanced_class_sample",
    # 1-row recency-anchor (MAX(o_orderdate)) broadcast onto orders.
    "x32_rfm_segmentation",
    # 1-row exact-count broadcast attached to the 1-row HLL estimate.
    "d43_portable_hll",
    # 1-row truth-total broadcast onto the 5-row sensitivity table, plus
    # the bounded query-batch × corpus brute-force truth join (l3 shape).
    "l69_nprobe_sensitivity",
    # 1-row (min,max,n) stats broadcast onto the fact scan + the ≤256-row
    # cumulative-bin theta join for the quantile hit search.
    "d45_histogram_quantile",
    # 1-row (n, rx, ry) totals broadcast onto the |X|·|Y|-row contingency
    # table for the MI/chi-square terms.
    "d46_mutual_information",
}

# Streaming live variants have no batch plan; their EXECUTED micro-batch
# physical plan is captured instead (round 13 — the r12 verdict's item 6):
# the key's builder drains its stream(s) through `drain()`, which records
# each terminated query's last-execution plan when
# $SPARK_GRAFT_CAPTURE_STREAM_PLANS is set, and the audit applies the same
# invariants (no BatchEvalPython, declared Arrow only, no undeclared
# cartesian, exchange budget) to the captured plan(s).
STREAM_PLAN_KEYS = {
    "k4_stream_tumbling",
    "k5_stream_dedup",
    "k6_stream_stateful",
    "k7_stream_static_join",
    "k8_stream_stream_join",
    "k10_stream_session",
    "k13_stream_checksum",
    "k14_stream_progress_audit",
    "k15_stream_incremental_dedup",
    "k16_stream_avro_sink",
}


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_BUDGET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_budget.json")


def _load_budget() -> dict:
    """Per-key shuffle-exchange budgets — the plan-REGRESSION gate. The
    recorded count is the audited-good plan's exchange count; a future edit
    that adds exchanges to a key fails the audit until the regression is
    either fixed or consciously re-recorded with ``--update-budget``.
    (Counts come from the pre-execution plan string, which is deterministic
    for a fixed operator + session config.)"""
    import json

    if os.path.exists(_BUDGET_PATH):
        with open(_BUDGET_PATH) as fh:
            return json.load(fh)
    return {}


PLAN_BUDGET = _load_budget()


def audit(keys: list[str]) -> int:
    spark = get_session("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[tuple[str, str, str]] = []  # key, verdict, notes
    violations = 0

    from dask_pipes_spark import streaming as _streaming

    for key in keys:
        notes: list[str] = []
        if key in STREAM_PLAN_KEYS:
            _streaming.CAPTURED_STREAM_PLANS.clear()
            os.environ["SPARK_GRAFT_CAPTURE_STREAM_PLANS"] = "1"
            try:
                QUERIES[key](spark, SF_DIR)
            except Exception as exc:  # noqa: BLE001
                rows.append((key, "ERROR", str(exc).splitlines()[0][:120]))
                violations += 1
                continue
            finally:
                os.environ.pop("SPARK_GRAFT_CAPTURE_STREAM_PLANS", None)
            captured = list(_streaming.CAPTURED_STREAM_PLANS)
            if not captured:
                rows.append((key, "ERROR", "no micro-batch plan captured"))
                violations += 1
                continue
            plan = "\n".join(p for _, p in captured)
            notes.append(
                f"micro-batch plan ({len(captured)} drained "
                f"quer{'y' if len(captured) == 1 else 'ies'})"
            )
        else:
            try:
                df = QUERIES[key](spark, SF_DIR)
                plan = plan_of(df)
            except Exception as exc:  # noqa: BLE001
                rows.append((key, "ERROR", str(exc).splitlines()[0][:120]))
                violations += 1
                continue

        bad = False

        if "BatchEvalPython" in plan:
            bad = True
            notes.append("row-at-a-time Python UDF (BatchEvalPython)")
        arrow = bool(re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan))
        if arrow and key not in ARROW_OK:
            bad = True
            notes.append("unexpected Python boundary in relational operator")

        if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan) and key not in CARTESIAN_OK:
            bad = True
            notes.append("undeclared cartesian/BNLJ")

        if key == "a1_scan_parquet":
            m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
            ncols = len(m.group(1).split(",")) if m else -1
            notes.append(f"ReadSchema cols={ncols}")
            if ncols < 0 or ncols > 4:
                bad = True
                notes.append("column pruning did not reach the scan")
        if key == "a2_scan_filter_pushdown":
            if not re.search(r"PushedFilters: \[[^\]]", plan):
                bad = True
                notes.append("no PushedFilters at parquet scan")
        if key == "c5_join_broadcast" and "BroadcastHashJoin" not in plan:
            bad = True
            notes.append("broadcast join not broadcast")

        # (codegen spans only appear in AQE *final* plans, i.e. after an
        # action; pre-execution plans here always omit them — not a signal)

        joins = "+".join(sorted(set(re.findall(r"(\w*?(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct))", plan))))
        nex = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
        budget = PLAN_BUDGET.get(key)
        if budget is not None and nex > budget:
            bad = True
            notes.append(
                f"exchange budget regression: {nex} > recorded {budget}"
            )
        # A localCheckpoint truncates lineage to a LogicalRDD ("Scan
        # ExistingRDD" in the physical plan), hiding every exchange the
        # operator pays upstream of the checkpoint — annotate so a recorded
        # budget of N is read as "post-checkpoint only" and a regression
        # ABOVE the checkpoint is known to be invisible to this gate
        # (ADVICE round 4). Detection is mechanical from the plan string,
        # so the annotation can never go stale against the code.
        if "Scan ExistingRDD" in plan:
            if key in ITERATIVE_TRUNCATION:
                notes.append(
                    "iterative lineage truncation (per-round localCheckpoint"
                    " — Pregel discipline; plan shows final round + serving)"
                )
            else:
                notes.append("post-checkpoint plan only (upstream exchanges hidden by localCheckpoint)")
        info = f"exchanges={nex}" + (f" joins={joins}" if joins else "")
        if notes:
            info += " | " + "; ".join(notes)
        if bad:
            violations += 1
            rows.append((key, "VIOLATION", info))
        else:
            rows.append((key, "ok", info))

    lines = [
        "# EXPLAIN audit — physical-plan invariants per operator",
        "",
        f"Generated by `tools/explain_audit.py` at sf_dir=`{SF_DIR}`. Checks:",
        "no `BatchEvalPython` anywhere; Arrow-Python only in declared UDF groups;",
        "cartesian/BNLJ only where declared; scan pruning/pushdown on `a1`/`a2`;",
        "`c5` broadcasts. `exchanges=` counts shuffle exchanges in the executed plan.",
        "",
        "| key | verdict | plan notes |",
        "| --- | --- | --- |",
    ]
    for key, verdict, info in rows:
        lines.append(f"| `{key}` | {verdict} | {info} |")
    lines.append("")
    lines.append(f"**{sum(1 for r in rows if r[1] == 'ok')} ok, "
                 f"{violations} violations, {sum(1 for r in rows if r[1] == 'skip')} skipped** "
                 f"of {len(rows)} audited.")
    if len(keys) == len(QUERIES):
        print("\n".join(lines[-3:]))
    else:  # subset run: show every audited row (the tail alone hides notes)
        print("\n".join(f"| `{k}` | {v} | {i} |" for k, v, i in rows))
        print(lines[-1])
    if len(keys) == len(QUERIES):  # subset runs must not clobber the full report
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN_AUDIT.md"
        )
        with open(out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {out}")
        if "--update-budget" in sys.argv:
            import json

            counts = {}
            for key, verdict, info in rows:
                m = re.match(r"exchanges=(\d+)", info)
                if verdict == "ok" and m:
                    counts[key] = int(m.group(1))
                elif verdict == "VIOLATION" and key in PLAN_BUDGET:
                    # an over-budget key keeps its OLD budget: dropping it
                    # would silently disable its regression gate. To accept
                    # an intentional plan change, delete the stale entry
                    # from plan_budget.json and re-run --update-budget.
                    counts[key] = PLAN_BUDGET[key]
            with open(_BUDGET_PATH, "w") as fh:
                json.dump(counts, fh, indent=0, sort_keys=True)
            print(f"recorded {len(counts)} exchange budgets -> {_BUDGET_PATH}")
    return violations


if __name__ == "__main__":
    ks = [k for k in sys.argv[1:] if not k.startswith("-")] or sorted(QUERIES)
    sys.exit(1 if audit(ks) else 0)
