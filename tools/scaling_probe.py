"""Measure wall-time scaling of representative operators across the three
fixture scale factors and write SCALING.md.

The point: correctness runs at toy SF, but the *scale argument* needs
evidence that runtime grows ~linearly with data volume while the plan shape
stays fixed (SF-invariance, see SCALE.md). A 100× data step (sf0.001 →
sf0.1) that costs ~100× time on a fixed-size local pool is the local proxy
for "add executors, keep wall time" on a cluster.

Method: one warm session; per (operator, SF): one untimed warmup run (also
captures the row count), then the median of 3 timed runs writing to the
`noop` sink — full distributed execution without driver-side result
serialization, which would otherwise dominate for large row-level outputs
and measure py4j, not the engine. Fixed ops chosen to cover the main
physical patterns: hash aggregate, shuffle join, window sort, global sort,
text hash-dedup, narrow per-row scoring.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from dask_pipes_spark.session import get_session  # noqa: E402

SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]

# synthesized 10x step (tools/make_sf.py) — included when present, giving a
# 1000x total span for the SF-invariance argument
import os  # noqa: E402

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata")
_SF1 = os.path.join(_BENCH, "sf1")
if os.path.exists(os.path.join(_SF1, "lineitem.parquet")):
    SFS.append(("sf1", _SF1))
_SF10 = os.path.join(_BENCH, "sf10")
if os.path.exists(os.path.join(_SF10, "lineitem.parquet")):
    SFS.append(("sf10", _SF10))

# sf10 (60M-row lineitem, 10000x sf0.001) runs for the relational families
# + the scale-designed dedup ops, whose 100 TB claim rides furthest on
# extrapolation (round-3 verdict item 4). Round 8 adds the LSH tier
# (l2/l18/l32) — the north-star workload carries its own sf10 rows
# instead of leaning on the composed q_dedup_chain measurement
# (r7 verdict item 5); needs SPARK_GRAFT_DRIVER_MEM=64g.
SF10_OPS = {
    "d3_groupby_multi",
    "c1_join_inner",
    "e1_row_number",
    "f1_sort_global",
    "l1_exact_dedup",
    "l24_repetition_ratio",
    "l2_minhash_lsh",
    "l18_dup_components",
    "l32_dup_ngram_coverage",
    "l48_incremental_dedup",
    "l49_semdedup_prune",
}

#: (key, physical pattern it probes)
OPS = [
    ("d3_groupby_multi", "partial+final hash aggregate"),
    ("c1_join_inner", "shuffle hash/SMJ join"),
    ("e1_row_number", "keyed window (shuffle+sort)"),
    ("f1_sort_global", "range-partitioned global sort"),
    ("l1_exact_dedup", "hash groupBy over text digests"),
    ("l24_repetition_ratio", "narrow per-row array ops + agg"),
    # LLM-curation centerpiece ops (round-3 verdict ask): the 100 TB story
    # is dedup, so the dedup family carries its own measured curves
    ("l2_minhash_lsh", "MinHash sigs + banded LSH equi-join"),
    ("l18_dup_components", "iterative connected components"),
    ("l32_dup_ngram_coverage", "5-gram grain coverage join"),
    ("l48_incremental_dedup", "batch-vs-digest-state incremental dedup"),
    ("l49_semdedup_prune", "centroid-bucketed semantic dedup"),
]


def _exchange_count(df) -> int:
    """Number of Exchange operators in the executed plan — recorded per SF
    so the table can assert plan-shape invariance, not just wall time."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    import re

    return len(re.findall(r"\bExchange\b", plan))


def main() -> int:
    spark = get_session("scaling_probe", cpus=32)
    from dask_pipes_spark import operators  # noqa: F401
    from dask_pipes_spark.registry import QUERIES

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    exchanges: dict[str, dict[str, int]] = {}
    for key, _ in OPS:
        results[key], rows[key], exchanges[key] = {}, {}, {}
        for sf_name, sf_dir in SFS:
            if sf_name == "sf10" and key not in SF10_OPS:
                continue
            fn = QUERIES[key]
            warm = fn(spark, sf_dir)
            rows[key][sf_name] = len(warm.collect())  # warmup
            exchanges[key][sf_name] = _exchange_count(warm)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            results[key][sf_name] = statistics.median(times)
            print(f"{key} {sf_name}: {results[key][sf_name]:.3f}s", flush=True)

    sf_names = [n for n, _ in SFS]
    top = sf_names[-1]
    span = 10 ** (len(sf_names) - 1)
    lines = [
        "# SCALING — measured wall-time vs data volume (local[32])",
        "",
        "Generated by `tools/scaling_probe.py` (median of 3 warm runs,",
        "`noop`-sink writes: full distributed execution, no driver-side",
        "result serialization). Data steps are 10× each"
        f" ({' → '.join(sf_names)});",
        f"a fixed 32-thread pool absorbing a {span}× data span in ≲{span}× time,",
        "with the audited plan shape unchanged (EXPLAIN_AUDIT.md), is the",
        "local evidence for SF-invariant plans — on a cluster the same step",
        "is absorbed by executors, not wall time."
        + (
            " sf1/sf10 are synthesized by `tools/make_sf.py`;"
            " sf10 runs for the SF10_OPS subset (— elsewhere)."
            if top.startswith("sf1")
            else ""
        ),
        "",
        "| operator | pattern | " + " | ".join(sf_names)
        + f" | t(max SF)/t({sf_names[0]}) | exchanges |",
        "| --- | --- |" + " --- |" * (len(sf_names) + 2),
    ]
    for key, pattern in OPS:
        r = results[key]
        key_top = [n for n in sf_names if n in r][-1]
        ratio = r[key_top] / r[sf_names[0]]
        cells = " | ".join(
            f"{r[n]:.3f}s" if n in r else "—" for n in sf_names
        )
        ex = exchanges[key]
        exs = sorted(set(ex.values()))
        ex_cell = (
            str(exs[0]) + " (all SFs)"
            if len(exs) == 1
            else "/".join(str(ex[n]) for n in sf_names if n in ex)
        )
        lines.append(
            f"| `{key}` | {pattern} | {cells} | {ratio:.1f}× | {ex_cell} |"
        )
    lines += [
        "",
        "Sub-linear ratios mean fixed per-query overhead (planning, task",
        "launch) still dominates at these sizes — the marginal cost of data",
        "is below linear, which is the headroom the 100 TB design relies on.",
        "",
    ]
    # preserve ALL hand-written analysis sections: everything from the
    # first "## " heading onward (the auto-generated part is only the
    # header + table + the sub-linear paragraph above)
    try:
        prev = open("SCALING.md").read()
        idx = prev.find("\n## ")
        if idx >= 0:
            lines.append(prev[idx + 1:].rstrip())
            lines.append("")
    except FileNotFoundError:
        pass
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
