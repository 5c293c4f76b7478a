"""Round-12 ANN serving probe — per-query economics of the pruned IVFADC
probe across SFs, l81 (FIXED K=10 label coarse quantizer) vs l84 (the
data-sized K=⌈√N⌉ k-means quantizer composed into the serving lifecycle).

Two confounders the r11 verdict asked to separate (items 1 and 4):

- the FIXTURE's query count grows ∝ N (``vec_id % 100 == 0``), so l81's
  sf10 "787.6 s" conflates corpus growth with query-batch growth;
- l81's constant K=10 makes per-query candidates a constant ~nprobe/K of
  the corpus, so TOTAL batch time grows ~N² across SFs.

This probe publishes, per SF and per index family:

- the steady-state FULL fixture batch (median of ``--runs`` timed runs,
  noop-sink execution — no driver serialization in the measurement);
- a FIXED-size query shard (default 1,000 queries: ``vec_id % M == 0``
  with M = N // 1000) and its **per-query ms** — the number a serving
  fleet actually sizes against.

Build (index staging) is timed separately and runs once per (SF, family)
via ensure_index's cache. sf10 l81 full-batch is skipped by default (the
r11 measurement stands at 787.6 s); pass --full-l81-sf10 to re-run it.

Run:  SPARK_GRAFT_DRIVER_MEM=64g python tools/ann_probe_r12.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dask_pipes_spark.session import get_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BENCH = os.path.join(REPO, ".benchdata")

SFS = [("sf0.1", "/root/testdata/sf0.1")]
for _tag in ("sf1", "sf10"):
    _d = os.path.join(_BENCH, _tag)
    if os.path.exists(os.path.join(_d, "embeddings.parquet")):
        SFS.append((_tag, _d))

FIXED_QUERIES = 1000


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(build_df, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _noop(build_df())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _l81_serve(spark, sf_dir: str, idx: str, qpred):
    """l81's serving tail with a parameterized query slice (mirrors the
    key body — fixed-K label quantizer, nprobe=3)."""
    from dask_pipes_spark.operators.llm_ext import (
        _ivf_corpus_and_centroids,
        ivf_assign,
    )
    from dask_pipes_spark.operators.vectors import (
        _L81_ASSIGN_SCHEMA,
        _RIVF_CENT_SCHEMA,
        _RIVF_CENTS_SCHEMA,
        _RIVF_CODES_SCHEMA,
        _pq_pruned_probe_topk,
        _pq_subspaces,
    )
    from dask_pipes_spark.session import head_bys

    bys = head_bys(idx)
    head_a = [b for b in bys if b.startswith("assignments-")][-1]
    head_c = [b for b in bys if b.startswith("codes-")][-1]
    cent_rows = (
        spark.read.schema(_RIVF_CENT_SCHEMA)
        .parquet(os.path.join(idx, "centroids"))
        .collect()
    )
    cents = spark.read.schema(_RIVF_CENTS_SCHEMA).parquet(
        os.path.join(idx, "codebooks")
    )
    assignments = spark.read.schema(_L81_ASSIGN_SCHEMA).parquet(
        os.path.join(idx, head_a)
    )
    codes = spark.read.schema(_RIVF_CODES_SCHEMA).parquet(
        os.path.join(idx, head_c)
    )
    qvecs, _ = _ivf_corpus_and_centroids(
        spark,
        sf_dir,
        pred=qpred
        & ((F.col("vec_id") % 9 == 5) | (F.col("vec_id") % 11 != 3)),
    )
    probes = ivf_assign(qvecs, cent_rows, nprobe=3).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    qsub = _pq_subspaces(qvecs).select("vec_id", "s", "sv")
    return _pq_pruned_probe_topk(qsub, probes, assignments, cents, codes)


if __name__ == "__main__":
    full_l81_sf10 = "--full-l81-sf10" in sys.argv
    runs = 3
    spark = get_session("ann_probe_r12")
    spark.sparkContext.setLogLevel("ERROR")

    from dask_pipes_spark.operators.vectors import (
        _serve_kivfpq,
        l81_ivfpq_pruned_checkpoint,
        l84_kmeans_ivfpq_serving,
    )
    from dask_pipes_spark.session import ensure_index, scratch_path

    out: dict = {"fixed_queries": FIXED_QUERIES, "rows": []}
    for tag, sf_dir in SFS:
        n = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .count()
        )
        m = max(1, n // FIXED_QUERIES)
        shard_pred = F.col("vec_id") % m == 0

        for fam, key_fn in (
            ("l81_fixedK", l81_ivfpq_pruned_checkpoint),
            ("l84_sqrtK", l84_kmeans_ivfpq_serving),
        ):
            # build (ensure_index staging) — once, timed separately
            t0 = time.perf_counter()
            df = key_fn(spark, sf_dir)
            _noop(df)
            build_and_first = time.perf_counter() - t0

            row = {
                "sf": tag,
                "family": fam,
                "n_vectors": n,
                "build_and_first_probe_s": round(build_and_first, 3),
            }

            # steady full fixture batch
            if fam == "l81_fixedK" and tag == "sf10" and not full_l81_sf10:
                row["full_batch_s"] = None
                row["full_batch_note"] = (
                    "skipped (r11 measured 787.6 s; --full-l81-sf10 re-runs)"
                )
            else:
                row["full_batch_s"] = round(
                    _timed(lambda: key_fn(spark, sf_dir), runs), 3
                )

            # fixed-size query shard
            if fam == "l84_sqrtK":
                idx = scratch_path(f"dps_l84_kivfpq_{tag}")
                shard_fn = lambda: _serve_kivfpq(  # noqa: E731
                    spark, sf_dir, idx, qpred=shard_pred
                )
            else:
                idx = scratch_path(f"dps_l81_ivfpq_{tag}")
                shard_fn = lambda: _l81_serve(  # noqa: E731
                    spark, sf_dir, idx, qpred=shard_pred
                )
            # shard size from the base table (running the probe just to
            # count its queries would cost a full un-timed probe)
            nq = (
                spark.read.parquet(
                    os.path.join(sf_dir, "embeddings.parquet")
                )
                .filter(
                    shard_pred
                    & (
                        (F.col("vec_id") % 9 == 5)
                        | (F.col("vec_id") % 11 != 3)
                    )
                )
                .count()
            )
            shard_runs = 1 if (fam == "l81_fixedK" and tag == "sf10") else runs
            shard_s = _timed(shard_fn, shard_runs)
            row["shard_queries"] = nq
            row["shard_s"] = round(shard_s, 3)
            row["per_query_ms"] = round(1000.0 * shard_s / max(1, nq), 2)
            out["rows"].append(row)
            print(json.dumps(row))

    path = os.path.join(REPO, "ANN_PROBE_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
