"""ANN index persistence (round 7): the persisted-index probe paths (l62
IVF, l63 PQ) must (a) return exactly the rebuild paths' answers and (b)
carry NO training stage in their plans — build-once → load → probe is the
contract. Plus unit tests for the ensure_index build-once/staleness
lifecycle helper."""

import json
import os
import re

from tests.conftest import SF_SMOKE


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df):
    return df._jdf.queryExecution().toString()


def test_l62_equals_l12_rebuild(spark):
    """The persisted IVF index answers the probe identically to the
    per-query rebuild path — pair-for-pair."""
    from dask_pipes_spark.operators.llm_ext import (
        l12_ivf_topk,
        l62_ann_index_persist,
    )

    a = _rowset(l12_ivf_topk(spark, SF_SMOKE))
    b = _rowset(l62_ann_index_persist(spark, SF_SMOKE))
    assert a, "probe result must be non-empty at sf0.001"
    assert a == b


def test_l62_probe_plan_has_no_training(spark):
    """The l62 plan must be pure probe: no centroid training (posexplode /
    decimal-mean aggregation) and no embeddings scan at all — both the
    codebook and the query vectors come from the persisted index."""
    from dask_pipes_spark.operators.llm_ext import l62_ann_index_persist

    plan = _plan(l62_ann_index_persist(spark, SF_SMOKE))
    assert "posexplode" not in plan
    assert "decimal(28,12)" not in plan.lower()
    assert plan.count("dps_l62_ivf") >= 1, "probe must scan the persisted index"
    assert not re.search(r"embeddings\.parquet", plan), (
        "probe must not rescan the corpus"
    )


def test_l63_equals_l55_rebuild(spark):
    """The persisted PQ index (codebooks + codes) answers the ADC probe
    identically to the train-and-encode-per-query path."""
    from dask_pipes_spark.operators.vectors import (
        l55_pq_topk,
        l63_pq_index_persist,
    )

    a = _rowset(l55_pq_topk(spark, SF_SMOKE))
    b = _rowset(l63_pq_index_persist(spark, SF_SMOKE))
    assert a, "probe result must be non-empty at sf0.001"
    assert a == b


def test_l63_probe_plan_has_no_lloyd(spark):
    """The l63 plan must contain no Lloyd stage (the rebuild path's
    localCheckpoint surfaces as an ExistingRDD scan) and read embeddings
    exactly once — the query slice; the corpus representation is the
    persisted codes table."""
    from dask_pipes_spark.operators.vectors import l63_pq_index_persist

    plan = _plan(l63_pq_index_persist(spark, SF_SMOKE))
    assert "ExistingRDD" not in plan, "Lloyd checkpoint leaked into the probe"
    assert plan.count("dps_l63_pq") >= 1, "probe must scan the persisted index"
    assert len(re.findall(r"embeddings\.parquet", plan)) == 1


def test_ensure_index_builds_once_and_detects_staleness(tmp_path):
    """Lifecycle contract: fresh manifest → no rebuild; source mtime/size
    change → rebuild; version bump → rebuild; failed build → no manifest →
    next call rebuilds."""
    from dask_pipes_spark.session import ensure_index

    src = tmp_path / "corpus.parquet"
    src.write_bytes(b"v1")
    idx = str(tmp_path / "index")
    calls = []

    def build(d):
        os.makedirs(d, exist_ok=True)
        calls.append(d)

    ensure_index(idx, str(src), "v1", build)
    ensure_index(idx, str(src), "v1", build)
    assert len(calls) == 1, "fresh index must not rebuild"

    # staleness: rewrite the source (size + mtime change)
    src.write_bytes(b"v2-bigger")
    ensure_index(idx, str(src), "v1", build)
    assert len(calls) == 2, "source change must trigger rebuild"

    # format version bump
    ensure_index(idx, str(src), "v2", build)
    assert len(calls) == 3, "version bump must trigger rebuild"
    ensure_index(idx, str(src), "v2", build)
    assert len(calls) == 3

    # torn build: failure before manifest write → next call rebuilds
    def failing(d):
        calls.append(d)
        raise RuntimeError("mid-build crash")

    src.write_bytes(b"v3")
    try:
        ensure_index(idx, str(src), "v2", failing)
    except RuntimeError:
        pass
    manifest = json.load(open(os.path.join(idx, "MANIFEST.json")))
    from dask_pipes_spark.session import dataset_fingerprint

    assert manifest["fingerprint"] != dataset_fingerprint(str(src)), (
        "crashed build must not look fresh"
    )
    ensure_index(idx, str(src), "v2", build)
    assert len(calls) == 5, "post-crash call must rebuild"
