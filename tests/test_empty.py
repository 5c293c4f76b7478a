"""Empty-input robustness: the ten operators that once crashed on zero-row
fixtures must stay clean (full 314-key sweep: tools/empty_sweep.py).

At 100 TB, empty inputs are routine — a filter matching nothing, a new
partition, a cold-start day. The contracts fixed here: schema-explicit
read-back (a3/a8), zero-row-group layout scoring (a15), empty IVF codebook
(l12), identity fit params + unseen-code vocab (p1/p2/p14 via pipeline.py),
NULL-not-error drift z (p14), zero-sum observe metrics (p6), and
empty-in→empty-out ml interop (p7/p11)."""

import pytest

from tools.empty_sweep import SKIP, make_empty_dir

ONCE_FAILED = [
    "a3_sink_parquet_roundtrip",
    "a8_partition_pruned_scan",
    "a15_sorted_write_zonemap",
    "l12_ivf_topk",
    "p1_pipeline_fit_transform",
    "p2_fitted_preprocess",
    "p6_observe_metrics",
    "p7_ml_pipeline_interop",
    "p11_hashing_tfidf",
    "p14_drift_monitor",
]


@pytest.fixture(scope="module")
def empty_dir(spark):
    return make_empty_dir(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize("key", ONCE_FAILED)
def test_empty_input_does_not_crash(spark, empty_dir, key):
    from dask_pipes_spark.registry import QUERIES

    assert key not in SKIP
    rows = QUERIES[key](spark, empty_dir).collect()
    assert isinstance(rows, list)  # executed; row content is key-specific


def test_fit_on_empty_is_identity_scaling(spark, empty_dir):
    """StandardScaler fitted on nothing must pass values through (mean 0,
    std 1) when transforming real data — the cold-start contract."""
    from dask_pipes_spark.pipeline import StandardScaler
    from dask_pipes_spark.session import load

    o = load(spark, "/root/testdata/sf0.001", "orders")
    scaler = StandardScaler(["o_totalprice"])
    params = scaler.fit(o.limit(0))
    assert params["o_totalprice"] == [0.0, 1.0]
    out = scaler.transform(o.limit(5), params).collect()
    for r in out:
        assert abs(r.o_totalprice_z - round(r.o_totalprice, 6)) < 1e-6
