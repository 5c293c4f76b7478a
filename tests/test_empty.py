"""Short-input robustness: zero-row AND one-row fixtures across the whole
registry (sweep tool: tools/empty_sweep.py [--rows N]).

At 100 TB, empty inputs are routine — a filter matching nothing, a new
partition, a cold-start day — and 1-row groups are *guaranteed* (some key
always has exactly one member), which is where /(n-1)-style variance
denominators divide by zero under ANSI mode. Round-2 zero-row contracts:
schema-explicit read-back (a3/a8), zero-row-group layout scoring (a15),
empty IVF codebook (l12), identity fit params + unseen-code vocab
(p1/p2/p14 via pipeline.py), NULL-not-error drift z (p14), zero-sum
observe metrics (p6), empty-in→empty-out ml interop (p7/p11). Round-3
one-row contracts (all fixed with F.try_divide — NULL on /0, exactly
DuckDB's x/0 semantics, so every oracle stays in parity): d6/d11/d23/d27/
d29/d33/e21 moment denominators, d45 zero bin width, x30 zero SS_total."""

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

ONCE_FAILED_ONE_ROW = [
    "d6_group_stats",
    "d11_corr_cov",
    "d23_regr_ols",
    "d27_skew_kurt",
    "d29_product_sem",
    "d33_corr_matrix",
    "d45_histogram_quantile",
    "e21_group_transform",
    "x30_seasonal_r2",
]


@pytest.fixture(scope="module")
def empty_dir(spark):
    return make_empty_dir(spark, "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def one_row_dir(spark):
    return make_empty_dir(spark, "/root/testdata/sf0.001", rows=1)


@pytest.mark.parametrize("key", ONCE_FAILED)
def test_empty_input_does_not_crash(spark, empty_dir, key):
    from dask_pipes_spark.registry import QUERIES

    assert key not in SKIP
    rows = QUERIES[key](spark, empty_dir).collect()
    assert isinstance(rows, list)  # executed; row content is key-specific


@pytest.mark.parametrize("key", ONCE_FAILED_ONE_ROW)
def test_one_row_input_does_not_crash(spark, one_row_dir, key):
    from dask_pipes_spark.registry import QUERIES

    assert key not in SKIP
    rows = QUERIES[key](spark, one_row_dir).collect()
    assert isinstance(rows, list)


def test_full_registry_one_row_sweep(spark, one_row_dir):
    """EVERY batch operator must survive 1-row fixtures — the permanent
    gate the round-2 verdict asked for (sequence/slice/variance guards
    regression-locked), not just the once-failed list."""
    from dask_pipes_spark.registry import QUERIES

    failed = []
    for key in sorted(QUERIES):
        if key in SKIP:
            continue
        try:
            QUERIES[key](spark, one_row_dir).collect()
        except Exception as exc:  # noqa: BLE001
            failed.append(f"{key}: {str(exc).splitlines()[0][:120]}")
    assert not failed, failed


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
