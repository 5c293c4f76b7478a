"""Behavioral assertions the DuckDB oracle can't express — sortedness of
declared-weak keys, sample bounds, sketch tolerance (SURVEY §5.4)."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _vals(df, col):
    return [r[col] for r in df.collect()]


def test_f1_globally_sorted(spark, registry):
    queries, _ = registry
    out = queries["f1_sort_global"](spark, SF_SMOKE).collect()
    keys = [(-r.l_extendedprice, r.l_orderkey, r.l_linenumber) for r in out]
    assert keys == sorted(keys)


def test_f4_range_partitions_are_globally_ordered(spark, registry):
    """set_index analog: the verdict frame must prove valid Dask
    'divisions' — every partition internally sorted AND partition bounds
    monotonic — and account for every input row."""
    queries, _ = registry
    row = queries["f4_range_partition_sort"](spark, SF_SMOKE).collect()[0]
    assert row.sorted_within_partitions is True
    assert row.partition_bounds_monotonic is True
    expected = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert row.n_rows == expected


def test_f5_sample_bounds_and_reproducible(spark, registry):
    queries, _ = registry
    a = queries["f5_sample"](spark, SF_SMOKE)
    b = queries["f5_sample"](spark, SF_SMOKE)
    total = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    n = a.count()
    assert 0.05 * total < n < 0.15 * total  # fraction=0.1, generous binomial bound
    ka = sorted((r.l_orderkey, r.l_linenumber) for r in a.collect())
    kb = sorted((r.l_orderkey, r.l_linenumber) for r in b.collect())
    assert ka == kb  # same seed → same rows


def test_d5_approx_within_rsd(spark, registry):
    """The emitted verdict column IS the accuracy check (round-4 contract):
    the operator computes |approx - exact| <= 10% internally and the oracle
    pins it TRUE, so a False here is both a test and a parity failure."""
    queries, _ = registry
    row = queries["d5_approx_count_distinct"](spark, SF_SMOKE).collect()[0]
    assert row.exact_parts > 0
    assert row.within_10pct is True


def test_c10_range_join_matches_bnlj(spark, registry):
    """Bucketed range join must equal the naive theta-join it replaces."""
    queries, _ = registry
    from dask_pipes_spark.session import load_tables

    t = load_tables(spark, SF_SMOKE, ("supplier", "customer"))
    naive = (
        t["supplier"]
        .join(
            t["customer"],
            F.col("c_acctbal").between(F.col("s_acctbal") - 10, F.col("s_acctbal") + 10),
        )
        .select("s_suppkey", "c_custkey")
    )
    bucketed = queries["c10_join_range"](spark, SF_SMOKE).select("s_suppkey", "c_custkey")
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, naive.collect()))


def test_salted_join_equals_plain_join(spark):
    """salted_join is a pure physical rewrite — rowset identical to df.join."""
    from dask_pipes_spark.operators.joins import salted_join
    from dask_pipes_spark.session import load_tables
    from pyspark.sql import functions as F

    t = load_tables(spark, SF_SMOKE, ("orders", "lineitem"))
    dim = t["orders"].select("o_orderkey", "o_orderpriority")
    plain = t["lineitem"].join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
    salted = salted_join(t["lineitem"], dim, F.col("l_orderkey"), F.col("o_orderkey"), salt=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_f6_stratified_sample_fractions_and_reproducibility(spark, registry):
    queries, _ = registry
    out = queries["f6_stratified_sample"](spark, SF_SMOKE)
    src = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    totals = {r.l_returnflag: r.c for r in src.groupBy("l_returnflag").count().withColumnRenamed("count", "c").collect()}
    got = {r.l_returnflag: r.c for r in out.groupBy("l_returnflag").count().withColumnRenamed("count", "c").collect()}
    import math
    for flag, frac in (("A", 0.05), ("N", 0.2), ("R", 0.1)):
        n, k = totals[flag], got.get(flag, 0)
        # 5-sigma binomial bound
        assert abs(k - n * frac) <= 5 * math.sqrt(n * frac * (1 - frac)) + 1, (flag, k, n)
    again = queries["f6_stratified_sample"](spark, SF_SMOKE)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_map_overlap_invariant_to_partition_count(spark):
    """Boundary duplication must make the result independent of where the
    range partitioner cuts — 3 and 8 partitions give identical rolling means."""
    import pandas as pd
    from dask_pipes_spark.operators.udfs import map_overlap
    from dask_pipes_spark.session import load

    e = load(spark, SF_SMOKE, "events").select("event_id", "ts", "value")

    def roll(pdf):
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "roll_avg": pdf["value"].rolling(5, min_periods=1).mean().round(4),
            }
        )

    a = map_overlap(e, ("ts", "event_id"), 4, roll, "event_id bigint, roll_avg double", npartitions=3)
    b = map_overlap(e, ("ts", "event_id"), 4, roll, "event_id bigint, roll_avg double", npartitions=8)
    assert a.count() == e.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_f7_random_split_disjoint_exhaustive_reproducible(spark):
    """Content-hash split: partitions the table exactly, reproduces row-by-row
    across independent plans (the property rand() cannot give), ~80/20."""
    from pyspark.sql import functions as F
    from dask_pipes_spark.session import load

    def tag(df, col):
        bucket = F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit(42)), F.lit(100))
        return df.withColumn(col, F.when(bucket < 80, "train").otherwise("test"))

    li = load(spark, SF_SMOKE, "lineitem")
    tagged = tag(li, "split")
    counts = {r.split: r.c for r in tagged.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts["train"] + counts["test"] == li.count()
    again = tag(li.repartition(3), "split2").select("l_orderkey", "l_linenumber", "split2")
    joined = tagged.join(again, ["l_orderkey", "l_linenumber"]).filter(
        F.col("split") != F.col("split2")
    )
    assert joined.count() == 0
    # rough 80/20 shape (5-sigma binomial)
    import math
    n = li.count()
    assert abs(counts["train"] - 0.8 * n) <= 5 * math.sqrt(n * 0.16) + 1


def test_e13_ewm_matches_local_pandas_and_is_partition_invariant(spark, registry):
    import pandas as pd
    from pyspark.sql import functions as F
    from dask_pipes_spark.session import load

    queries, _ = registry
    out = queries["e13_ewm"](spark, SF_SMOKE).collect()
    got = {(r.user_id, r.event_id): r.ewm_value for r in out}

    # local pandas recompute for the busiest user
    ev = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts", "value").toPandas()
    busiest = ev["user_id"].value_counts().index[0]
    sub = ev[ev["user_id"] == busiest].sort_values(["ts", "event_id"], kind="mergesort")
    want = sub["value"].ewm(alpha=0.3, adjust=True).mean().round(4)
    for eid, w in zip(sub["event_id"], want):
        assert abs(got[(busiest, eid)] - w) < 1e-9

    # re-execution determinism: a second independent run agrees exactly
    out2 = {(r.user_id, r.event_id): r.ewm_value for r in queries["e13_ewm"](spark, SF_SMOKE).collect()}
    assert got == out2


def test_d20_approx_quantile_within_bound(spark, registry):
    """percentile_approx(accuracy=10000) must land within the q ∓ 0.001
    exact-value bounds — emitted as per-quantile verdict columns (round-4
    contract; the oracle pins them TRUE)."""
    queries, _ = registry
    rows = queries["d20_approx_quantile"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
        assert r.exact_p50 is not None


# --- property test: time-weighted interpolation vs pandas ------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # key
        st.integers(min_value=0, max_value=3600),       # ts offset seconds
        st.one_of(st.none(), st.integers(min_value=0, max_value=100)),  # value
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_series)
def test_interpolate_matches_pandas(spark, rows):
    import datetime as dt

    import pandas as pd

    from dask_pipes_spark.operators.windows import interpolate_time_weighted

    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "rid": range(len(rows)),
            "k": [r[0] for r in rows],
            "ts": [base + dt.timedelta(seconds=r[1]) for r in rows],
            "v": [None if r[2] is None else float(r[2]) for r in rows],
        }
    )
    # unique (k, ts): duplicate timestamps make pandas' index interpolation
    # ill-defined; keep the max-rid row per (k, ts)
    pdf = pdf.sort_values("rid").groupby(["k", "ts"], as_index=False).last()
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["k"] = pdf["k"].astype("int64")
    pdf["rid"] = pdf["rid"].astype("int64")
    pdf["v"] = pdf["v"].astype("float64")
    pdf = pdf[["rid", "k", "ts", "v"]]  # createDataFrame maps positionally

    schema = "rid long, k long, ts timestamp_ntz, v double"
    sdf = (
        spark.createDataFrame(pdf, schema)
        if len(pdf)
        else spark.createDataFrame([], schema)
    )
    got = {
        r.rid: r.v_interp
        for r in interpolate_time_weighted(
            sdf, key="k", ts="ts", order=("ts", "rid"), value="v"
        ).collect()
    }

    want: dict[int, float | None] = {}
    for _, grp in pdf.groupby("k"):
        g = grp.sort_values("ts").set_index("ts")
        filled = g["v"].interpolate(method="index", limit_direction="both")
        for rid, val in zip(g["rid"], filled):
            want[int(rid)] = None if pd.isna(val) else float(val)

    assert set(got) == set(want)
    for rid in got:
        a, b = got[rid], want[rid]
        if a is None or b is None:
            assert a == b, f"rid={rid}: {a} != {b}"
        else:
            assert abs(a - b) < 1e-9, f"rid={rid}: {a} != {b}"


def test_f12_sample_replace_bounds_and_reproducible(spark, registry):
    """Poisson with-replacement sample: seeded draw is reproducible, size is
    within binomial-ish bounds, and duplicates actually occur (fraction
    0.2 over 6k rows ~> a few multi-hit rows with overwhelming odds)."""
    queries, _ = registry
    a = queries["f12_sample_replace"](spark, SF_SMOKE)
    b = queries["f12_sample_replace"](spark, SF_SMOKE)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    n = len(rows_a)
    assert 900 <= n <= 1500  # 6000 * 0.2 = 1200 expected
    assert len(set(rows_a)) < n  # replacement produced duplicates


def test_d38_hll_cumulative_accuracy(spark, registry):
    """Running sketch-union estimates must track the exact cumulative
    distinct count within 5% — the operator now computes the exact
    first-seen rewrite itself and emits the verdict (round-4 contract;
    the oracle pins it TRUE), so this asserts every row's verdict plus
    monotonicity of the exact counts."""
    queries, _ = registry
    rows = queries["d38_hll_cumulative"](spark, SF_SMOKE).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert r.within_5pct is True, r
        by_type.setdefault(r.event_type, []).append((r.day, r.exact_cum_users))
    for seq in by_type.values():
        seq.sort()
        counts = [c for _, c in seq]
        assert counts == sorted(counts)  # cumulative ⇒ nondecreasing


def test_c22_hint_produces_shuffled_hash_join(spark, registry):
    """The shuffle_hash hint must pin the physical strategy (no sort
    phases), not just return correct rows."""
    queries, _ = registry
    df = queries["c22_join_hint_shuffle_hash"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan


def test_f15_freq_items_superset_of_true_heavy_hitters(spark, registry):
    """Misra-Gries guarantee: every year with true frequency > support
    appears in the sketch output."""
    queries, _ = registry
    (row,) = queries["f15_freq_items"](spark, SF_SMOKE).collect()
    got = {int(x) for x in row.frequent_years.split(",") if x}
    from dask_pipes_spark.session import load

    li = load(spark, SF_SMOKE, "lineitem")
    n = li.count()
    exact = {
        r.y
        for r in li.select(F.year("l_shipdate").alias("y")).groupBy("y").count().collect()
        if r["count"] / n > 0.1
    }
    assert exact and exact <= got


def test_c23_bloom_filter_injected(spark, registry):
    """The runtime Bloom filter must actually appear in the optimized plan:
    a BloomFilterAggregate on the filtered dim side feeding a might_contain
    probe on the fact scan side."""
    queries, _ = registry
    df = queries["c23_bloom_runtime_filter"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "bloomfilter" in plan or "might_contain" in plan, plan[:2000]
    assert df.count() > 0


def test_f16_zorder_buckets_are_tight_rectangles(spark, registry):
    """The z-order locality guarantee: every curve bucket spans at most a
    quarter of each dimension's 1024-wide domain (a lexicographic sort
    would leave the trailing dimension spanning the full domain)."""
    queries, _ = registry
    rows = queries["f16_zorder_layout"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.max_x - r.min_x <= 512, r
        assert r.max_y - r.min_y <= 512, r


def test_g12_checksum_localizes_a_diff(spark, registry):
    """Perturbing ONE row must change exactly that row's bucket — the
    Merkle-level localization property the operator exists for."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    queries, _ = registry
    base = {r.bucket: (r.n_rows, r.sum_digest, r.xor_digest)
            for r in queries["g12_table_checksum"](spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    victim = orders.limit(1).collect()[0]
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == victim.o_orderkey,
               F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
    )
    d = tempfile.mkdtemp()
    mutated.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    after = {r.bucket: (r.n_rows, r.sum_digest, r.xor_digest)
             for r in queries["g12_table_checksum"](spark, d).collect()}
    hot = victim.o_orderkey % 64
    assert base.keys() == after.keys()
    for b in base:
        if b == hot:
            assert base[b] != after[b]
            assert base[b][0] == after[b][0]  # row count unchanged
        else:
            assert base[b] == after[b]


def test_g12_checksum_is_layout_invariant(spark, registry):
    """The per-bucket SUM/XOR checksums must not depend on partitioning or
    row order — re-run the operator over shuffled/re-partitioned copies of
    orders and require bit-identical output."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    queries, _ = registry
    base = sorted(
        (r.bucket, r.n_rows, r.sum_digest, r.xor_digest)
        for r in queries["g12_table_checksum"](spark, SF_SMOKE).collect()
    )
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for width, order_col in ((7, F.rand(seed=1)), (3, F.col("o_totalprice"))):
        d = tempfile.mkdtemp()
        (
            orders.orderBy(order_col)
            .repartition(width)
            .write.mode("overwrite")
            .parquet(os.path.join(d, "orders.parquet"))
        )
        got = sorted(
            (r.bucket, r.n_rows, r.sum_digest, r.xor_digest)
            for r in queries["g12_table_checksum"](spark, d).collect()
        )
        assert got == base


def test_f17_systematic_sample_exact_stride(spark, registry):
    """Exactly ceil(n/50) rows, indices are multiples of 50, and the
    sampled keys are the true every-50th keys of the global key order."""
    import math

    queries, _ = registry
    rows = sorted(
        queries["f17_systematic_sample"](spark, SF_SMOKE).collect(),
        key=lambda r: r.idx,
    )
    keys = sorted(
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey")
        .collect()
    )
    assert len(rows) == math.ceil(len(keys) / 50)
    for r in rows:
        assert r.idx % 50 == 0
        assert r.o_orderkey == keys[r.idx]


def test_e28_twap_step_function(spark, registry):
    """Hand-check one user: TWAP must equal the step-function integral,
    not the plain mean."""
    import math

    from dask_pipes_spark.session import load

    queries, _ = registry
    rows = {r.user_id: r for r in queries["e28_twap"](spark, SF_SMOKE).collect()}
    ev = sorted(
        (r.ts, r.event_id, r.value)
        for r in load(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") == min(rows))
        .collect()
    )
    num = den = 0.0
    for (t0, _, v), (t1, _, _) in zip(ev, ev[1:]):
        dt = (t1 - t0).total_seconds() * 1e6
        num += round(v * dt, 6)
        den += dt
    want = math.floor(num / den * 1e6 + 0.5) / 1e6
    got = rows[min(rows)]
    assert got.n_samples == len(ev)
    assert abs(got.twap - want) < 1e-6, (got.twap, want)


def test_g13_drilldown_finds_the_planted_row_only(spark, registry):
    """Exactly one differing key (the perturbed min orderkey), and the
    drilldown provably scanned only one bucket's worth of rows."""
    queries, _ = registry
    rows = queries["g13_checksum_drilldown"](spark, SF_SMOKE).collect()
    assert len(rows) == 1
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    minkey = orders.agg(F.min("o_orderkey")).collect()[0][0]
    r = rows[0]
    assert r.diff_key == minkey
    assert r.bucket == minkey % 64
    assert r.digest_a != r.digest_b
    n_total = orders.count()
    n_bucket = orders.filter(F.col("o_orderkey") % 64 == r.bucket).count()
    assert r.n_drilled == n_bucket < n_total


def test_g15_cdc_apply_is_idempotent_compaction(spark):
    """Latest-writer-wins compaction must be idempotent: re-applying the
    compacted snapshot (as all-'U' changelog at its own timestamps) yields
    the identical snapshot — the property that makes incremental
    re-compaction safe."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dask_pipes_spark.operators.setops import g15_cdc_apply

    snap = g15_cdc_apply(spark, SF_SMOKE)
    # re-compact the snapshot under the same rule (every row is a 'U' op)
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts").desc(), F.col("state_value").desc()
    )
    again = (
        snap.select("user_id", "state_value", "last_ts")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    a = {(r.user_id, r.state_value, r.last_ts) for r in snap.select(
        "user_id", "state_value", "last_ts").collect()}
    b = {(r.user_id, r.state_value, r.last_ts) for r in again.collect()}
    assert a == b


def test_g16_dv_sidecar_is_positional_only(spark):
    """The deletion vector carries ONLY (file_name, pos) — no keys, no
    data columns (the Iceberg v2 positional-delete contract) — and its
    cardinality equals the predicate's row count; every position is
    in-range for its file."""
    import os

    from pyspark.sql import functions as F

    from dask_pipes_spark.operators.setops import g16_merge_on_read_dv
    from dask_pipes_spark.session import load, scratch_path
    from tests.conftest import SF_SMOKE

    assert g16_merge_on_read_dv(spark, SF_SMOKE).count() > 0
    tag = SF_SMOKE.rstrip("/").rsplit("/", 1)[-1]
    base = scratch_path(f"dps_g16_dv_{tag}")
    dv = spark.read.parquet(os.path.join(base, "dv"))
    assert dv.columns == ["file_name", "pos"]
    n_deleted = (
        load(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 3)
        .count()
    )
    assert dv.count() == n_deleted
    # positions are dense per file: 0 <= pos < rows_in_file
    per_file = (
        spark.read.parquet(os.path.join(base, "base"))
        .groupBy(F.col("_metadata.file_name").alias("file_name"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bad = (
        dv.join(per_file, "file_name")
        .filter((F.col("pos") < 0) | (F.col("pos") >= F.col("n")))
        .count()
    )
    assert bad == 0
    assert dv.select("file_name", "pos").distinct().count() == n_deleted


def test_g16_serving_plan_broadcast_anti_no_base_rewrite(spark):
    """Merge-on-read plan shape: at sidecar size AQE converts the DV
    anti-join to a broadcast at runtime (the base never shuffles), the
    serving plan reads the immutable base — not lineitem.parquet — and
    the base files are never rewritten by the read path. (No static
    broadcast hint: at sf10 an 8.6M-position DV measured 1.7x faster as
    the SMJ AQE picks instead.)"""
    import os
    import re

    from dask_pipes_spark.operators.setops import g16_merge_on_read_dv
    from dask_pipes_spark.session import scratch_path
    from tests.conftest import SF_SMOKE

    df = g16_merge_on_read_dv(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().toString()
    assert "LeftAnti" in plan
    assert not re.search(r"lineitem\.parquet", plan)
    assert "dps_g16_dv" in plan
    tag = SF_SMOKE.rstrip("/").rsplit("/", 1)[-1]
    base = scratch_path(f"dps_g16_dv_{tag}")
    files_before = sorted(os.listdir(os.path.join(base, "base")))
    df.collect()
    assert sorted(os.listdir(os.path.join(base, "base"))) == files_before
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin.*LeftAnti", executed), (
        "AQE must broadcast a sidecar-sized DV at runtime"
    )


def test_g17_compaction_rewrites_only_dirty_files(spark):
    """g17 contract: the concentrated delete predicate dirties only a
    strict subset of the 8 base files; carried files survive at their
    manifest-recorded byte sizes, rewritten originals and the DV are
    gone, and total row conservation holds: surviving base rows +
    rewritten rows == lineitem rows - deleted rows."""
    import json
    import os

    from pyspark.sql import functions as F

    from dask_pipes_spark.operators.setops import (
        _G16_BASE_SCHEMA,
        g17_dv_compaction,
    )
    from dask_pipes_spark.session import load, scratch_path
    from tests.conftest import SF_SMOKE

    assert g17_dv_compaction(spark, SF_SMOKE).count() > 0
    tag = SF_SMOKE.rstrip("/").rsplit("/", 1)[-1]
    base = scratch_path(f"dps_g17_dvc_{tag}")
    man = json.load(open(os.path.join(base, "COMPACTION.json")))
    assert man["rewritten"], "the concentrated predicate must dirty files"
    assert man["carried"], "most files must be clean and carried over"
    assert len(man["rewritten"]) < len(man["carried"]), (
        "churn concentrated in one eighth of the key range must dirty "
        "fewer files than it carries"
    )
    assert "dv" not in set(os.listdir(base)), "the DV must retire"
    survivors = {
        f
        for f in os.listdir(os.path.join(base, "base"))
        if f.endswith(".parquet")
    }
    assert survivors == set(man["carried"])
    assert not survivors & set(man["rewritten"])
    # carried files are byte-identical to their pre-vacuum manifest record
    for f, size in man["carried_sizes"].items():
        assert os.path.getsize(os.path.join(base, "base", f)) == size
    # row conservation across the fold
    li = load(spark, SF_SMOKE, "lineitem")
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    cutoff = lo + (hi - lo) // 8
    n_deleted = li.filter(
        (F.col("l_orderkey") % 7 == 3) & (F.col("l_orderkey") <= cutoff)
    ).count()
    n_base = (
        spark.read.schema(_G16_BASE_SCHEMA)
        .parquet(os.path.join(base, "base"))
        .count()
    )
    n_rewritten = (
        spark.read.schema(_G16_BASE_SCHEMA)
        .parquet(os.path.join(base, "rewritten"))
        .count()
    )
    assert n_base + n_rewritten == li.count() - n_deleted


def test_g17_serving_plan_has_no_dv_residue(spark):
    """Post-compaction reads are pure scans: no anti-join, no DV path,
    no lineitem.parquet — just the surviving base files plus the
    rewritten directory."""
    import re

    from dask_pipes_spark.operators.setops import g17_dv_compaction
    from tests.conftest import SF_SMOKE

    plan = (
        g17_dv_compaction(spark, SF_SMOKE)._jdf.queryExecution().toString()
    )
    assert "LeftAnti" not in plan
    assert not re.search(r"lineitem\.parquet", plan)
    assert "/dv" not in plan
    assert "dps_g17_dvc" in plan
