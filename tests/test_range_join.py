"""Property tests for the bucketed range/interval joins (c19/c21): on random
frames, the bucket-equi-join + residual (+ canonical-bucket rule) must
produce EXACTLY the pairs of the naive theta join — no dupes, no misses,
for any interval placement relative to bucket boundaries."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

HOUR = 3_600

events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user
        st.integers(min_value=0, max_value=4 * HOUR), # ts seconds
        st.booleans(),                                # probe side?
    ),
    min_size=2,
    max_size=14,
)


def _pairs_naive(spark, probes, builds):
    a = spark.createDataFrame(probes, "pid int, user int, ts long")
    b = spark.createDataFrame(builds, "bid int, buser int, bts long")
    got = a.join(
        b,
        (F.col("user") == F.col("buser"))
        & (F.col("bts") > F.col("ts"))
        & (F.col("bts") <= F.col("ts") + HOUR),
    ).select("pid", "bid")
    return sorted(map(tuple, got.collect()))


def _pairs_bucketed(spark, probes, builds):
    a = (
        spark.createDataFrame(probes, "pid int, user int, ts long")
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.col("ts") / HOUR).cast("long"),
                    (F.col("ts") / HOUR).cast("long") + 1,
                )
            ),
        )
    )
    b = spark.createDataFrame(builds, "bid int, buser int, bts long").withColumn(
        "bbucket", (F.col("bts") / HOUR).cast("long")
    )
    got = a.join(
        b,
        (F.col("user") == F.col("buser"))
        & (F.col("bucket") == F.col("bbucket"))
        & (F.col("bts") > F.col("ts"))
        & (F.col("bts") <= F.col("ts") + HOUR),
    ).select("pid", "bid")
    return sorted(map(tuple, got.collect()))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events)
def test_bucketed_point_in_interval_equals_naive(spark, rows):
    probes = [(i, u, t) for i, (u, t, p) in enumerate(rows) if p]
    builds = [(i, u, t) for i, (u, t, p) in enumerate(rows) if not p]
    if not probes or not builds:
        return
    assert _pairs_bucketed(spark, probes, builds) == _pairs_naive(
        spark, probes, builds
    )


def test_canonical_bucket_rule_no_duplicates(spark):
    """c21's interval×interval form: every overlapping pair must appear
    exactly once even when the overlap spans several shared buckets."""
    W = HOUR
    # intervals deliberately spanning 2-3 buckets with big overlaps
    a_rows = [(1, 1, 0, int(2.5 * W)), (2, 1, W // 2, 3 * W)]
    b_rows = [(10, 1, W // 4, 2 * W), (11, 1, 2 * W, int(3.5 * W))]
    a = (
        spark.createDataFrame(a_rows, "aid int, user int, a_s long, a_e long")
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("a_s") / W).cast("long"), (F.col("a_e") / W).cast("long")
                )
            ),
        )
    )
    b = (
        spark.createDataFrame(b_rows, "bid int, buser int, b_s long, b_e long")
        .withColumn(
            "bbucket",
            F.explode(
                F.sequence(
                    (F.col("b_s") / W).cast("long"), (F.col("b_e") / W).cast("long")
                )
            ),
        )
    )
    got = (
        a.join(
            b,
            (F.col("user") == F.col("buser"))
            & (F.col("bucket") == F.col("bbucket"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & ((F.greatest("a_s", "b_s") / W).cast("long") == F.col("bucket")),
        )
        .select("aid", "bid")
        .collect()
    )
    pairs = sorted((r.aid, r.bid) for r in got)
    # every a×b pair here overlaps; each must appear exactly once
    assert pairs == [(1, 10), (1, 11), (2, 10), (2, 11)]
