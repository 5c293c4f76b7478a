"""Differential property tests for the cross-engine idioms every SQL oracle
leans on: the portable md5-60bit digest (l2/l16/g12/f7 discipline), explicit
timestamp rendering (g12), and the FLOOR half-up quantization (SURVEY
§7.6.2). Each property is proven on arbitrary hypothesis-generated inputs,
batched through ONE Spark job and one DuckDB query per example.

These exist because "both engines have function X" does not mean X agrees:
raw ``levenshtein`` diverges on non-ASCII (see test_llm_ext), DuckDB ROUND
is half-away while Spark/numpy differ per type, and DuckDB ``SUM(BIGINT)``
silently widens to HUGEINT. Idioms that ARE bitwise-portable get pinned
here so a refactor cannot silently step off them.
"""

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs")),
    min_size=0,
    max_size=24,
)


@_settings
@given(vals=st.lists(_text, min_size=1, max_size=8))
def test_md5_60bit_digest_matches_duckdb(spark, vals):
    """conv(substr(md5(s),1,15),16,10) == CAST('0x'||substr(md5(s),1,15) AS
    BIGINT) for arbitrary unicode — the hash every portable dedup/checksum
    key is built on."""
    pdf = pd.DataFrame({"s": vals})
    got = (
        spark.createDataFrame(pdf)
        .select(
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("d")
        )
        .toPandas()["d"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            "SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FROM t"
        ).fetchall()
    ]
    assert got == want


_ts = st.integers(min_value=0, max_value=4_102_444_800_000_000).map(
    lambda us: dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
)


@_settings
@given(stamps=st.lists(_ts, min_size=1, max_size=8))
def test_timestamp_render_matches_duckdb(spark, stamps):
    """date_format(ts,'yyyy-MM-dd HH:mm:ss') == strftime(ts,'%Y-%m-%d
    %H:%M:%S') — the explicit rendering g12 hashes (sub-second digits are
    deliberately truncated on both sides)."""
    pdf = pd.DataFrame({"ts": stamps})
    got = (
        spark.createDataFrame(pdf)
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .toPandas()["s"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            "SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') FROM t"
        ).fetchall()
    ]
    assert got == want


_money = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@_settings
@given(vals=st.lists(_money, min_size=1, max_size=8))
def test_floor_quantization_matches_duckdb(spark, vals):
    """FLOOR(x*1e4+0.5)/1e4 — the §7.6.2 half-up quantizer used wherever
    ROUND would tie-break differently across engines — is bitwise-portable
    for arbitrary doubles (both engines run IEEE double arithmetic on the
    identical value, no decimal re-interpretation anywhere)."""
    pdf = pd.DataFrame({"x": vals})
    got = (
        spark.createDataFrame(pdf)
        .select((F.floor(F.col("x") * 10000 + 0.5) / 10000).alias("q"))
        .toPandas()["q"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            "SELECT FLOOR(x * 10000 + 0.5) / 10000 FROM t"
        ).fetchall()
    ]
    assert got == want
