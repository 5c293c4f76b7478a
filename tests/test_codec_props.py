"""Property layer for the round-5 codecs (pure Python — no SparkSession,
so the thorough tier is cheap): Avro value/container roundtrip over
arbitrary typed rows, JPEG entropy coding over arbitrary coefficient
blocks, and full JPEG encode/decode over arbitrary images + quantization
tables. Derandomized like the grid layer; ``HYPOTHESIS_PROFILE=thorough``
runs 1000 examples."""

import io
import os

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from dask_pipes_spark.operators import avro_io
from dask_pipes_spark.operators import jpeg as J

settings.register_profile(
    "default_grid",
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
settings.register_profile(
    "thorough",
    max_examples=1000,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default_grid"))

# --- Avro -------------------------------------------------------------------

AVRO_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

_maybe = lambda s: st.one_of(st.none(), s)  # noqa: E731
_long = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_row = st.tuples(
    _maybe(_long),
    _maybe(st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    # NaN excluded: the writer maps it to null by documented convention
    _maybe(
        st.floats(allow_nan=False, allow_infinity=True, width=64)
    ),
    _maybe(st.text(max_size=40)),
    _maybe(st.booleans()),
    # ±~280 years around the epoch in microseconds, incl. pre-epoch
    _maybe(
        st.integers(min_value=-(2**53), max_value=2**53).map(
            lambda us: pd.Timestamp(us, unit="us")
        )
    ),
    _maybe(st.lists(_long, max_size=8)),
)


@given(rows=st.lists(_row, max_size=25), codec=st.sampled_from(["deflate", "null"]))
def test_avro_container_roundtrips_arbitrary_rows(rows, codec):
    """encode rows -> spec container bytes -> decode == original, for any
    mix of nulls, extreme longs, ±inf/-0.0 doubles, unicode, pre-epoch
    timestamps, and nested arrays, under both codecs."""
    schema_json = avro_io.avro_schema_json(AVRO_SCHEMA)
    import json

    fields = json.loads(schema_json)["fields"]
    body = bytearray()
    for tup in rows:
        for f, v in zip(fields, tup):
            avro_io._encode_value(body, f["type"], v)
    sync = avro_io._sync_marker("prop")
    blob = bytearray(avro_io._container_header(schema_json, codec, sync))
    data = bytes(body)
    if codec == "deflate":
        import zlib

        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        data = comp.compress(data) + comp.flush()
    blob += avro_io._zigzag_encode(len(rows))
    blob += avro_io._zigzag_encode(len(data))
    blob += data
    blob += sync
    schema_back, blocks = avro_io._read_container(bytes(blob))
    assert schema_back == schema_json
    assert len(blocks) == 1 and blocks[0][0] == len(rows)
    buf = io.BytesIO(blocks[0][1])
    for tup in rows:
        got = tuple(avro_io._decode_value(buf, f["type"]) for f in fields)
        assert got == tup, (got, tup)
    assert not buf.read(1)  # fully consumed — no trailing bytes


@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_varint_roundtrip_full_long_range(n):
    buf = io.BytesIO(avro_io._zigzag_encode(n))
    assert avro_io._zigzag_decode(buf) == n


# --- JPEG -------------------------------------------------------------------

_coef = st.integers(min_value=-1023, max_value=1023)


@st.composite
def _coeff_blocks(draw):
    """1-6 sparse zigzag coefficient blocks: up to 10 nonzero ACs each at
    arbitrary positions (drives EOB/ZRL/no-EOB and DC-diff categories)."""
    nblocks = draw(st.integers(min_value=1, max_value=6))
    blocks = []
    for _ in range(nblocks):
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = draw(_coef)
        for _ in range(draw(st.integers(min_value=0, max_value=10))):
            zz[draw(st.integers(min_value=1, max_value=63))] = draw(_coef)
        blocks.append(zz)
    return blocks


@given(blocks=_coeff_blocks(), rst=st.sampled_from([0, 1, 2]))
def test_jpeg_entropy_coding_roundtrips_arbitrary_blocks(blocks, rst):
    """Huffman encode -> scan bytes (stuffing, optional restarts) ->
    decode reproduces the exact dequantized reconstruction of ANY sparse
    coefficient content (q=1: the entropy layer is isolated exactly)."""
    q1 = np.ones((8, 8), dtype=np.int64)
    img = np.zeros((8, 8 * len(blocks)), dtype=np.int64)
    enc = J.jpeg_encode(img, q1, restart_interval=rst, _coeff_override=blocks)
    dec = J.jpeg_decode(enc)
    for bi, zz in enumerate(blocks):
        coef = np.zeros(64, dtype=np.int64)
        coef[J.ZIGZAG] = zz
        want = np.clip(
            np.round(J._idct(coef.reshape(8, 8).astype(np.float64)) + 128.0),
            0,
            255,
        )
        got = dec[:, bi * 8 : bi * 8 + 8]
        assert np.array_equal(got, want), (bi, got, want)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    hb=st.integers(min_value=1, max_value=2),
    wb=st.integers(min_value=1, max_value=3),
    quant=st.integers(min_value=1, max_value=255),
)
def test_jpeg_full_pipeline_matches_reference(seed, hb, wb, quant):
    """encode(img, qtable) -> decode == the quantize/IDCT reference for
    arbitrary images and uniform quantization strengths."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(8 * hb, 8 * wb)).astype(np.int64)
    qt = np.full((8, 8), quant, dtype=np.int64)
    dec = J.jpeg_decode(J.jpeg_encode(img, qt))
    assert np.array_equal(dec, J.jpeg_reference_reconstruction(img, qt))
