"""Multimodal columns (round-1 mandate): image/audio/video as opaque
``binary`` columns with typed metadata, decoded / feature-extracted through
Arrow-batched ``mapInPandas``.

Four keys run REAL stdlib-only codecs (round 2; round 5 adds a fifth,
baseline JPEG, in :mod:`dask_pipes_spark.operators.jpeg`): m5 decodes
spec-conformant RIFF/WAVE containers (``wave``), m7 decodes spec-conformant
PNGs
(``struct``/``zlib`` with CRC-32 verification), m8 resizes those PNGs
through an actual decode → nearest-neighbor raster pipeline, and m9 routes
a MIXED png/wav payload stream to the right decoder by magic-byte sniffing
— all synthesized so every decoded quantity is SQL-oracle-predictable. The
remaining keys (m1 generic decode, m4 byte-block resize) keep a
deterministic fake codec (the real-library path
gated behind an import-try raising ``NotImplementedError``) while the
Spark-side plumbing — binary column type, metadata struct, ``mapInPandas``
batch shape, partitioning, schema contract — is real, tested, and since
round 2 fully SQL-oracled as well.

Scale notes (100 TB): binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); decode parallelism is per-partition with Arrow batch transfer —
the standard pattern for petabyte image corpora. Keep payloads out of
shuffles: derive features first (small), shuffle those.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import fanout, load


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in for image bytes), plus a typed
    metadata struct — the schema a real ingest would carry."""
    d = fanout(load(spark, sf_dir, "documents"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),  # binary column
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.pmod(F.col("n_chars"), F.lit(640)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 1).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> dict:
    """Decode stub. The real path needs an image library the container
    doesn't ship; the fake path is deterministic so the plumbing is testable."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally not wired in this environment; "
            "replace decode_image with PIL/Image.open over io.BytesIO(payload)"
        )
    except ImportError:
        digest = hashlib.sha256(payload).digest()
        return {
            "ok": True,
            "n_bytes": len(payload),
            "checksum": digest.hex()[:16],
            # fake 4-dim "pixel stat" vector derived from the digest
            "feat": [b / 255.0 for b in digest[:4]],
        }


@query(
    "m1_multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(n_chars AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS checksum,
           printf('%.6f,%.6f,%.6f,%.6f',
             CAST(('0x' || substr(sha256(text), 1, 2)) AS INTEGER) / 255.0,
             CAST(('0x' || substr(sha256(text), 3, 2)) AS INTEGER) / 255.0,
             CAST(('0x' || substr(sha256(text), 5, 2)) AS INTEGER) / 255.0,
             CAST(('0x' || substr(sha256(text), 7, 2)) AS INTEGER) / 255.0
           ) AS feat,
           CAST((n_chars % 640) + 1 AS INTEGER) AS meta_width
    FROM documents
    """,
)  # full-oracle: sha256 digest + derived feature vector, cross-engine
def m1_multimodal_decode(spark, sf_dir):
    """Binary-column decode through ``mapInPandas``: payloads arrive as
    pandas ``bytes`` values in Arrow batches; output is a typed feature row
    per media item. The decode itself is the stub above — the batch shape,
    binary handling, and schema contract are the real thing under test."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("checksum", T.StringType()),
            # comma-joined string, not array<double>: harness canonicalizer
            # cannot hash ndarray cells (d10 discipline)
            T.StructField("feat", T.StringType()),
            T.StructField("meta_width", T.IntegerType()),
        ]
    )

    def decode_partition(batches):
        for pdf in batches:
            out = {
                "media_id": [],
                "n_bytes": [],
                "checksum": [],
                "feat": [],
                "meta_width": [],
            }
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dec = decode_image(bytes(payload))
                out["media_id"].append(media_id)
                out["n_bytes"].append(dec["n_bytes"])
                out["checksum"].append(dec["checksum"])
                out["feat"].append(",".join(f"{x:.6f}" for x in dec["feat"]))
                out["meta_width"].append(meta["width"])
            import pandas as pd

            yield pd.DataFrame(out)

    return synth_media(spark, sf_dir).mapInPandas(decode_partition, schema)


@query(
    "m2_multimodal_meta",
    oracle="""
    SELECT CAST(FLOOR(((n_chars % 640) + 1) / 100) AS BIGINT) AS width_bucket,
           COUNT(*) AS n_media,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
)
def m2_multimodal_meta(spark, sf_dir):
    """Metadata-only analytics over the media table (no payload touched —
    column pruning keeps binary bytes unread): size distribution per
    mime/width bucket."""
    m = synth_media(spark, sf_dir)
    return (
        m.groupBy(F.floor(F.col("meta.width") / 100).cast("long").alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        )
    )


@query(
    "m3_frame_sample",
    oracle="""
    WITH base AS (
      SELECT doc_id AS media_id, text,
             GREATEST(CAST(FLOOR(n_chars / 40) AS BIGINT), 1) AS n_frames
      FROM documents
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 40 AS BIGINT) AS "offset",
           substr(sha256(substr(text, CAST(i * 40 + 1 AS INTEGER), 40)), 1, 12)
             AS frame_checksum
    FROM base, LATERAL (SELECT unnest(range(0, n_frames, 4)) AS i)
    """,
)  # full-oracle: fixture payloads are ASCII text, so byte-chunk checksums
#   are SQL-reproducible via substr+sha256
def m3_frame_sample(spark, sf_dir):
    """Video frame sampling through ``mapInPandas`` — the one-row→many-rows
    batch shape of real frame extraction: each payload is treated as a
    frame container (frame length 40 bytes), every 4th frame is sampled,
    and one output row per sampled frame carries (media_id, frame_idx,
    frame offset, stub checksum). Decoding a real container is the stubbed
    step; the fan-out schema, offset arithmetic, and Arrow batching are the
    real thing (row counts asserted in tests)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_checksum", T.StringType()),
        ]
    )
    FRAME, EVERY = 40, 4

    def sample_partition(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "offset": [], "frame_checksum": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // FRAME, 1)
                for idx in range(0, n_frames, EVERY):
                    chunk = raw[idx * FRAME : (idx + 1) * FRAME]
                    rows["media_id"].append(media_id)
                    rows["frame_idx"].append(idx)
                    rows["offset"].append(idx * FRAME)
                    rows["frame_checksum"].append(
                        hashlib.sha256(chunk).hexdigest()[:12]
                    )
            yield pd.DataFrame(rows)

    return synth_media(spark, sf_dir).mapInPandas(sample_partition, schema)


_M4_ORACLE = """
    WITH base AS (
      SELECT doc_id AS media_id, text,
             GREATEST(CAST(FLOOR(n_chars / 4) AS BIGINT), 1) AS q
      FROM documents
    ),
    blocks AS (
      SELECT media_id, i,
             FLOOR(LIST_SUM(LIST_TRANSFORM(range(i * q, (i + 1) * q),
                     j -> ord(substr(text, CAST(j + 1 AS INTEGER), 1))))
                   / q / 255.0 * 1000000 + 0.5) / 1000000 AS v
      FROM base, LATERAL (SELECT unnest(range(4)) AS i)
    )
    SELECT media_id,
           printf('%.6f,%.6f,%.6f,%.6f',
                  MIN(CASE WHEN i = 0 THEN v END),
                  MIN(CASE WHEN i = 1 THEN v END),
                  MIN(CASE WHEN i = 2 THEN v END),
                  MIN(CASE WHEN i = 3 THEN v END)) AS thumb
    FROM blocks GROUP BY media_id
    """


@query("m4_image_resize", oracle=_M4_ORACLE)
def m4_image_resize(spark, sf_dir):
    """Resize / thumbnail extraction stub with the real batch contract: each
    payload reduces to a fixed 2×2 block-mean "thumbnail" (4 doubles) — the
    shape-normalization step every multimodal training pipeline runs before
    batching tensors. A real resize swaps the block-mean for the image
    library call; schema, batching, and per-row normalization are the
    tested plumbing. Full SQL oracle since round 2: fixture payloads are
    ASCII, so per-block byte means are SQL-reproducible via ord(substr);
    both sides FLOOR-quantize to the same 1e-6 grid."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            # comma-joined string, not array<double>: harness canonicalizer
            # cannot hash ndarray cells (d10 discipline)
            T.StructField("thumb", T.StringType()),
        ]
    )

    def resize_partition(batches):
        import pandas as pd

        for pdf in batches:
            ids, thumbs = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) or b"\x00"
                q = max(len(raw) // 4, 1)
                blocks = [raw[i * q : (i + 1) * q] or b"\x00" for i in range(4)]
                import math

                # FLOOR quantization (section 7.6.2) so the SQL oracle's
                # FLOOR(x*1e6+0.5)/1e6 sees the identical grid value
                thumbs.append(
                    ",".join(
                        f"{math.floor(sum(b) / len(b) / 255.0 * 1e6 + 0.5) / 1e6:.6f}"
                        for b in blocks
                    )
                )
                ids.append(media_id)
            yield pd.DataFrame({"media_id": ids, "thumb": thumbs})

    return synth_media(spark, sf_dir).mapInPandas(resize_partition, schema)


#: m5 WAV parameters — mirrored in its SQL oracle, so the oracle can predict
#: every decoded quantity from the documents table alone.
_WAV_RATE = 8000  # Hz, 16-bit mono PCM
_WAV_SEG = 2000  # samples per segment (0.25 s)


def synth_wav_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize REAL RIFF/WAVE payloads (stdlib ``wave`` writer, 16-bit
    mono PCM at 8 kHz) from the documents fixture: ``n_chars * 8`` samples
    of a ±amp square wave with ``amp = 1000 + doc_id % 1000``. Every byte
    is a spec-conformant WAV file — any external audio tool can read it —
    and every decoded quantity (rate, sample count, per-window RMS = amp
    exactly, since |sample| is constant) is predictable from (doc_id,
    n_chars), which is what lets m5 carry a full SQL oracle."""

    def synth(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n_samples = int(n_chars) * 8
                amp = 1000 + int(doc_id) % 1000
                wave_arr = np.where(
                    np.arange(n_samples) % 2 == 0, amp, -amp
                ).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_RATE)
                    w.writeframes(wave_arr.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return fanout(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ).mapInPandas(synth, "media_id bigint, payload binary")


@query(
    "m5_audio_segment",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS media_id, CAST(n_chars * 8 AS BIGINT) AS n_samples
      FROM documents
    )
    SELECT media_id, CAST(i AS BIGINT) AS seg_idx,
           CAST(i * {_WAV_SEG} AS BIGINT) AS start_sample,
           CAST(LEAST((i + 1) * {_WAV_SEG}, n_samples) AS BIGINT) AS end_sample,
           CAST({_WAV_RATE} AS INTEGER) AS sample_rate,
           CAST(1000 + media_id % 1000 AS DOUBLE) AS rms
    FROM base,
         UNNEST(range(CAST(CEIL(n_samples / {_WAV_SEG}.0) AS BIGINT))) u(i)
    """,
)
def m5_audio_segment(spark, sf_dir):
    """REAL audio decode + segmentation (round-2 upgrade from the byte-count
    stub): payloads are spec-conformant RIFF/WAVE files (see
    ``synth_wav_media``), decoded in the ``mapInPandas`` kernel with
    stdlib ``wave`` — sample rate, width, channel count and frame payload
    all come from the container headers, not from fixture metadata — then
    cut into 0.25 s windows (the VAD/ASR chunking shape) with the final
    ragged window kept, each carrying its true RMS from the PCM samples.

    The SQL oracle predicts every output value from (doc_id, n_chars)
    because the synthesized waveform is a constant-magnitude square wave:
    if the WAV parse misread the header or the PCM bytes, the sample
    counts, rate, or RMS would diverge — so the decode itself is
    oracle-verified, not just the fan-out arithmetic.

    100 TB: decode is per-partition map work over binary columns (payload
    bytes never shuffle); output rows are small scalars. Swapping the
    stdlib reader for soundfile/ffmpeg changes only the kernel body."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("seg_idx", T.LongType()),
            T.StructField("start_sample", T.LongType()),
            T.StructField("end_sample", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def segment(batches):
        import io
        import math
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "seg_idx", "start_sample", "end_sample",
                    "sample_rate", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    assert w.getsampwidth() == 2 and w.getnchannels() == 1
                    pcm = np.frombuffer(w.readframes(n), dtype="<i2")
                for i in range(0, n, _WAV_SEG):
                    seg = pcm[i : i + _WAV_SEG].astype("float64")
                    out["media_id"].append(mid)
                    out["seg_idx"].append(i // _WAV_SEG)
                    out["start_sample"].append(i)
                    out["end_sample"].append(i + len(seg))
                    out["sample_rate"].append(rate)
                    out["rms"].append(math.sqrt(float((seg * seg).mean())))
            yield pd.DataFrame(out)

    media = synth_wav_media(spark, sf_dir)
    return media.mapInPandas(schema=schema, func=segment)


def _m6_oracle() -> str:
    """DuckDB twin of the sha256-digest encoder: every step is exact or
    correctly-rounded IEEE (integer byte values, mean over 32 = exact
    dyadic, squares/sums of sub-26-bit values exact, sqrt and divide
    correctly rounded), so both engines produce bit-identical dims before
    the shared FLOOR(1e-6) quantization."""
    b = [
        f"CAST(('0x' || substr(sha256(text), {2 * j + 1}, 2)) AS INTEGER)"
        for j in range(32)
    ]
    mean = "((" + " + ".join(b) + ") / 32.0)"
    sq = " + ".join(f"(({x} - m) * ({x} - m))" for x in b)
    dims = ", ".join(
        f"FLOOR(({x} - m) / nrm * 1000000 + 0.5) / 1000000" for x in b[:16]
    )
    fmt = ",".join(["%.6f"] * 16)
    return f"""
    WITH base AS (SELECT doc_id, text, {mean} AS m FROM documents),
    normed AS (SELECT doc_id, text, m, SQRT({sq}) AS nrm FROM base)
    SELECT doc_id AS media_id, CAST(16 AS INTEGER) AS dim,
           printf('{fmt}', {dims}) AS embedding
    FROM normed
    """


@query("m6_feature_extract", oracle=_m6_oracle())
def m6_feature_extract(spark, sf_dir):
    """Feature extraction over binary media — the embed step of a
    multimodal ingest (image → CLIP-style vector): payload bytes arrive as
    Arrow-backed pandas batches in ``mapInPandas``, the (stubbed, see
    ``decode_image``) encoder maps each to a FIXED-DIMENSION float vector,
    L2-normalized so the output plugs straight into the cosine ANN tier
    (l3 brute-force / l12 IVF / l17 LSH) — the handoff a training-data
    pipeline runs at ingest. The stub derives a deterministic 16-dim
    vector from the payload's sha256 (infinite fake 'model', reproducible
    tests); swapping in a real encoder changes one function, not the
    plumbing, schema, or partitioning.

    100 TB: embarrassingly parallel map over binary partitions — heavy
    payload bytes never shuffle; only the 16-float vectors (plus ids) flow
    downstream, which is the thing you DO shuffle into ANN indexing.
    """
    media = synth_media(spark, sf_dir)

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                v = np.frombuffer(digest, dtype=np.uint8).astype("float64")
                v = v - v.mean()
                norm = float(np.sqrt((v * v).sum()))
                # FLOOR quantization (section 7.6.2): same 1e-6 grid as the
                # SQL oracle; comma-joined string, not array<double>, since
                # the harness canonicalizer cannot hash ndarray cells
                vals = np.floor(v / norm * 1e6 + 0.5) / 1e6
                feats.append(
                    (16, ",".join(f"{x:.6f}" for x in vals[:16]))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dim": [d for d, _ in feats],
                    "embedding": [e for _, e in feats],
                }
            )

    return media.mapInPandas(
        extract, "media_id bigint, dim int, embedding string"
    )


def _png_encode(width: int, height: int, pixel, filter_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (stdlib only): 8-bit grayscale, no
    interlace — signature, IHDR, one zlib IDAT, IEND, each chunk
    CRC-32-stamped. Any external viewer/decoder reads these.
    ``filter_type`` selects the per-scanline filter (0-4; fixtures use 0,
    tests drive Sub/Up/Average/Paeth to pin the decoder's full filter
    reconstruction)."""
    import struct
    import zlib
    from binascii import crc32

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = [
        [pixel(x, y) & 0xFF for x in range(width)] for y in range(height)
    ]
    scanlines = []
    for y in range(height):
        cur = rows[y]
        up = rows[y - 1] if y else [0] * width
        filt = []
        for x in range(width):
            a = cur[x - 1] if x else 0
            b = up[x]
            c = up[x - 1] if x else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) // 2
            elif filter_type == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad PNG filter type {filter_type}")
            filt.append((cur[x] - pred) & 0xFF)
        scanlines.append(bytes((filter_type,)) + bytes(filt))
    raw = b"".join(scanlines)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG payloads from the documents fixture: width=(doc_id%16)+1,
    height=(n_chars%16)+1, gray(x,y)=(doc_id+x+y)%256 — spec-conformant
    bytes whose decoded properties are all predictable from (doc_id,
    n_chars), which is what lets m7 carry a full SQL oracle."""

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(doc_id) % 16 + 1
                h = int(n_chars) % 16 + 1
                payloads.append(
                    _png_encode(w, h, lambda x, y: (int(doc_id) + x + y) % 256)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return fanout(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ).mapInPandas(synth, "media_id bigint, payload binary")


@query(
    "m7_png_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 16 + 1 AS INTEGER) AS width,
             CAST(n_chars % 16 + 1 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width, height,
             (media_id + (i % width) + CAST(FLOOR(i / width) AS BIGINT)) % 256
               AS val
      FROM dims, LATERAL (SELECT unnest(range(width * height)) AS i)
    )
    SELECT media_id, width, height,
           CAST(width * height AS BIGINT) AS n_pixels,
           FLOOR(AVG(val) * 1000000 + 0.5) / 1000000 AS mean_gray
    FROM px GROUP BY media_id, width, height
    """,
)
def m7_png_decode(spark, sf_dir):
    """REAL image decode (the second real codec beside m5's WAV): payloads
    are spec-conformant PNGs (see ``synth_png_media``), decoded in the
    ``mapInPandas`` kernel with stdlib ``struct``/``zlib`` — the chunk
    walk verifies every CRC-32, IHDR yields width/height/bit-depth, the
    IDAT stream is actually INFLATED and de-filtered to recover pixel
    values. Dimensions, pixel count, and mean gray level are all
    oracle-predicted from the planted pattern: a wrong chunk parse, CRC,
    inflate, or scanline de-filter would fail parity.

    100 TB: decode is per-partition map work over binary columns; payload
    bytes never shuffle, only the small decoded-feature rows do. Swapping
    stdlib-PNG for PIL/turbojpeg changes one kernel function."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("mean_gray", T.DoubleType()),
        ]
    )

    def decode(batches):
        import math

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_pixels", "mean_gray")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                width, height, pix = _png_decode_gray(bytes(payload))
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["n_pixels"].append(len(pix))
                out["mean_gray"].append(
                    math.floor(sum(pix) / len(pix) * 1e6 + 0.5) / 1e6
                )
            yield pd.DataFrame(out)

    return synth_png_media(spark, sf_dir).mapInPandas(decode, schema)


def _png_decode_gray(data: bytes) -> tuple[int, int, list]:
    """REAL stdlib PNG decoder for 8-bit grayscale images with the FULL
    filter set (None/Sub/Up/Average/Paeth — what libpng-written files
    actually use; fixtures emit filter 0, tests drive 1-4): walks the
    chunk stream verifying every CRC-32, parses IHDR, inflates the
    concatenated IDAT stream, reconstructs each scanline per its filter
    byte. Returns (width, height, row-major pixel list). Shared by m7
    (decode audit) and m8 (resize)."""
    import struct
    import zlib
    from binascii import crc32

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, width, height, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == (crc32(tag + body) & 0xFFFFFFFF), "bad CRC"
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 0
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    pix: list = []
    stride = width + 1
    prev_row = [0] * width
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, filt = row[0], row[1:]
        recon: list = []
        for x in range(width):
            a = recon[x - 1] if x else 0  # left
            b = prev_row[x]  # up
            c = prev_row[x - 1] if x else 0  # upper-left
            if ftype == 0:  # None
                v = filt[x]
            elif ftype == 1:  # Sub
                v = filt[x] + a
            elif ftype == 2:  # Up
                v = filt[x] + b
            elif ftype == 3:  # Average
                v = filt[x] + (a + b) // 2
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = filt[x] + pred
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
            recon.append(v & 0xFF)
        pix.extend(recon)
        prev_row = recon
    return width, height, pix


@query(
    "m8_png_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 16 + 1 AS BIGINT) AS w,
             CAST(n_chars % 16 + 1 AS BIGINT) AS h
      FROM documents
    ),
    cells AS (
      SELECT media_id, w, h, k,
             (media_id
              + CAST(FLOOR((k % 4) * w / 4) AS BIGINT)
              + CAST(FLOOR(FLOOR(k / 4) * h / 4) AS BIGINT)) % 256 AS val
      FROM dims, LATERAL (SELECT unnest(range(16)) AS k)
    )
    SELECT media_id,
           CAST(MAX(w) AS INTEGER) AS src_w,
           CAST(MAX(h) AS INTEGER) AS src_h,
           string_agg(CAST(val AS VARCHAR), ',' ORDER BY k) AS thumb_4x4,
           FLOOR(AVG(val) * 1000000 + 0.5) / 1000000 AS mean_thumb
    FROM cells GROUP BY media_id
    """,
)
def m8_png_resize(spark, sf_dir):
    """REAL image resize (upgrades m4's fake-codec thumbnailing to an
    actual raster pipeline): spec-conformant PNG payloads are DECODED
    (CRC-verified chunk walk, inflate, de-filter — ``_png_decode_gray``)
    and downsampled to a 4×4 thumbnail by nearest-neighbor sampling at
    ``src = (dst * size) // 4`` — the standard NN resample grid. Because
    the planted pixel pattern is ``(doc_id + x + y) % 256``, every sampled
    cell is SQL-predictable and the key carries a FULL oracle: a wrong
    decode, wrong sample coordinate, or wrong raster order fails parity.

    100 TB: same shape as m7 — per-partition Arrow map over binary
    payloads, heavy bytes never shuffle, only 16-byte thumbnails flow
    downstream. Swapping nearest-neighbor for area/bilinear (or stdlib-PNG
    for PIL) changes arithmetic inside one kernel, not the plumbing."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("src_w", T.IntegerType()),
            T.StructField("src_h", T.IntegerType()),
            T.StructField("thumb_4x4", T.StringType()),
            T.StructField("mean_thumb", T.DoubleType()),
        ]
    )

    def resize(batches):
        import math

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "src_w", "src_h", "thumb_4x4", "mean_thumb")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, pix = _png_decode_gray(bytes(payload))
                thumb = [
                    pix[((j * h) // 4) * w + ((i * w) // 4)]
                    for j in range(4)
                    for i in range(4)
                ]
                out["media_id"].append(mid)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["thumb_4x4"].append(",".join(str(v) for v in thumb))
                out["mean_thumb"].append(
                    math.floor(sum(thumb) / 16 * 1e6 + 0.5) / 1e6
                )
            yield pd.DataFrame(out)

    return synth_png_media(spark, sf_dir).mapInPandas(resize, schema)


@query(
    "m9_multiformat_dispatch",
    oracle="""
    WITH png AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 16 + 1 AS BIGINT) AS w,
             CAST(n_chars % 16 + 1 AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    png_px AS (
      SELECT media_id, w, h,
             (media_id + (i % w) + CAST(FLOOR(i / w) AS BIGINT)) % 256 AS val
      FROM png, LATERAL (SELECT unnest(range(w * h)) AS i)
    ),
    png_rows AS (
      SELECT media_id, 'png' AS fmt, CAST(MAX(w * h) AS BIGINT) AS n_units,
             FLOOR(AVG(val) / 255.0 * 1000000 + 0.5) / 1000000 AS level
      FROM png_px GROUP BY media_id
    ),
    wav_rows AS (
      SELECT doc_id AS media_id, 'wav' AS fmt,
             CAST(n_chars * 8 AS BIGINT) AS n_units,
             FLOOR((1000 + doc_id % 1000) / 32768.0 * 1000000 + 0.5) / 1000000
               AS level
      FROM documents WHERE doc_id % 3 = 1
    ),
    jpg AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 4 + 1 AS BIGINT) AS wb,
             CAST(n_chars % 3 + 1 AS BIGINT) AS hb
      FROM documents WHERE doc_id % 3 = 2
    ),
    jpg_blocks AS (
      SELECT media_id, wb, hb,
             (media_id + 16 * (i % wb) + 31 * CAST(FLOOR(i / wb) AS BIGINT))
               % 256 AS g
      FROM jpg, LATERAL (SELECT unnest(range(wb * hb)) AS i)
    ),
    jpg_rows AS (
      SELECT media_id, 'jpeg' AS fmt,
             CAST(MAX(wb * hb) * 64 AS BIGINT) AS n_units,
             FLOOR(AVG(g) / 255.0 * 1000000 + 0.5) / 1000000 AS level
      FROM jpg_blocks GROUP BY media_id
    )
    SELECT * FROM png_rows
    UNION ALL SELECT * FROM wav_rows
    UNION ALL SELECT * FROM jpg_rows
    """,
)
def m9_multiformat_dispatch(spark, sf_dir):
    """REAL multi-format decode dispatch — the shape of an actual ingest
    where one binary column carries MIXED media: docs synthesize
    spec-conformant PNGs (doc_id%3=0), WAVs (%3=1), and — since round 5 —
    baseline JPEGs (%3=2), interleaved in the SAME payload stream, and the
    kernel routes each payload by sniffing its magic bytes (``\\x89PNG`` /
    ``RIFF`` / ``\\xff\\xd8``) to the matching REAL stdlib decoder (m7's
    CRC-verified PNG walk; ``wave`` PCM parse; m13's T.81 Huffman+IDCT).
    Output normalizes all modalities to (fmt, n_units, level): pixels +
    mean gray/255 for images, samples + RMS/full-scale for audio. Every value
    is predicted by the SQL oracle from the planted patterns — a wrong
    sniff, a wrong decoder, or a wrong normalization fails parity.

    100 TB: the dispatch is per-row inside a per-partition Arrow map —
    no shuffle by format, no split pipelines; payload bytes stay columnar
    and never shuffle. Adding a codec = one more sniff branch."""
    docs = fanout(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )

    def synth_mixed(batches):
        import io
        import wave as wave_mod

        import numpy as np
        import pandas as pd

        from dask_pipes_spark.operators.jpeg import jpeg_encode

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                mod = int(doc_id) % 3
                if mod == 0:
                    w = int(doc_id) % 16 + 1
                    h = int(n_chars) % 16 + 1
                    payloads.append(
                        _png_encode(w, h, lambda x, y: (int(doc_id) + x + y) % 256)
                    )
                elif mod == 1:
                    n_samples = int(n_chars) * 8
                    amp = 1000 + int(doc_id) % 1000
                    arr = np.where(
                        np.arange(n_samples) % 2 == 0, amp, -amp
                    ).astype("<i2")
                    buf = io.BytesIO()
                    with wave_mod.open(buf, "wb") as wv:
                        wv.setnchannels(1)
                        wv.setsampwidth(2)
                        wv.setframerate(_WAV_RATE)
                        wv.writeframes(arr.tobytes())
                    payloads.append(buf.getvalue())
                else:  # the m13 flat-block pattern, exact under q=8
                    d, nc = int(doc_id), int(n_chars)
                    wb, hb = d % 4 + 1, nc % 3 + 1
                    img = np.empty((hb * 8, wb * 8), dtype=np.int64)
                    for by in range(hb):
                        for bx in range(wb):
                            img[
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ] = (d + 16 * bx + 31 * by) % 256
                    payloads.append(jpeg_encode(img))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(synth_mixed, "media_id bigint, payload binary")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("n_units", T.LongType()),
            T.StructField("level", T.DoubleType()),
        ]
    )

    def dispatch(batches):
        import io
        import math
        import wave as wave_mod

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "fmt": [], "n_units": [], "level": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if data[:4] == b"\x89PNG":
                    w, h, pix = _png_decode_gray(data)
                    fmt, n_units = "png", len(pix)
                    level = sum(pix) / len(pix) / 255.0
                elif data[:4] == b"RIFF":
                    with wave_mod.open(io.BytesIO(data), "rb") as wv:
                        assert wv.getsampwidth() == 2 and wv.getnchannels() == 1
                        frames = wv.readframes(wv.getnframes())
                        n_units = wv.getnframes()
                    samples = np.frombuffer(frames, dtype="<i2").astype("float64")
                    fmt = "wav"
                    level = float(np.sqrt((samples * samples).mean())) / 32768.0
                elif data[:2] == b"\xff\xd8":
                    from dask_pipes_spark.operators.jpeg import jpeg_decode

                    img = jpeg_decode(data)
                    fmt, n_units = "jpeg", int(img.size)
                    level = float(img.mean()) / 255.0
                else:
                    raise ValueError(f"unknown magic: {data[:4]!r}")
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
                out["n_units"].append(n_units)
                out["level"].append(math.floor(level * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(out)

    return media.mapInPandas(dispatch, schema)


def synth_wav_media_periodic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like :func:`synth_wav_media`, but the square wave's HALF-PERIOD varies
    per document (``half = 1 + doc_id % 4`` samples), so frequency-domain
    features (zero-crossing counts) differ across files while staying
    integer-exact: sign flips happen exactly at sample indices divisible by
    ``half``, so crossings = ⌊(n_samples−1)/half⌋ — predictable from
    (doc_id, n_chars) alone, which is what lets m10 carry a full SQL oracle
    over genuinely decoded PCM."""

    def synth(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n_samples = int(n_chars) * 8
                amp = 1000 + int(doc_id) % 1000
                half = 1 + int(doc_id) % 4
                sgn = 1 - 2 * ((np.arange(n_samples) // half) % 2)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_RATE)
                    w.writeframes((amp * sgn).astype("<i2").tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return fanout(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ).mapInPandas(synth, "media_id bigint, payload binary")


@query(
    "m10_audio_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(n_chars * 8 AS BIGINT) AS n_samples,
           CAST({_WAV_RATE} AS INTEGER) AS sample_rate,
           FLOOR(n_chars * 8 / {_WAV_RATE}.0 * 10000 + 0.5) / 10000
             AS duration_s,
           CAST(1000 + doc_id % 1000 AS DOUBLE) AS rms,
           CAST(1000 + doc_id % 1000 AS DOUBLE) AS peak,
           CAST(FLOOR((n_chars * 8 - 1) / (1 + doc_id % 4)) AS BIGINT)
             AS zero_crossings
    FROM documents
    """,
)
def m10_audio_features(spark, sf_dir):
    """REAL audio feature extraction over decoded PCM — the acoustic-
    screening pass an audio training pipeline runs before transcription:
    per file, sample count / rate / duration from the WAV container, and
    RMS energy, peak amplitude, and zero-crossing count computed by numpy
    on the decoded int16 samples. Payloads are spec-conformant WAVs whose
    square wave varies in amplitude AND period per document
    (:func:`synth_wav_media_periodic`), so every feature — including the
    frequency-sensitive crossing count — is predicted exactly by the SQL
    oracle from (doc_id, n_chars): a misparsed header, wrong byte order,
    or off-by-one in the crossing logic diverges immediately.

    100 TB: identical shape to m5 — binary payloads never shuffle, the
    Arrow kernel is per-partition map work, output is a skinny scalar row
    per file; swapping stdlib ``wave``+numpy for soundfile/torchaudio
    changes only the kernel body."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    def extract(batches):
        import io
        import math
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "n_samples", "sample_rate", "duration_s",
                    "rms", "peak", "zero_crossings")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    assert w.getsampwidth() == 2 and w.getnchannels() == 1
                    pcm = np.frombuffer(w.readframes(n), dtype="<i2")
                x = pcm.astype("float64")
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["duration_s"].append(
                    math.floor(n / rate * 10000 + 0.5) / 10000
                )
                out["rms"].append(math.sqrt(float((x * x).mean())))
                out["peak"].append(float(np.abs(x).max()))
                out["zero_crossings"].append(
                    int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum())
                )
            yield pd.DataFrame(out)

    return synth_wav_media_periodic(spark, sf_dir).mapInPandas(
        schema=schema, func=extract
    )


def synth_framestream_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame containers: 4-byte BE frame count, then per frame a
    4-byte BE length prefix + a complete, spec-conformant PNG
    (:func:`_png_encode`) — the MJPEG-style "stream of stills" layout.
    Frame f of doc d: width=(d+f)%8+1, height=(n_chars+f)%8+1,
    gray(x,y)=(d+f+x+y)%256, n_frames=2+d%4 — every decoded quantity is
    predictable from (doc_id, n_chars), which is what lets m11 carry a
    full SQL oracle over genuinely container-parsed, PNG-decoded frames."""

    def synth(batches):
        import struct

        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, nc = int(doc_id), int(n_chars)
                frames = []
                for f in range(2 + d % 4):
                    png = _png_encode(
                        (d + f) % 8 + 1,
                        (nc + f) % 8 + 1,
                        lambda x, y, f=f: (d + f + x + y) % 256,
                    )
                    frames.append(struct.pack(">I", len(png)) + png)
                payloads.append(
                    struct.pack(">I", len(frames)) + b"".join(frames)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return fanout(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ).mapInPandas(synth, "media_id bigint, payload binary")


@query(
    "m11_framestream_decode",
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id, n_chars,
             UNNEST(range(2 + doc_id % 4)) AS fi
      FROM documents
    ),
    dims AS (
      SELECT media_id, fi,
             CAST((media_id + fi) % 8 + 1 AS INTEGER) AS width,
             CAST((n_chars + fi) % 8 + 1 AS INTEGER) AS height
      FROM f WHERE fi % 2 = 0
    ),
    px AS (
      SELECT media_id, fi, width, height,
             (media_id + fi + (i % width) + CAST(FLOOR(i / width) AS BIGINT))
               % 256 AS val
      FROM dims, LATERAL (SELECT unnest(range(width * height)) AS i)
    )
    SELECT media_id, CAST(fi AS BIGINT) AS frame_idx, width, height,
           FLOOR(AVG(val) * 1000000 + 0.5) / 1000000 AS mean_gray
    FROM px GROUP BY media_id, fi, width, height
    """,
)
def m11_framestream_decode(spark, sf_dir):
    """REAL frame sampling + decode — m3's stub made real end-to-end: the
    payload is a genuine multi-frame container (length-prefixed stream of
    spec-conformant PNGs, the MJPEG layout), the kernel PARSES the
    container structure, samples every 2nd frame, and runs the real
    CRC-verified PNG decode (:func:`_png_decode_gray`) on each sampled
    frame — one output row per (media, frame) with true dimensions and
    mean gray. The SQL oracle predicts every value from (doc_id, n_chars)
    arithmetic: a mis-parsed length prefix, wrong frame offset, or decode
    fault diverges immediately. With m7 (decode), m8 (resize), m10
    (audio DSP) and m9 (format dispatch), every step of the multimodal
    path now runs a REAL codec under full oracles.

    100 TB: container parsing is sequential per payload but payloads are
    row-parallel across partitions (binary column never shuffles); frame
    sampling bounds decode cost to sampled frames only — exactly how a
    video pipeline keeps ffmpeg cost sublinear in footage; output is
    skinny scalar rows."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_gray", T.DoubleType()),
        ]
    )

    def decode(batches):
        import math
        import struct

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "width", "height", "mean_gray")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                (n_frames,) = struct.unpack(">I", raw[:4])
                off = 4
                for fi in range(n_frames):
                    (ln,) = struct.unpack(">I", raw[off : off + 4])
                    frame = raw[off + 4 : off + 4 + ln]
                    off += 4 + ln
                    if fi % 2:
                        continue
                    width, height, pix = _png_decode_gray(frame)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(width)
                    out["height"].append(height)
                    out["mean_gray"].append(
                        math.floor(sum(pix) / len(pix) * 1e6 + 0.5) / 1e6
                    )
                assert off == len(raw), "container trailer mismatch"
            yield pd.DataFrame(out)

    return synth_framestream_media(spark, sf_dir).mapInPandas(decode, schema)


@query(
    "m12_scene_cuts",
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id, n_chars,
             UNNEST(range(2 + doc_id % 4 - 1)) AS fi
      FROM documents
      WHERE 2 + doc_id % 4 >= 2
    ),
    dims AS (
      SELECT media_id, fi,
             LEAST(CAST((media_id + fi) % 8 + 1 AS INTEGER),
                   CAST((media_id + fi + 1) % 8 + 1 AS INTEGER)) AS ow,
             LEAST(CAST((n_chars + fi) % 8 + 1 AS INTEGER),
                   CAST((n_chars + fi + 1) % 8 + 1 AS INTEGER)) AS oh
      FROM f
    ),
    px AS (
      SELECT media_id, fi, ow, oh,
             ABS(CAST((media_id + fi + (i % ow)
                       + CAST(FLOOR(i / ow) AS BIGINT)) % 256 AS DOUBLE)
                 - (media_id + fi + 1 + (i % ow)
                    + CAST(FLOOR(i / ow) AS BIGINT)) % 256) AS d
      FROM dims, LATERAL (SELECT unnest(range(ow * oh)) AS i)
    )
    SELECT media_id, CAST(fi AS BIGINT) AS frame_idx, ow AS overlap_w,
           oh AS overlap_h,
           FLOOR(AVG(d) * 1000000 + 0.5) / 1000000 AS mean_abs_diff,
           CAST(AVG(d) > 8.0 AS BOOLEAN) AS is_cut
    FROM px GROUP BY media_id, fi, ow, oh
    """,
)
def m12_scene_cuts(spark, sf_dir):
    """Scene-cut (shot-boundary) detection over the REAL frame containers —
    the selection step a video-training pipeline runs to pick keyframes:
    every consecutive frame pair is compared by mean absolute pixel
    difference over the overlapping top-left region (frames in the fixture
    stream legitimately change dimensions, as real transcoded footage
    does), and pairs whose difference exceeds the threshold are flagged as
    cuts. Unlike m11 this decodes EVERY frame (pairing needs both sides)
    and does genuine two-frame array work in the kernel; the SQL oracle
    predicts each overlap region and every pixel delta from the
    (doc_id, n_chars) lattice, so a mis-aligned pair, wrong overlap, or
    decode fault diverges immediately.

    100 TB: container parsing and pairwise diffs are per-payload map work
    (frames of one media never leave their row — no shuffle); cut rows are
    skinny scalars. Real footage would subsample first (m11's every-Nth
    discipline) and diff at thumbnail resolution (m8's resize) to bound
    decode cost; the pipeline shape is identical."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("overlap_w", T.IntegerType()),
            T.StructField("overlap_h", T.IntegerType()),
            T.StructField("mean_abs_diff", T.DoubleType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )

    def cuts(batches):
        import math
        import struct

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "overlap_w", "overlap_h",
                    "mean_abs_diff", "is_cut")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                (n_frames,) = struct.unpack(">I", raw[:4])
                off = 4
                frames = []
                for _ in range(n_frames):
                    (ln,) = struct.unpack(">I", raw[off : off + 4])
                    frames.append(_png_decode_gray(raw[off + 4 : off + 4 + ln]))
                    off += 4 + ln
                assert off == len(raw), "container trailer mismatch"
                for fi in range(len(frames) - 1):
                    w1, h1, p1 = frames[fi]
                    w2, h2, p2 = frames[fi + 1]
                    ow, oh = min(w1, w2), min(h1, h2)
                    tot = 0
                    for y in range(oh):
                        for x in range(ow):
                            tot += abs(p1[y * w1 + x] - p2[y * w2 + x])
                    mad = tot / (ow * oh)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["overlap_w"].append(ow)
                    out["overlap_h"].append(oh)
                    out["mean_abs_diff"].append(
                        math.floor(mad * 1e6 + 0.5) / 1e6
                    )
                    out["is_cut"].append(mad > 8.0)
            yield pd.DataFrame(out)

    return synth_framestream_media(spark, sf_dir).mapInPandas(cuts, schema)
