"""Baseline JPEG codec (m13): wire-format and entropy-coding edges the
planted-fixture SQL oracle can't reach — arbitrary AC content, the
standard ITU quantization table, ZRL runs, no-EOB index-63 blocks, DC
category jumps, corrupt-stream detection."""

import numpy as np
import pytest

from dask_pipes_spark.operators import jpeg as J

STD_QT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)


def _expected_from_coeffs(zz_blocks, qtable, h, w):
    out = np.empty((h, w), dtype=np.int64)
    i = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            coef = np.zeros(64, dtype=np.int64)
            coef[J.ZIGZAG] = np.asarray(zz_blocks[i], dtype=np.int64)
            i += 1
            rec = np.clip(
                np.round(
                    J._idct(coef.reshape(8, 8).astype(np.float64) * qtable)
                    + 128.0
                ),
                0,
                255,
            )
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rec
    return out


def test_flat_blocks_roundtrip_exact_under_q8():
    rng = np.random.RandomState(11)
    img = np.zeros((24, 32), dtype=np.int64)
    for by in range(3):
        for bx in range(4):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = int(
                rng.randint(0, 256)
            )
    assert np.array_equal(J.jpeg_decode(J.jpeg_encode(img)), img)


def test_random_images_decode_to_reference_reconstruction():
    rng = np.random.RandomState(42)
    for _ in range(20):
        h = 8 * rng.randint(1, 4)
        w = 8 * rng.randint(1, 5)
        img = rng.randint(0, 256, size=(h, w)).astype(np.int64)
        qt = STD_QT if rng.rand() < 0.5 else None
        dec = J.jpeg_decode(J.jpeg_encode(img, qt))
        ref = J.jpeg_reference_reconstruction(img, qt)
        assert np.array_equal(dec, ref)


def test_fill_bytes_and_standalone_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    and TEM (0xFF01) is a standalone marker with no length field — real
    camera/libjpeg output uses both (round-5 advice item)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.int64)
    enc = J.jpeg_encode(img)
    ref = J.jpeg_reference_reconstruction(img)
    # TEM + fill byte after SOI, fill byte before EOI
    hacked = enc[:2] + b"\xff\x01" + b"\xff" + enc[2:-2] + b"\xff" + enc[-2:]
    assert np.array_equal(J.jpeg_decode(hacked), ref)
    # multiple consecutive fill bytes before a header marker
    hacked2 = enc[:2] + b"\xff\xff\xff" + enc[2:]
    assert np.array_equal(J.jpeg_decode(hacked2), ref)


def test_smooth_gradient_small_error_with_std_qtable():
    img = (np.add.outer(np.arange(16) * 3, np.arange(32) * 2) % 256).astype(
        np.int64
    )
    dec = J.jpeg_decode(J.jpeg_encode(img, STD_QT))
    assert int(np.abs(dec - img).max()) <= 8  # quantization error bound


def test_zrl_and_no_eob_and_dc_jump_paths():
    q1 = np.ones((8, 8), dtype=np.int64)
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(4)]
    blocks[0][0] = 500  # large positive DC (category 9)
    blocks[0][63] = 3  # 62-zero run -> 3 ZRLs, ends at 63: NO EOB emitted
    blocks[1][0] = -500  # DC diff -1000 (category 10)
    blocks[1][20] = -1  # mid-run AC
    blocks[2][0] = 0  # DC diff +500
    blocks[2][1] = 1
    blocks[2][18] = -2  # exactly-16-zero run -> one ZRL then (run=0,size)
    # blocks[3] all zero: DC category 0, immediate EOB
    enc = J.jpeg_encode(
        np.zeros((8, 32), dtype=np.int64), q1, _coeff_override=blocks
    )
    dec = J.jpeg_decode(enc)
    assert np.array_equal(dec, _expected_from_coeffs(blocks, q1, 8, 32))


def test_byte_stuffing_survives_roundtrip():
    # seed 0 battery verified to place a 0xFF byte in the entropy stream,
    # so the stuff/unstuff path is exercised, not just possible
    q1 = np.ones((8, 8), dtype=np.int64)
    rng = np.random.RandomState(0)
    blocks = []
    for _ in range(8):
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = rng.randint(-1000, 1001)
        idx = rng.choice(np.arange(1, 64), size=12, replace=False)
        zz[idx] = rng.randint(-1000, 1001, size=12)
        blocks.append(zz)
    enc = J.jpeg_encode(
        np.zeros((8, 64), dtype=np.int64), q1, _coeff_override=blocks
    )
    scan = enc[enc.find(b"\xff\xda") + 2 :]
    assert b"\xff\x00" in scan  # stuffed byte present in the scan
    assert np.array_equal(
        J.jpeg_decode(enc), _expected_from_coeffs(blocks, q1, 8, 64)
    )


def test_corrupt_soi_and_truncated_scan_detected():
    img = np.full((8, 8), 100, dtype=np.int64)
    enc = J.jpeg_encode(img)
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x00\x00" + enc[2:])
    with pytest.raises(Exception):
        J.jpeg_decode(enc[:-10] + b"\xff\xd9")  # scan cut mid-block


def test_mjpeg_split_finds_frame_boundaries():
    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, size=(8 * rng.randint(1, 3), 8 * rng.randint(1, 3)))
        .astype(np.int64)
        for _ in range(5)
    ]
    encs = [J.jpeg_encode(f) for f in frames]
    parts = J.mjpeg_split(b"".join(encs))
    assert parts == encs
    for f, p in zip(frames, parts):
        assert np.array_equal(
            J.jpeg_decode(p), J.jpeg_reference_reconstruction(f)
        )


def test_mjpeg_split_not_fooled_by_fake_eoi_in_segment_body():
    # quant table whose zigzag stream contains 0xFF,0xD9 adjacent — a fake
    # EOI inside the DQT segment body; a naive byte scan would split there
    qt = np.full((8, 8), 8, dtype=np.int64)
    qt.flat[J.ZIGZAG[10]] = 255
    qt.flat[J.ZIGZAG[11]] = 217  # 0xD9
    img = np.full((8, 8), 99, dtype=np.int64)
    enc = J.jpeg_encode(img, qt)
    assert b"\xff\xd9" in enc[:-2]  # the decoy exists before the real EOI
    parts = J.mjpeg_split(enc + enc)
    assert len(parts) == 2 and parts[0] == enc
    ref = J.jpeg_reference_reconstruction(img, qt)
    assert np.array_equal(J.jpeg_decode(parts[1]), ref)


def test_mjpeg_split_rejects_garbage():
    with pytest.raises(ValueError, match="SOI"):
        J.mjpeg_split(b"\x00\x01\x02")


def test_restart_markers_roundtrip_and_reset_dc():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(16, 32)).astype(np.int64)
    enc = J.jpeg_encode(img, restart_interval=2)
    assert any(bytes((0xFF, 0xD0 + m)) in enc for m in range(8))
    assert np.array_equal(
        J.jpeg_decode(enc), J.jpeg_reference_reconstruction(img)
    )
    # frames with restarts still split correctly in an MJPEG stream
    parts = J.mjpeg_split(enc + enc)
    assert len(parts) == 2 and parts[0] == enc


def test_color_flat_blocks_decode_to_exact_bt601_rgb():
    ycc = np.empty((16, 16, 3), dtype=np.int64)
    for by in range(2):
        for bx in range(2):
            sl = (slice(by * 8, by * 8 + 8), slice(bx * 8, bx * 8 + 8))
            ycc[sl[0], sl[1], 0] = (90 + 16 * bx + 31 * by) % 256
            ycc[sl[0], sl[1], 1] = (120 + 11 * bx) % 256
            ycc[sl[0], sl[1], 2] = (140 + 13 * by) % 256
    rgb = J.jpeg_decode(J.jpeg_encode_color(ycc))
    exp = J.ycbcr_to_rgb(
        ycc[:, :, 0].astype(float),
        ycc[:, :, 1].astype(float),
        ycc[:, :, 2].astype(float),
    )
    assert rgb.shape == (16, 16, 3)
    assert np.array_equal(rgb, exp)


def test_color_random_content_with_restarts_matches_reference():
    rng = np.random.RandomState(13)
    ycc = rng.randint(0, 256, size=(16, 24, 3)).astype(np.int64)
    rgb = J.jpeg_decode(J.jpeg_encode_color(ycc, restart_interval=3))
    planes = [J.jpeg_reference_reconstruction(ycc[:, :, c]) for c in range(3)]
    exp = J.ycbcr_to_rgb(
        planes[0].astype(float), planes[1].astype(float), planes[2].astype(float)
    )
    assert np.array_equal(rgb, exp)


def test_420_flat_mcus_decode_to_exact_bt601_rgb():
    ycc = np.empty((32, 32, 3), dtype=np.int64)
    for my in range(2):
        for mx in range(2):
            sl = (slice(my * 16, my * 16 + 16), slice(mx * 16, mx * 16 + 16))
            ycc[sl[0], sl[1], 0] = (60 + 16 * mx + 31 * my) % 256
            ycc[sl[0], sl[1], 1] = (110 + 11 * mx) % 256
            ycc[sl[0], sl[1], 2] = (150 + 13 * my) % 256
    rgb = J.jpeg_decode(J.jpeg_encode_color(ycc, subsampling="4:2:0"))
    exp = J.ycbcr_to_rgb(
        ycc[:, :, 0].astype(float),
        ycc[:, :, 1].astype(float),
        ycc[:, :, 2].astype(float),
    )
    assert np.array_equal(rgb, exp)


def test_420_generic_content_matches_independent_reference():
    rng = np.random.RandomState(17)
    ycc = rng.randint(0, 256, size=(32, 48, 3)).astype(np.int64)
    rgb = J.jpeg_decode(
        J.jpeg_encode_color(ycc, subsampling="4:2:0", restart_interval=2)
    )
    yr = J.jpeg_reference_reconstruction(ycc[:, :, 0])
    cbr = J.jpeg_reference_reconstruction(J.subsample_420(ycc[:, :, 1]))
    crr = J.jpeg_reference_reconstruction(J.subsample_420(ycc[:, :, 2]))
    cbu = np.repeat(np.repeat(cbr, 2, axis=0), 2, axis=1)
    cru = np.repeat(np.repeat(crr, 2, axis=0), 2, axis=1)
    exp = J.ycbcr_to_rgb(yr.astype(float), cbu.astype(float), cru.astype(float))
    assert np.array_equal(rgb, exp)


def test_m13_operator_values_on_smoke_fixture(spark, registry):
    queries, oracles = registry
    assert "m13_jpeg_decode" in oracles
    rows = queries["m13_jpeg_decode"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:10]:
        assert r.width % 8 == 0 and r.height % 8 == 0
        assert r.n_pixels == r.width * r.height
        assert 0 <= r.min_gray <= r.max_gray <= 255
        assert r.min_gray <= r.mean_gray <= r.max_gray
