"""Baseline JFIF codec (kernels/jpeg.py): round-trip exactness for
constant blocks, bounded quantization error for arbitrary images, restart
markers, 4:2:0 MCU layout, and hostile-input rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark.kernels.jpeg import (
    DCT_M,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg_bytes,
    encode_jpeg,
)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))
    # spot-check the spec's first diagonal walk (T.81 Figure A.6)
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)
    # constant block c -> single DC coefficient 8c (the T.81 scaling that
    # makes constant blocks round-trip exactly)
    f = np.full((8, 8), 3.0)
    F = DCT_M @ f @ DCT_M.T
    assert abs(F[0, 0] - 24.0) < 1e-12 and np.abs(F).sum() - abs(F[0, 0]) < 1e-9


def test_constant_blocks_roundtrip_exactly():
    rng = np.random.default_rng(7)
    for _ in range(10):
        bw, bh = int(rng.integers(1, 6)), int(rng.integers(1, 5))
        vals = rng.integers(0, 256, (bh, bw))
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img))
        assert (w, h, nc) == (img.shape[1], img.shape[0], 1)
        assert np.array_equal(px, img)


def test_random_gray_bounded_error():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (19, 23)).astype(np.uint8)  # odd dims: crop
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img))
    assert (w, h, nc) == (23, 19, 1)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3


def test_random_color_444_bounded_error():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (17, 12, 3)).astype(np.uint8)
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img))
    assert (w, h, nc) == (12, 17, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 4


def test_420_constant_color_near_exact():
    """Chroma subsampling of a constant is a no-op, so a constant-colour
    4:2:0 image round-trips to within YCbCr<->RGB float rounding."""
    img = np.zeros((24, 40, 3), np.uint8)
    img[...] = (200, 60, 130)
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img, subsample="420"))
    assert (w, h, nc) == (40, 24, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 1


def test_420_odd_dims_crop():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (30, 50, 3)).astype(np.uint8)
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img, subsample="420"))
    assert (w, h) == (50, 30) and px.shape == (30, 50, 3)


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    data = encode_jpeg(img, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, nc, px = decode_jpeg_bytes(data)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3
    # and under 4:2:0 (multi-block MCUs between restarts)
    imgc = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    w, h, nc, px = decode_jpeg_bytes(
        encode_jpeg(imgc, subsample="420", restart_interval=3)
    )
    assert (w, h, nc) == (48, 32, 3)


def test_coarse_qtable_still_decodes():
    rng = np.random.default_rng(23)
    q = np.full(64, 16, dtype=np.int64)
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img, q))
    assert (w, h) == (41, 33)
    # error bounded by quantization steps, not unbounded
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 64


class TestHostileInputs:
    def _base(self):
        return encode_jpeg(np.zeros((8, 8), np.uint8))

    def test_dimension_bomb_rejected_before_allocation(self):
        data = bytearray(self._base())
        i = data.index(b"\xff\xc0")
        struct.pack_into(">HH", data, i + 5, 60000, 60000)
        with pytest.raises(ValueError, match="decode ceiling"):
            decode_jpeg_bytes(bytes(data))

    def test_truncation_rejected(self):
        data = self._base()
        with pytest.raises(ValueError):
            decode_jpeg_bytes(data[:40])
        with pytest.raises(ValueError, match="truncated|marker|scan"):
            decode_jpeg_bytes(data[:-8])

    def test_progressive_rejected(self):
        data = bytearray(self._base())
        i = data.index(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF2 progressive
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg_bytes(bytes(data))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_bytes(b"\x89PNG\r\n\x1a\n")

    def test_lying_segment_length(self):
        data = bytearray(self._base())
        i = data.index(b"\xff\xdb")
        struct.pack_into(">H", data, i + 2, 0xFFF0)
        with pytest.raises(ValueError, match="exceeds payload"):
            decode_jpeg_bytes(bytes(data))

    def test_missing_huffman_table(self):
        # excise the AC DHT segment: scan must fail loudly, not KeyError
        data = self._base()
        i = data.index(b"\xff\xc4")  # first DHT (DC)
        (ln,) = struct.unpack_from(">H", data, i + 2)
        j = i + 2 + ln
        assert data[j : j + 2] == b"\xff\xc4"  # second DHT (AC)
        (ln2,) = struct.unpack_from(">H", data, j + 2)
        cut = data[:j] + data[j + 2 + ln2 :]
        with pytest.raises(ValueError, match="Huffman table"):
            decode_jpeg_bytes(cut)


def test_decode_jpeg_dataframe(spark):
    """mapInPandas wrapper: shuffle-free plan, grayscale means duplicated
    across the three channel columns."""
    from crawler_spark.operators.multimodal import decode_jpeg

    rows = []
    want = {}
    for did in range(6):
        bw, bh = 1 + did % 3, 1 + did % 2
        by, bx = np.mgrid[0:bh, 0:bw]
        vals = ((did + 17 * bx + 29 * by) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        rows.append((did, bytearray(encode_jpeg(img))))
        want[did] = (8 * bw, 8 * bh, float(vals.mean()))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_jpeg(df).collect()}
    for did, (w, h, mean) in want.items():
        r = out[did]
        assert (r.width, r.height, r.n_components) == (w, h, 1)
        assert abs(r.mean_r - mean) < 1e-9
        assert r.mean_r == r.mean_g == r.mean_b
    plan = decode_jpeg(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "decode must not shuffle"


def test_decode_media_real_dispatch(spark):
    """decode_media(fake=False) now routes JPEG/PNG/GIF/BMP through the
    real codecs; unknown formats keep the honest NotImplementedError."""
    from crawler_spark.operators.multimodal import decode_media, encode_png

    rng = np.random.default_rng(3)
    jpg = encode_jpeg(rng.integers(0, 256, (16, 24)).astype(np.uint8))
    y, x = np.mgrid[0:5, 0:7]
    png = encode_png(
        7, 5, np.stack([(x * 9) % 256, (y * 7) % 256, (x + y) % 256], -1
                       ).astype(np.uint8)
    )
    df = spark.createDataFrame(
        [(1, "/a.jpg", bytearray(jpg)), (2, "/b.png", bytearray(png))],
        "doc_id long, media_ref string, payload binary",
    )
    out = {r.doc_id: r for r in decode_media(df, fake=False).collect()}
    assert (out[1].width, out[1].height, out[1].n_channels) == (24, 16, 1)
    assert (out[2].width, out[2].height, out[2].n_channels) == (7, 5, 3)
    for r in out.values():
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram
    bad = spark.createDataFrame(
        [(3, "/c.mp4", bytearray(b"\x00\x00\x00 ftypmp42----"))],
        "doc_id long, media_ref string, payload binary",
    )
    with pytest.raises(Exception) as ei:
        decode_media(bad, fake=False).collect()
    assert "NotImplementedError" in str(ei.value)


def test_non_uniform_qtable_roundtrip():
    """Review finding: dequantization multiplied SCAN-order coefficients by
    the NATURAL-order table — exact for uniform tables (every prior test),
    garbage (err 255) for the non-uniform tables every real-world JPEG
    uses. Error must be bounded by the quantization steps."""
    rng = np.random.default_rng(3)
    q = np.ones(64, dtype=np.int64)
    q[1], q[8], q[9], q[35] = 11, 99, 24, 40
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    w, h, nc, px = decode_jpeg_bytes(encode_jpeg(img, q))
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 60
    # and a constant block still round-trips exactly (DC-only; qDC=1)
    vals = rng.integers(0, 256, (2, 2))
    cimg = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(decode_jpeg_bytes(encode_jpeg(cimg, q))[3], cimg)
