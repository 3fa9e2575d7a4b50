"""Multimodal plumbing: metadata typing, magic sniffing, mapInPandas decode
contract (stubbed codec), frame-sample fan-out."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    frame_sample_plan,
    with_media_metadata,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"x" * 40
JPG = b"\xff\xd8\xff\xe0" + b"y" * 30
PDF = b"%PDF-1.7 " + b"z" * 20
BIN = b"\x00\x01\x02\x03rawbytes"


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "/img/a.png", bytearray(PNG)),
        (2, "/img/b.jpg", bytearray(JPG)),
        (3, "/files/c.pdf", bytearray(PDF)),
        (4, "/blob/d", bytearray(BIN)),
    ]
    return spark.createDataFrame(rows, "doc_id long, media_ref string, payload binary")


def test_metadata_sniffing(media):
    out = with_media_metadata(media).select("doc_id", "media_meta.*").collect()
    got = {r.doc_id: (r.media_type, r.format, r.n_bytes) for r in out}
    assert got == {
        1: ("image", "png", len(PNG)),
        2: ("image", "jpg", len(JPG)),
        3: ("document", "pdf", len(PDF)),
        4: ("binary", "bin", len(BIN)),
    }
    shas = {r.sha256 for r in out}
    assert len(shas) == 4 and all(len(s) == 64 for s in shas)


def test_metadata_sniffing_av_formats(spark):
    """The r05 formats the repo actually parses sniff JVM-side too: ISO-BMFF
    (ftyp at byte 5), RIFF/WAVE (format tag at byte 9), MP3 (ID3 or frame
    sync), BMP."""
    from crawler_spark.operators.multimodal import (
        encode_bmp, encode_mp3, encode_mp4_meta, encode_wav,
    )
    import numpy as np

    rows = [
        (1, bytearray(encode_mp4_meta(b"isom", 1000, 10, [(8, 8)]))),
        (2, bytearray(encode_wav(8000, np.zeros(4, dtype=np.int16)))),
        (3, bytearray(encode_mp3(128, 44100, 1))),
        (4, bytearray(encode_mp3(128, 44100, 1, id3_bytes=30))),
        (5, bytearray(encode_bmp(2, 1, np.zeros((1, 2, 3), dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.media_type, r.format)
           for r in with_media_metadata(df).select("doc_id", "media_meta.*").collect()}
    assert got == {
        1: ("video", "mp4"), 2: ("audio", "wav"), 3: ("audio", "mp3"),
        4: ("audio", "mp3"), 5: ("image", "bmp"),
    }


def test_decode_real_rejects_corrupt_and_unknown(media):
    """fake=False dispatches to the real codecs now: the fixture's payloads
    are either corrupt (magic bytes + junk -> codec ValueError) or unknown
    formats (-> honest NotImplementedError); either way the decode fails
    loudly instead of fabricating output."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    msg = str(ei.value)
    assert (
        "NotImplementedError" in msg
        or "ValueError" in msg
        or isinstance(ei.value, Py4JJavaError)
    )


def test_fake_decode_contract(media):
    out = decode_media(media, fake=True, n_features=8)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 4
    for r in rows:
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
    # determinism: same payload -> same features
    again = {r.doc_id: r.features for r in decode_media(media, fake=True, n_features=8).collect()}
    assert {r.doc_id: r.features for r in rows} == again


def test_frame_sample_plan(media):
    df = with_media_metadata(media)
    frames = frame_sample_plan(df, every_n=10)
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    by_id = {r.doc_id: r.n for r in counts}
    meta = {r.doc_id: r.n_bytes for r in df.select("doc_id", "media_meta.n_bytes").collect()}
    for did, n in by_id.items():
        expect = (meta[did] % 300 + 30 + 9) // 10
        assert n == expect


def test_adaptive_sign_lsh_bits():
    from crawler_spark.queries_content import adaptive_n_bits

    assert adaptive_n_bits(1_000, 64) == 8       # small corpus -> 256 buckets
    assert adaptive_n_bits(4_000, 64) == 8
    assert adaptive_n_bits(100_000, 64) == 11    # ~64 rows per bucket
    assert adaptive_n_bits(10**9, 64) == 24      # capped at 16.7M buckets
    assert adaptive_n_bits(10**9, 16) == 16      # never wider than the dim


# --------------------------------------------------------------- real codecs

def test_bmp_roundtrip_padding_and_row_order():
    """Encoder writes bottom-up padded rows; decoder must undo both. w=3
    forces 3 bytes of row padding; an asymmetric pixel pattern catches a
    decoder that forgets the vertical flip."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_bmp_bytes, encode_bmp

    h, w = 2, 3
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    payload = encode_bmp(w, h, px)
    # stride = 3*3 padded to 12 -> file = 54 header + 2*12 body
    assert len(payload) == 54 + 2 * 12
    rw, rh, bpp, out = decode_bmp_bytes(payload)
    assert (rw, rh, bpp) == (w, h, 24)
    assert np.array_equal(out, px)  # top row restored as top row


def test_bmp_rejects_non_bmp():
    from crawler_spark.operators.multimodal import decode_bmp_bytes

    with pytest.raises(ValueError):
        decode_bmp_bytes(b"PNG not bmp" + b"\x00" * 64)


def test_wav_roundtrip_with_extra_chunk():
    """Decoder walks RIFF chunks by size — an unknown LIST chunk (odd size,
    word-aligned) before data must be skipped, not break the parse."""
    import struct

    import numpy as np

    from crawler_spark.operators.multimodal import decode_wav_bytes, encode_wav

    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    payload = encode_wav(22050, samples)
    rate, nch, bits, out = decode_wav_bytes(payload)
    assert (rate, nch, bits) == (22050, 1, 16)
    assert np.array_equal(out, samples)

    # splice an odd-sized junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    rate2, _, _, out2 = decode_wav_bytes(spliced)
    assert rate2 == 22050
    assert np.array_equal(out2, samples)


def test_decode_bmp_dataframe(spark):
    """mapInPandas path: real decode of per-row synthesized BMPs; int64-safe
    means (255 everywhere -> mean exactly 255.0)."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_bmp, encode_bmp

    white = encode_bmp(2, 2, np.full((2, 2, 3), 255, dtype=np.uint8))
    grad = encode_bmp(4, 1, np.arange(12, dtype=np.uint8).reshape(1, 4, 3))
    df = spark.createDataFrame(
        [(1, bytearray(white)), (2, bytearray(grad))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_bmp(df).collect()}
    assert rows[1]["mean_b"] == 255.0 and rows[1]["width"] == 2
    assert rows[2]["mean_b"] == pytest.approx((0 + 3 + 6 + 9) / 4)
    assert rows[2]["mean_r"] == pytest.approx((2 + 5 + 8 + 11) / 4)


def test_decode_wav_dataframe(spark):
    """mapInPandas path: RMS/mean must be computed in int64 (an int16
    accumulator overflows on full-scale samples)."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_wav, encode_wav

    s = np.array([-32768, -32768, 32767, 32767], dtype=np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(8000, s)))], "doc_id long, payload binary"
    )
    r = decode_wav(df).collect()[0]
    assert r["n_samples"] == 4 and r["sample_rate"] == 8000
    assert r["mean_amp"] == pytest.approx(-0.5)
    assert r["rms"] == pytest.approx(np.sqrt((2 * 32768.0**2 + 2 * 32767.0**2) / 4))


def test_png_roundtrip_all_filters():
    """Encoder cycles filter types y % 5, so a 10-row image exercises every
    filter twice; the decoder must reconstruct the exact pixel array."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_png_bytes, encode_png

    rng = np.random.RandomState(3)
    for w, h in [(1, 1), (2, 10), (17, 6), (5, 12)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        w2, h2, ct, out = decode_png_bytes(encode_png(w, h, px))
        assert (w2, h2, ct) == (w, h, 2)
        assert np.array_equal(out, px), (w, h)


def test_png_multi_idat_and_crc():
    """The DEFLATE stream must be reassembled across IDAT chunk boundaries;
    a flipped payload byte must fail the chunk CRC, not decode garbage."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_png_bytes, encode_png

    px = np.arange(9 * 8 * 3, dtype=np.uint8).reshape(8, 9, 3) % 256
    payload = encode_png(9, 8, px, idat_split=16)
    assert payload.count(b"IDAT") > 1
    assert np.array_equal(decode_png_bytes(payload)[3], px)

    corrupt = bytearray(payload)
    corrupt[len(corrupt) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png_bytes(bytes(corrupt))


def test_png_rejects_unsupported():
    import numpy as np

    from crawler_spark.operators.multimodal import decode_png_bytes, encode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_bytes(b"BM" + b"\x00" * 40)
    # flip IHDR color type to greyscale (and fix its CRC) -> explicit refusal
    import struct
    import zlib

    payload = bytearray(encode_png(3, 3, np.zeros((3, 3, 3), dtype=np.uint8)))
    ihdr_off = 8
    body = bytearray(payload[ihdr_off + 8 : ihdr_off + 8 + 13])
    body[9] = 0  # color type: truecolor -> greyscale
    crc = zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF
    payload[ihdr_off + 8 : ihdr_off + 8 + 13] = body
    payload[ihdr_off + 21 : ihdr_off + 25] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="truecolor"):
        decode_png_bytes(bytes(payload))


def test_decode_png_dataframe(spark):
    """mapInPandas path: real decode of per-row synthesized PNGs with exact
    channel means (RGB order — a BGR-confused decoder fails)."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_png, encode_png

    white = encode_png(2, 2, np.full((2, 2, 3), 255, dtype=np.uint8))
    grad = encode_png(4, 1, np.arange(12, dtype=np.uint8).reshape(1, 4, 3))
    df = spark.createDataFrame(
        [(1, bytearray(white)), (2, bytearray(grad))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_png(df).collect()}
    assert rows[1]["mean_r"] == 255.0 and rows[1]["width"] == 2
    assert rows[2]["mean_r"] == pytest.approx((0 + 3 + 6 + 9) / 4)
    assert rows[2]["mean_b"] == pytest.approx((2 + 5 + 8 + 11) / 4)


def test_png_hostile_inputs_raise_valueerror():
    """The documented contract is ValueError for any malformed payload: a
    lying chunk length, a truncation, and an IDAT stream that inflates past
    the IHDR-promised size (zlib bomb) must all be rejected cleanly — not
    leak struct.error or allocate unbounded memory."""
    import struct
    import zlib

    import numpy as np

    from crawler_spark.operators.multimodal import (
        _png_chunk, _PNG_SIG, decode_png_bytes, encode_png,
    )

    good = encode_png(4, 4, np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_png_bytes(good[:30])
    # corrupt an IDAT length field to a huge value (CRC never reached)
    idat_off = good.index(b"IDAT") - 4
    lied = bytearray(good)
    lied[idat_off : idat_off + 4] = struct.pack(">I", 0xFFFF)
    with pytest.raises(ValueError, match="truncated|CRC"):
        decode_png_bytes(bytes(lied))
    # zlib bomb: IHDR promises 2x2 but IDAT inflates to ~1 MB; the bounded
    # decompressobj must stop at the promised size + 1, not inflate it all
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb_stream = zlib.compress(b"\x00" * 1_000_000, 9)
    bomb = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", bomb_stream)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="does not match dimensions"):
        decode_png_bytes(bomb)
    # non-DEFLATE IDAT bytes -> corrupt-stream ValueError, not zlib.error
    junk = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", b"\xff" * 8)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt DEFLATE"):
        decode_png_bytes(junk)


def test_decode_dimension_ceiling():
    """Header-claimed dimensions are attacker-controlled: a PNG whose IHDR
    (u32 fields) claims e.g. 100k x 100k would demand a ~30 GB inflate, and
    a GIF logical screen of 65535x65535 a ~4.3 GB allocation — both before
    any pixel data is validated. The absolute MAX_DECODE_PIXELS ceiling must
    reject them without allocating."""
    import struct
    import zlib

    from crawler_spark.operators.multimodal import (
        _png_chunk, _PNG_SIG, decode_gif_bytes, decode_png_bytes,
    )

    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_png_bytes(bomb)
    # zero-dim PNG is rejected too (guard precedes the inflate)
    zhdr = struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0)
    zero = (
        _PNG_SIG + _png_chunk(b"IHDR", zhdr)
        + _png_chunk(b"IDAT", zlib.compress(b""))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="non-positive"):
        decode_png_bytes(zero)
    # GIF: logical screen 65535x65535 with a global palette flag set
    gif = (
        b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
        + b"\x00" * 6  # 2-entry global color table
    )
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_gif_bytes(gif)


def _std_palette():
    import numpy as np

    return np.stack(
        [np.arange(256), (2 * np.arange(256)) % 256, (3 * np.arange(256)) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_gif_roundtrip_lzw():
    """Real LZW compression round-trips exactly, including the KwKwK corner
    (immediately repeated pattern), multi-sub-block streams (>255 bytes of
    codes), and dictionary overflow + re-CLEAR (>4095 entries)."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_gif_bytes, encode_gif

    pal = _std_palette()
    rng = np.random.RandomState(5)
    for w, h in [(1, 1), (9, 4), (61, 33)]:
        idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
        W, H, nc, px = decode_gif_bytes(encode_gif(w, h, idx, pal))
        assert (W, H, nc) == (w, h, 256)
        assert np.array_equal(px, pal[idx]), (w, h)
    # KwKwK: runs of one symbol force code == next_free on decode
    idx = np.zeros((20, 30), dtype=np.uint8)
    assert np.array_equal(
        decode_gif_bytes(encode_gif(30, 20, idx, pal))[3], pal[idx]
    )
    # dictionary overflow: large low-entropy image crosses 4095 codes
    idx = (rng.randint(0, 3, (150, 200)) * 80).astype(np.uint8)
    assert np.array_equal(
        decode_gif_bytes(encode_gif(200, 150, idx, pal))[3], pal[idx]
    )


def test_gif_skips_extensions_and_rejects_unsupported():
    import numpy as np

    from crawler_spark.operators.multimodal import decode_gif_bytes, encode_gif

    pal = _std_palette()
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = encode_gif(4, 3, idx, pal)
    # splice a graphics-control extension after the GCT (13 + 768 bytes in)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = payload[: 13 + 768] + gce + payload[13 + 768 :]
    assert np.array_equal(decode_gif_bytes(spliced)[3], pal[idx])

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_bytes(b"PNG" + b"\x00" * 30)
    # interlace flag set (and nothing else changed) -> explicit refusal
    bad = bytearray(payload)
    desc = 13 + 768  # image descriptor offset
    assert bad[desc] == 0x2C
    bad[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif_bytes(bytes(bad))
    with pytest.raises(ValueError):
        decode_gif_bytes(payload[:40])  # truncated


def test_decode_gif_dataframe(spark):
    import numpy as np

    from crawler_spark.operators.multimodal import decode_gif, encode_gif

    pal = _std_palette()
    solid = encode_gif(2, 2, np.full((2, 2), 10, dtype=np.uint8), pal)
    df = spark.createDataFrame([(1, bytearray(solid))],
                               "doc_id long, payload binary")
    r = decode_gif(df).collect()[0]
    assert (r["width"], r["height"], r["n_colors"]) == (2, 2, 256)
    assert r["mean_r"] == 10.0 and r["mean_g"] == 20.0 and r["mean_b"] == 30.0


def test_real_decode_wav_dispatch(spark):
    """Review finding: the real-decode dispatcher documented WAV but had no
    RIFF/WAVE branch — audio in a mixed media table raised
    NotImplementedError despite the in-repo codec."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_media, encode_wav

    samples = ((np.arange(64) * 7919) % 65536 - 32768).astype(np.int16)
    df = spark.createDataFrame(
        [(1, "/a.wav", bytearray(encode_wav(16000, samples)))],
        "doc_id long, media_ref string, payload binary",
    )
    r = decode_media(df, fake=False).head()
    assert (r.width, r.height, r.n_channels) == (64, 1, 1)
    assert abs(sum(r.features) - 1.0) < 1e-6


def test_real_decode_errors_null_isolates_rows(spark):
    """Review finding: one hostile payload among millions must not kill the
    stage — errors='null' degrades the failing row to null dims/features
    while good rows decode."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_media, encode_png

    y, x = np.mgrid[0:4, 0:6]
    good = encode_png(
        6, 4, np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256], -1
                       ).astype(np.uint8)
    )
    rows = [
        (1, "/good.png", bytearray(good)),
        (2, "/trunc.png", bytearray(good[:20])),   # corrupt known format
        (3, "/video.mp4", bytearray(b"\x00\x00\x00 ftypmp42--")),  # unknown
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_ref string, payload binary"
    ).coalesce(1)
    out = {r.doc_id: r for r in decode_media(df, fake=False, errors="null").collect()}
    assert (out[1].width, out[1].height) == (6, 4)
    assert out[2].width is None and out[2].features is None
    assert out[3].width is None
    # default stays fail-fast
    with pytest.raises(Exception):
        decode_media(df, fake=False).collect()


def test_bmp_rejects_nonpositive_dims():
    """Review finding: BMP skipped the decode-dims guard — a negative i32
    width reshaped into garbage instead of raising."""
    import struct

    from crawler_spark.operators.multimodal import decode_bmp_bytes, encode_bmp

    good = bytearray(encode_bmp(4, 3, __import__("numpy").zeros((3, 4, 3), dtype="uint8")))
    struct.pack_into("<i", good, 18, -1)
    with pytest.raises(ValueError, match="non-positive"):
        decode_bmp_bytes(bytes(good))


# ---------------------------------------------------------- real resample

def test_box_weights_exact():
    """Integer overlap weights: rows sum to n_in; upsample 2->3 has the
    half-overlap middle row; downsample 4->2 is pure 2:1 binning."""
    import numpy as np

    from crawler_spark.operators.multimodal import box_weights

    assert (box_weights(2, 3) == np.array([[2, 0], [1, 1], [0, 2]])).all()
    assert (box_weights(4, 2) == np.array([[2, 2, 0, 0], [0, 0, 2, 2]])).all()
    for n_in, n_out in [(7, 3), (3, 7), (5, 5), (1, 4)]:
        w = box_weights(n_in, n_out)
        assert w.shape == (n_out, n_in)
        assert (w.sum(axis=1) == n_in).all()


def test_resample_plane_matches_bruteforce_area_average():
    """The exact area-average against a float brute force over back-projected
    boxes — catches axis flips, misweighted partial overlaps, off-by-ones."""
    import numpy as np

    from crawler_spark.operators.multimodal import resample_plane

    rng = np.random.default_rng(7)
    for (h, w, oh, ow) in [(5, 7, 2, 3), (2, 2, 3, 3), (6, 4, 6, 4), (1, 9, 1, 2)]:
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = resample_plane(a, ow, oh)[:, :, 0]
        sy, sx = h / oh, w / ow
        for i in range(oh):
            for j in range(ow):
                tot = wsum = 0.0
                for y in range(h):
                    for x in range(w):
                        oy = max(0.0, min((i + 1) * sy, y + 1) - max(i * sy, y))
                        ox = max(0.0, min((j + 1) * sx, x + 1) - max(j * sx, x))
                        tot += oy * ox * float(a[y, x])
                        wsum += oy * ox
                assert abs(got[i, j] - tot / wsum) < 1e-9


def test_resize_media_real_pixels(spark):
    """resize_media(fake=False) end-to-end over a real encoded BMP: decode,
    fit-box dims, and resampled channel means equal the integer-numerator
    formula (no PIL, no stub)."""
    import numpy as np

    from crawler_spark.operators.multimodal import (
        box_weights,
        encode_bmp,
        fit_box,
        resize_media,
    )

    h, w = 5, 7
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(3 * x + 7 * y) % 256, (5 * x + 11 * y) % 256,
                   (x + 13 * y) % 256], axis=-1).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(w, h, px)))], "doc_id long, payload binary"
    )
    row = resize_media(df, target=3, fake=False).collect()[0]
    ow, oh = fit_box(w, h, 3)
    assert (row.width, row.height, row.out_width, row.out_height) == (w, h, ow, oh)
    wy, wx = box_weights(h, oh), box_weights(w, ow)
    for c, got in enumerate([row.out_mean_c0, row.out_mean_c1, row.out_mean_c2]):
        num = (wy[:, :, None, None] * wx[None, None, :, :]
               * px[None, :, None, :, c].astype(np.int64)).sum()
        assert got == num / (w * h * ow * oh)


# ------------------------------------------------------ MP4 metadata parse

def test_mp4_meta_roundtrip_and_v1_mvhd():
    """Box walk reads ftyp brand, mvhd timescale/duration (both version 0
    and the 64-bit version 1 layout), counts traks, and converts the 16.16
    fixed-point tkhd dims — max over tracks."""
    from crawler_spark.operators.multimodal import encode_mp4_meta, parse_mp4_meta

    m = parse_mp4_meta(encode_mp4_meta(b"isom", 1000, 5432, [(320, 240), (640, 360)]))
    assert m == {"brand": "isom", "n_tracks": 2, "timescale": 1000,
                 "duration": 5432, "duration_ms": 5432, "width": 640, "height": 360}
    big = (1 << 32) + 90000
    m1 = parse_mp4_meta(
        encode_mp4_meta(b"mp42", 90000, big, [(1920, 1080)], wide_mvhd=True)
    )
    assert m1["duration"] == big and m1["duration_ms"] == big * 1000 // 90000
    assert (m1["width"], m1["height"]) == (1920, 1080)


def test_mp4_meta_hostile_inputs():
    """Attacker-controlled size fields: overrunning box, sub-header size,
    box-count bomb, nesting bomb, and non-MP4 magic all fail loudly before
    any unbounded loop or allocation."""
    import struct

    import pytest as _pytest

    from crawler_spark.operators.multimodal import (
        MAX_MP4_BOXES,
        encode_mp4_meta,
        parse_mp4_meta,
    )

    good = encode_mp4_meta(b"isom", 1000, 100, [(8, 8)])
    with _pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(good + struct.pack(">I4s", 1 << 30, b"free"))
    with _pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(good + struct.pack(">I4s", 4, b"free"))
    with _pytest.raises(ValueError, match="ISO-BMFF"):
        parse_mp4_meta(b"notanmp4file....")
    # box-count bomb: ftyp + 10001 minimal 'free' boxes
    bomb = good[:20] + struct.pack(">I4s", 8, b"free") * (MAX_MP4_BOXES + 1)
    with _pytest.raises(ValueError, match="box count"):
        parse_mp4_meta(bomb)
    # nesting bomb: trak-in-trak 12 deep
    inner = struct.pack(">I4s", 8, b"free")
    for _ in range(12):
        inner = struct.pack(">I4s", 8 + len(inner), b"trak") + inner
    with _pytest.raises(ValueError, match="nesting"):
        parse_mp4_meta(good[:20] + struct.pack(">I4s", 8 + len(inner), b"moov") + inner)


def test_parse_mp4_dataframe(spark):
    """parse_mp4 mapInPandas contract over two encoded containers."""
    from crawler_spark.operators.multimodal import encode_mp4_meta, parse_mp4

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_mp4_meta(b"isom", 1000, 2000, [(64, 48)]))),
            (2, bytearray(encode_mp4_meta(b"mp42", 600, 90, [(32, 32), (16, 64)]))),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in parse_mp4(df).collect()}
    assert (got[1].width, got[1].height, got[1].duration_ms) == (64, 48, 2000)
    assert (got[2].n_tracks, got[2].width, got[2].height, got[2].duration_ms) == (2, 32, 64, 150)


# ------------------------------------------------------- MP3 frame metadata

def test_mp3_meta_roundtrip_and_id3_skip():
    from crawler_spark.operators.multimodal import encode_mp3, parse_mp3_meta

    m = parse_mp3_meta(encode_mp3(128, 44100, 25))
    assert m == {"bitrate_kbps": 128, "sample_rate": 44100, "n_frames": 25,
                 "duration_ms": 25 * 1152 * 1000 // 44100}
    # ID3v2 tag (syncsafe size crossing a 7-bit boundary) must be skipped
    m2 = parse_mp3_meta(encode_mp3(320, 32000, 7, id3_bytes=200))
    assert (m2["bitrate_kbps"], m2["n_frames"]) == (320, 7)


def test_mp3_meta_hostile_inputs():
    import pytest as _pytest

    from crawler_spark.operators.multimodal import encode_mp3, parse_mp3_meta

    with _pytest.raises(ValueError, match="frame sync"):
        parse_mp3_meta(b"\x00" * 64)
    with _pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3_meta(b"")
    # a free-format frame (bitrate index 0) must be rejected, not loop
    bad = bytearray(encode_mp3(128, 44100, 2))
    bad[2] = 0x00  # bitrate index 0, samplerate index 0
    with _pytest.raises(ValueError, match="invalid bitrate"):
        parse_mp3_meta(bytes(bad))
    # mid-stream garbage after a valid frame
    good = encode_mp3(64, 48000, 1)
    with _pytest.raises(ValueError, match="frame sync"):
        parse_mp3_meta(good + b"nonsense-bytes")


def test_parse_mp3_dataframe(spark):
    from crawler_spark.operators.multimodal import encode_mp3, parse_mp3

    df = spark.createDataFrame(
        [(1, bytearray(encode_mp3(192, 48000, 40)))],
        "doc_id long, payload binary",
    )
    r = parse_mp3(df).collect()[0]
    assert (r.bitrate_kbps, r.sample_rate, r.n_frames) == (192, 48000, 40)
    assert r.duration_ms == 40 * 1152 * 1000 // 48000


def test_frame_sample_plan_from_real_meta(spark):
    """Sampling indices derive from the REAL mvhd duration: 10 s at 25 fps
    sampled every 2 s -> frames 0,50,100,150,200; a zero-duration container
    keeps its poster frame."""
    from crawler_spark.operators.multimodal import (
        encode_mp4_meta, frame_sample_plan_from_meta, parse_mp4,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_mp4_meta(b"isom", 1000, 10_000, [(64, 48)]))),
            (2, bytearray(encode_mp4_meta(b"isom", 1000, 0, [(32, 32)]))),
        ],
        "doc_id long, payload binary",
    )
    frames = frame_sample_plan_from_meta(parse_mp4(df), fps=25.0, every_s=2.0)
    got = {}
    for r in frames.collect():
        got.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(got[1]) == [0, 50, 100, 150, 200]
    assert got[2] == [0]
