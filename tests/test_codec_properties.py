"""Property tests for the from-scratch codec kernels (pure Python — no
Spark session): any pixel/index array must survive encode -> decode
byte-exactly, across every PNG filter mix and every LZW dictionary shape
(growth, KwKwK, overflow re-CLEAR, sub-block splits)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.multimodal import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_bytes,
    decode_png_bytes,
    encode_gif,
    encode_png,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 16))


@settings(max_examples=40, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(dims, seed):
    w, h = dims
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    w2, h2, ct, out = decode_png_bytes(encode_png(w, h, px))
    assert (w2, h2, ct) == (w, h, 2)
    assert np.array_equal(out, px)


@settings(max_examples=40, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31 - 1),
       n_colors=st.integers(1, 256))
def test_gif_roundtrip_property(dims, seed, n_colors):
    """Low-entropy palettes (n_colors small) drive deep LZW dictionaries
    and the KwKwK path; high-entropy ones drive literal-heavy streams."""
    w, h = dims
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, n_colors, (h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    w2, h2, nc, out = decode_gif_bytes(encode_gif(w, h, idx, pal))
    assert (w2, h2, nc) == (w, h, 256)
    assert np.array_equal(out, pal[idx])


@settings(max_examples=60, deadline=None)
@given(
    seq=st.lists(st.integers(0, 255), min_size=1, max_size=600),
    min_code=st.integers(2, 8),
)
def test_lzw_roundtrip_any_min_code(seq, min_code):
    """The raw LZW pair round-trips at EVERY min_code_size — including the
    table-boundary/byte-aligned EOI corner the review pass constructed."""
    seq = [v % (1 << min_code) for v in seq]
    out = _lzw_decode(_lzw_encode(seq, min_code), min_code, len(seq))
    assert list(out) == seq


@settings(max_examples=30, deadline=None)
@given(
    blocks=st.tuples(st.integers(1, 4), st.integers(1, 3)),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_constant_blocks_exact_property(blocks, seed):
    """Any constant-per-8x8-block grayscale image round-trips EXACTLY at
    q=1 (single integer DCT coefficient per block) — the invariant the
    multimodal_decode_jpg oracle is built on. Exercises the DC-diff chain
    (arbitrary positive/negative jumps) and EOB-only AC coding."""
    from crawler_spark.kernels.jpeg import decode_jpeg_bytes, encode_jpeg

    bw, bh = blocks
    vals = np.random.RandomState(seed).randint(0, 256, (bh, bw))
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    w, h, nc, out = decode_jpeg_bytes(encode_jpeg(img))
    assert (w, h, nc) == (8 * bw, 8 * bh, 1)
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 40), st.integers(1, 28)),
    seed=st.integers(0, 2**31 - 1),
    rst=st.integers(0, 3),
)
def test_jpeg_random_gray_bounded_property(dims, seed, rst):
    """Arbitrary grayscale content (any dims, cropped non-multiples of 8,
    optional restart markers) decodes within the q=1 coefficient-rounding
    bound — the full Huffman AC path (runs, ZRL, every size class) under
    random coefficients."""
    from crawler_spark.kernels.jpeg import decode_jpeg_bytes, encode_jpeg

    w, h = dims
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    w2, h2, nc, out = decode_jpeg_bytes(encode_jpeg(img, restart_interval=rst))
    assert (w2, h2, nc) == (w, h, 1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


# ------------------------------------------------ r05 kernels: properties

@settings(max_examples=40, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    out_dims=st.tuples(st.integers(1, 12), st.integers(1, 12)),
    seed=st.integers(0, 2**31 - 1),
)
def test_resample_plane_properties(dims, out_dims, seed):
    """Any dims pair, both directions: weights conserve mass (constant image
    -> exactly constant output), output bounded by input range, and the
    global integer-weighted mean is preserved exactly."""
    from crawler_spark.operators.multimodal import box_weights, resample_plane

    h, w = dims
    oh, ow = out_dims
    a = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    out = resample_plane(a, ow, oh)[:, :, 0]
    assert out.shape == (oh, ow)
    assert out.min() >= a.min() - 1e-9 and out.max() <= a.max() + 1e-9
    c = np.full((h, w), 201, np.uint8)
    assert np.array_equal(resample_plane(c, ow, oh)[:, :, 0],
                          np.full((oh, ow), 201.0))
    # mass conservation: the area-weighted mean of the output equals the
    # input mean exactly in the integer domain
    wy, wx = box_weights(h, oh), box_weights(w, ow)
    num = (wy[:, :, None, None] * wx[None, None, :, :]
           * a[None, :, None, :].astype(np.int64)).sum()
    assert num == a.astype(np.int64).sum() * oh * ow


@settings(max_examples=40, deadline=None)
@given(
    n_tracks=st.integers(1, 4),
    timescale=st.integers(1, 10**6),
    duration=st.integers(0, 2**40),
    dims=st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=4, max_size=4,
    ),
    brand=st.sampled_from([b"isom", b"mp42", b"avc1", b"M4V "]),
)
def test_mp4_meta_roundtrip_property(n_tracks, timescale, duration, dims, brand):
    """Arbitrary track/timing parameters round-trip through the box walk:
    v1 mvhd is auto-exercised whenever the duration needs 64 bits."""
    from crawler_spark.operators.multimodal import encode_mp4_meta, parse_mp4_meta

    track_dims = dims[:n_tracks]
    wide = duration > 0xFFFFFFFF
    m = parse_mp4_meta(
        encode_mp4_meta(brand, timescale, duration, track_dims, wide_mvhd=wide)
    )
    assert m["brand"] == brand.decode("ascii")
    assert m["n_tracks"] == n_tracks
    assert (m["timescale"], m["duration"]) == (timescale, duration)
    assert m["duration_ms"] == duration * 1000 // timescale
    assert m["width"] == max(w for w, _ in track_dims)
    assert m["height"] == max(h for _, h in track_dims)


_JSON_SCALARS = st.one_of(
    st.none(), st.booleans(), st.integers(-10**9, 10**9),
    st.text(st.characters(blacklist_characters="<&", codec="utf-8"),
            max_size=12),
)
_JSON_VALUES = st.recursive(
    _JSON_SCALARS,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(st.characters(whitelist_categories=("Ll",), codec="ascii"),
                    min_size=1, max_size=8),
            children, max_size=4,
        ),
    ),
    max_leaves=20,
)


@settings(max_examples=60, deadline=None)
@given(doc=st.dictionaries(
    st.text(st.characters(whitelist_categories=("Ll",), codec="ascii"),
            min_size=1, max_size=8),
    _JSON_VALUES, max_size=6,
))
def test_jsonld_flatten_total_on_arbitrary_json(doc):
    """flatten_jsonld never throws on arbitrary JSON (the hostile-page
    contract), respects the row cap, and every scalar leaf within the depth
    bound appears exactly once with its canonical value."""
    import json as _json

    from crawler_spark.kernels.jsonld import MAX_ROWS_PER_PAGE, flatten_jsonld

    html = ('<script type="application/ld+json">'
            + _json.dumps(doc) + "</script>")
    rows = flatten_jsonld(html)
    assert len(rows) <= MAX_ROWS_PER_PAGE
    for r in rows:
        assert r[0] == 0 and r[1] == 0
        assert r[5] is None or isinstance(r[5], str)
    # depth-1 scalar fields (other than @type) must each appear exactly once
    for k, v in doc.items():
        if k == "@type" or isinstance(v, (dict, list)):
            continue
        hits = [r for r in rows if r[3] == k]
        assert len(hits) == 1
