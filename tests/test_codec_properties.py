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
