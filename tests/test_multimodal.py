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


def test_decode_stub_raises_without_fake(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


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
