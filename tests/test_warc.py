"""WARC codec (ISO 28500): framing, gzip members, HTTP split, hostile input."""

from __future__ import annotations

import pytest

from crawler_spark.operators.warc import (
    build_warc,
    build_warc_record,
    parse_warc_bytes,
    split_http_payload,
    warc_records,
)


def _two_records():
    info = build_warc_record(
        "warcinfo", {"WARC-Record-ID": "<urn:uuid:1>"}, b"software: lexi-spark"
    )
    resp = build_warc_record(
        "response",
        {"WARC-Target-URI": "https://p.go.id/x"},
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\nmissing",
    )
    return info, resp


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    arc = build_warc(list(_two_records()), gzip_per_record=gz)
    recs = parse_warc_bytes(arc)
    assert [r["rec_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[0]["payload"] == b"software: lexi-spark"
    assert recs[0]["headers"]["content-length"] == "20"
    st, body = split_http_payload(recs[1]["payload"])
    assert st == 404 and body == b"missing"
    # digest header is derived, labelled, and correct
    import hashlib

    want = hashlib.sha256(recs[1]["payload"]).hexdigest()
    assert recs[1]["headers"]["warc-payload-digest"] == f"sha-256:{want}"


def test_payload_containing_crlf_crlf_is_sliced_by_length():
    """Content-Length framing, not delimiter scanning: a payload embedding
    the record separator bytes must round-trip intact."""
    tricky = b"a\r\n\r\nb\r\n\r\nc"
    rec = build_warc_record("resource", {}, tricky)
    assert parse_warc_bytes(rec)[0]["payload"] == tricky


def test_hostile_inputs_raise_valueerror():
    info, resp = _two_records()
    arc = build_warc([info, resp])
    with pytest.raises(ValueError, match="separator|truncated"):
        parse_warc_bytes(arc[:-6])
    with pytest.raises(ValueError, match="version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    gz = build_warc([info], gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_bytes(gz[: len(gz) // 2])
    # derived headers cannot be caller-forged
    with pytest.raises(ValueError, match="derived"):
        build_warc_record("response", {"Content-Length": "9999"}, b"x")


def test_warc_records_dataframe(spark):
    info, resp = _two_records()
    plain = build_warc([info, resp])
    gz = build_warc([info, resp], gzip_per_record=True)
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(gz))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        ((r["doc_id"], r["rec_idx"], r["rec_type"], r["http_status"])
         for r in warc_records(df).collect())
    )
    assert rows == [
        (1, 0, "warcinfo", None), (1, 1, "response", 404),
        (2, 0, "warcinfo", None), (2, 1, "response", 404),
    ]
