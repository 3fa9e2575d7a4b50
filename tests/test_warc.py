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


def test_header_without_space_after_colon_parses():
    """WARC/1.1 §4 makes the whitespace after the field colon optional;
    third-party archives legally emit "name:value" (and "name : value"),
    so the parser must split on the colon alone and strip OWS."""
    rec = build_warc_record("resource", {}, b"payload!")
    # rewrite every "k: v" header line to "k:v" (payload is length-framed
    # and contains no CRLF, so the header block is everything before the
    # first CRLFCRLF)
    head, sep, rest = rec.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    squeezed = [lines[0]] + [ln.replace(b": ", b":", 1) for ln in lines[1:]]
    recs = parse_warc_bytes(b"\r\n".join(squeezed) + sep + rest)
    assert recs[0]["payload"] == b"payload!"
    assert recs[0]["headers"]["content-length"] == "8"
    # and padded whitespace around the value is stripped
    padded = [lines[0]] + [ln.replace(b": ", b":   ", 1) + b"  " for ln in lines[1:]]
    recs = parse_warc_bytes(b"\r\n".join(padded) + sep + rest)
    assert recs[0]["headers"]["content-length"] == "8"


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


class TestWarcExport:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            (f"https://portal{i % 3}.go.id/putusan/{i}",
             f"<html><body>putusan {i}</body></html>", i % 5)
            for i in range(40)
        ]
        return spark.createDataFrame(
            rows, "url_norm string, raw_html string, fetched_round int"
        )

    def test_export_verify_and_roundtrip(self, spark, pages, tmp_path):
        from crawler_spark.operators.warc import (
            export_warc_segments, verify_warc_export,
        )

        out = str(tmp_path / "warc")
        man = export_warc_segments(pages, out, n_segments=4)
        assert man["total_records"] == 40 + len(man["segments"])  # + warcinfo
        v = verify_warc_export(out)
        assert v["ok"], v["problems"]
        # every page body comes back intact through the real reader
        import glob

        got = {}
        for path in glob.glob(f"{out}/segment-*.warc.gz"):
            for rec in parse_warc_bytes(open(path, "rb").read()):
                if rec["rec_type"] == "response":
                    st, body = split_http_payload(rec["payload"])
                    assert st == 200
                    got[rec["headers"]["warc-target-uri"]] = body.decode()
        want = {r["url_norm"]: r["raw_html"] for r in pages.collect()}
        assert got == want

    def test_reexport_is_byte_identical(self, spark, pages, tmp_path):
        import glob
        import hashlib

        from crawler_spark.operators.warc import export_warc_segments

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        export_warc_segments(pages, a, n_segments=4)
        export_warc_segments(pages, b, n_segments=4)
        da = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
              for p in glob.glob(f"{a}/segment-*")}
        db = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
              for p in glob.glob(f"{b}/segment-*")}
        assert da == db and da

    def test_verify_detects_tampering(self, spark, pages, tmp_path):
        import glob

        from crawler_spark.operators.warc import (
            export_warc_segments, verify_warc_export,
        )

        out = str(tmp_path / "w")
        export_warc_segments(pages, out, n_segments=2)
        victim = sorted(glob.glob(f"{out}/segment-*.warc.gz"))[0]
        blob = bytearray(open(victim, "rb").read())
        blob[len(blob) // 2] ^= 0xFF
        open(victim, "wb").write(bytes(blob))
        v = verify_warc_export(out)
        assert not v["ok"] and any("digest" in p for p in v["problems"])

    def test_null_url_refused(self, spark, tmp_path):
        from crawler_spark.operators.warc import export_warc_segments

        df = spark.createDataFrame(
            [(None, "x", 0)],
            "url_norm string, raw_html string, fetched_round int",
        )
        with pytest.raises(ValueError, match="NULL"):
            export_warc_segments(df, str(tmp_path / "n"))


def test_header_injection_refused():
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc_record(
            "response", {"X": "v\r\nWARC-Type: warcinfo"}, b"p"
        )
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc_record("res\r\nponse", {}, b"p")


def test_gzip_bomb_bounded():
    """A small .warc.gz inflating past the cap raises, never OOMs."""
    import gzip

    from crawler_spark.operators.warc import _inflate_members

    bomb = gzip.compress(b"\x00" * 4_000_000, 9)
    with pytest.raises(ValueError, match="bomb"):
        _inflate_members(bomb, max_bytes=1_000_000)
    # under the cap: inflates fine
    assert len(_inflate_members(bomb, max_bytes=8_000_000)) == 4_000_000


def test_reexport_overwrites_stale_segments(spark, tmp_path):
    """Fewer segments on re-export must not leave stale files behind."""
    from crawler_spark.operators.warc import (
        export_warc_segments, verify_warc_export,
    )

    rows = [(f"https://p.go.id/d/{i}", f"<html>{i}</html>", 0)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "url_norm string, raw_html string, fetched_round int"
    )
    out = str(tmp_path / "re")
    export_warc_segments(df, out, n_segments=8)
    export_warc_segments(df.limit(4), out, n_segments=2)
    v = verify_warc_export(out)
    assert v["ok"], v["problems"]


def test_duplicate_urls_export_deterministically(spark, tmp_path):
    """Same URL captured twice (different rounds/bodies): byte-identical
    re-export must hold — full-row sort key, not arrival order."""
    import glob
    import hashlib

    from crawler_spark.operators.warc import export_warc_segments

    rows = [("https://p.go.id/a", f"<html>rev{i}</html>", i)
            for i in range(6)] * 2
    df = spark.createDataFrame(
        rows, "url_norm string, raw_html string, fetched_round int"
    ).repartition(6)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_warc_segments(df, a, n_segments=2)
    export_warc_segments(df, b, n_segments=2)
    da = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
          for p in glob.glob(f"{a}/segment-*")}
    db = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest()
          for p in glob.glob(f"{b}/segment-*")}
    assert da == db and da


def test_null_body_refused(spark, tmp_path):
    from crawler_spark.operators.warc import export_warc_segments

    df = spark.createDataFrame(
        [("https://p.go.id/x", None, 0)],
        "url_norm string, raw_html string, fetched_round int",
    )
    with pytest.raises(ValueError, match="NULL"):
        export_warc_segments(df, str(tmp_path / "nb"))
