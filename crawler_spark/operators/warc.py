"""WARC (ISO 28500 / WARC/1.1) read + write: the standard container for
web-crawl archives (Common Crawl, Internet Archive, Heritrix all speak it).

The reference persists pages to Postgres + GCS blobs (crawler/services/
storage.py) and has no archive format; at 100 TB the crawl's interchange
format IS WARC — fetched pages land in .warc.gz segments, and training-data
ingestion starts by parsing them. Both directions are implemented here from
the published spec with stdlib only:

  * `build_warc_record` / `build_warc` — WARC/1.1 records (named headers,
    exact Content-Length framing, sha-256-labelled payload digests per
    spec §5.9's open algorithm label) with optional PER-RECORD gzip
    members (the Common Crawl layout: a .warc.gz is a concatenation of
    independently-gzipped records, so a reader can seek to any member).
  * `parse_warc_bytes` — record walk over plain OR multi-member-gzip
    archives (member-wise inflate via zlib wbits=31 + unused_data — no
    temp files), strict \\r\\n framing, Content-Length-driven payload
    slicing, 4-byte record separator check.
  * `warc_records(df)` — mapInPandas: one archive blob per input row ->
    one output row per contained record (shuffle-free map; archives are
    independently parseable, the property that makes WARC ingestion
    embarrassingly parallel — at scale each executor task takes whole
    .warc.gz segments).

Scale notes: a real ingest points spark.read.format("binaryFile") (or a
manifest of segment paths) at the archive store and feeds this same
mapInPandas; per-record gzip means NO cross-task coupling. HTTP payload
parsing here covers the status line + header/body split — enough to feed
the span-parse pipeline with the body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CRLF = b"\r\n"

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body", T.StringType()),
    ]
)


def build_warc_record(rec_type: str, headers: dict[str, str],
                      payload: bytes) -> bytes:
    """One WARC/1.1 record: version line, named headers (Content-Length and
    WARC-Type always derived here — callers cannot desync them from the
    actual payload), blank line, payload, and the two-CRLF separator."""
    import hashlib

    def _clean(label: str, value: str) -> str:
        # CR/LF in a name or value is header injection: a crafted value
        # could append a second WARC-Type line (parse is last-wins) or
        # truncate the header block; refuse instead of emitting it
        if "\r" in value or "\n" in value:
            raise ValueError(f"CR/LF in WARC {label}: {value[:40]!r}")
        return value

    lines = [b"WARC/1.1"]
    lines.append(b"WARC-Type: " + _clean("record type", rec_type).encode())
    for k, v in headers.items():
        if k.lower() in ("warc-type", "content-length", "warc-payload-digest"):
            raise ValueError(f"derived header {k} must not be caller-supplied")
        _clean("header name", k)
        if ":" in k:
            raise ValueError(f"':' in WARC header name: {k!r}")
        lines.append(k.encode() + b": " + _clean("header value", v).encode())
    digest = hashlib.sha256(payload).hexdigest()
    lines.append(b"WARC-Payload-Digest: sha-256:" + digest.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records into an archive; gzip_per_record emits one gzip
    member per record (the seekable Common Crawl .warc.gz layout)."""
    if not gzip_per_record:
        return b"".join(records)
    import gzip

    return b"".join(gzip.compress(r, 6, mtime=0) for r in records)


MAX_INFLATED_BYTES = 1 << 30  # 1 GiB per archive blob — gzip-bomb ceiling


def _inflate_members(data: bytes, max_bytes: int = MAX_INFLATED_BYTES) -> bytes:
    """Decompress a concatenation of gzip members (zlib wbits=31 walks one
    member; unused_data carries the rest). Output is BOUNDED: a crafted
    .warc.gz inflating past max_bytes raises instead of OOMing the task —
    third-party archives are hostile input, same policy as the PNG codec's
    bounded IDAT inflate."""
    import zlib

    out = []
    total = 0
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(rest, max_bytes - total + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC: {exc}") from exc
        total += len(chunk)
        if total > max_bytes or d.unconsumed_tail:
            raise ValueError(
                f"WARC archive inflates past {max_bytes} bytes (gzip bomb?)"
            )
        out.append(chunk)
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Walk a WARC archive (plain or per-record-gzip) into record dicts:
    {rec_type, headers, payload}. Strict framing: version line, CRLF
    header block, Content-Length payload slice, CRLFCRLF separator."""
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    records = []
    pos = 0
    while pos < len(data):
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        head_lines = data[pos:head_end].split(CRLF)
        if not head_lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line: {head_lines[0][:30]!r}"
            )
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            # WARC/1.1 §4: field-name ":" [whitespace] field-value — the
            # space after the colon is optional, so split on b":" alone and
            # strip surrounding whitespace (third-party Common Crawl
            # archives legally emit "name:value")
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            headers[k.strip().decode().lower()] = v.strip().decode()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        sep = data[body_start + length : body_start + length + 4]
        if sep != CRLF + CRLF:
            raise ValueError("missing WARC record separator")
        records.append(
            {
                "rec_type": headers.get("warc-type", ""),
                "headers": headers,
                "payload": payload,
            }
        )
        pos = body_start + length + 4
    return records


def split_http_payload(payload: bytes) -> tuple[int | None, bytes]:
    """HTTP response payload -> (status, body). Non-HTTP payloads return
    (None, payload) — warcinfo/metadata records flow through unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        return None, payload
    status_line = payload[: payload.find(CRLF)].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, payload
    return status, payload[head_end + 4 :]


def warc_records(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Explode WARC archives into per-record rows via mapInPandas
    (shuffle-free; archives parse independently)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                for i, rec in enumerate(parse_warc_bytes(bytes(blob))):
                    status, body = split_http_payload(rec["payload"])
                    rows.append((
                        int(did), i, rec["rec_type"],
                        rec["headers"].get("warc-target-uri"),
                        len(rec["payload"]),
                        rec["headers"].get("warc-payload-digest"),
                        status,
                        body.decode("utf-8", "replace"),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return df.mapInPandas(_run, WARC_RECORD_SCHEMA)


def export_warc_segments(
    df: DataFrame,
    out_dir: str,
    n_segments: int = 8,
    url_col: str = "url_norm",
    body_col: str = "raw_html",
    round_col: str = "fetched_round",
) -> dict:
    """Archive crawled pages as seekable `.warc.gz` segments + a manifest —
    the full circle: crawl -> WARC -> (warc_records) -> training pipeline.

    Deterministic end to end: segment membership is a hash bucket of the
    URL, records sort by URL within a segment, gzip members carry mtime=0 —
    so re-exporting the same pages is BYTE-IDENTICAL (the property that
    makes archive diffs and dedup-by-digest meaningful). Each task writes
    its own segment (shuffle = the one repartition on segment id); the
    driver commits `_WARC_MANIFEST.json` LAST with per-segment record
    counts + file digests — the verifiable _SUCCESS marker, same contract
    as operators/export.py. Driver-reachable out_dir required (the
    SnapshotStore boundary; object stores need the cluster FS API)."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    if not df.filter(
        F.col(url_col).isNull() | F.col(body_col).isNull()
    ).isEmpty():
        raise ValueError(
            f"{url_col!r}/{body_col!r} contain NULLs — a null URL has no"
            " deterministic segment and a null body would silently archive"
            " as an empty 200 response; filter or repair the rows first"
        )
    os.makedirs(out_dir, exist_ok=True)
    # overwrite semantics (mode("overwrite") parity with export.py): stale
    # segments from a previous export with more partitions would otherwise
    # survive, fail verification, and leak old records to glob consumers
    for f in os.listdir(out_dir):
        if (f.startswith("segment-") and f.endswith(".warc.gz")) or f.startswith(
            "_WARC_MANIFEST.json"
        ):
            os.remove(os.path.join(out_dir, f))
    seg = (F.abs(F.xxhash64(F.col(url_col))) % n_segments).cast("int")
    slim = df.select(
        seg.alias("__seg"),
        F.col(url_col).alias("url"),
        F.col(body_col).cast("string").alias("body"),
        F.col(round_col).cast("long").alias("rnd"),
    ).repartition(n_segments, "__seg")

    def _write(it):
        # FULL-row sort key: ties on url (same page captured twice) must
        # not fall back to shuffle arrival order, or re-export stops being
        # byte-identical
        rows = sorted(
            it, key=lambda r: (r["__seg"], r["url"], r["rnd"], r["body"] or "")
        )
        if not rows:
            return
        by_seg: dict[int, list] = {}
        for r in rows:
            by_seg.setdefault(r["__seg"], []).append(r)
        for s, part in by_seg.items():
            recs = [
                build_warc_record(
                    "warcinfo",
                    {"WARC-Date": "1970-01-01T00:00:00Z"},
                    f"software: lexi-spark\r\nsegment: {s}".encode(),
                )
            ]
            for r in part:
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + (r["body"] or "").encode("utf-8")
                )
                recs.append(
                    build_warc_record(
                        "response",
                        {
                            "WARC-Target-URI": r["url"],
                            "WARC-Date": f"1970-01-01T00:00:{r['rnd'] % 60:02d}Z",
                        },
                        http,
                    )
                )
            blob = build_warc(recs, gzip_per_record=True)
            path = os.path.join(out_dir, f"segment-{s:05d}.warc.gz")
            # attempt-unique tmp: a speculative/retried attempt must never
            # share a tmp file with a racing attempt (os.replace then only
            # ever publishes a COMPLETE file; contents are deterministic,
            # so whichever attempt wins publishes identical bytes)
            from pyspark import TaskContext

            ctx = TaskContext.get()
            suffix = ctx.taskAttemptId() if ctx is not None else os.getpid()
            tmp = f"{path}.tmp-{suffix}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            yield (s, len(recs), hashlib.sha256(blob).hexdigest())

    stats = sorted(slim.rdd.mapPartitions(_write).collect())
    manifest = {
        "n_segments": n_segments,
        "total_records": sum(n for _s, n, _d in stats),
        "segments": [
            {"segment": s, "records": n, "sha256": d} for s, n, d in stats
        ],
    }
    tmp = os.path.join(out_dir, "_WARC_MANIFEST.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_WARC_MANIFEST.json"))
    return manifest


def verify_warc_export(out_dir: str) -> dict:
    """Re-parse every manifested segment with the real reader and check
    record counts + file digests — detects truncated, tampered, or
    unmanifested segments from the archive bytes alone."""
    import hashlib
    import json
    import os

    man_path = os.path.join(out_dir, "_WARC_MANIFEST.json")
    if not os.path.exists(man_path):
        raise ValueError(f"no _WARC_MANIFEST.json in {out_dir} — incomplete export")
    with open(man_path) as fh:
        manifest = json.load(fh)
    listed = {e["segment"]: e for e in manifest["segments"]}
    problems: list[str] = []
    on_disk = set()
    for f in os.listdir(out_dir):
        if f.startswith("segment-") and f.endswith(".warc.gz"):
            try:
                on_disk.add(int(f[len("segment-"):-len(".warc.gz")]))
            except ValueError:
                problems.append(f"unrecognized segment filename {f!r}")
    for s in sorted(on_disk - set(listed)):
        problems.append(f"segment {s} on disk but not in manifest")
    for s, entry in sorted(listed.items()):
        path = os.path.join(out_dir, f"segment-{s:05d}.warc.gz")
        if not os.path.exists(path):
            problems.append(f"segment {s} missing")
            continue
        blob = open(path, "rb").read()
        if hashlib.sha256(blob).hexdigest() != entry["sha256"]:
            problems.append(f"segment {s} digest mismatch")
            continue
        n = len(parse_warc_bytes(blob))
        if n != entry["records"]:
            problems.append(
                f"segment {s}: {n} records != manifest {entry['records']}"
            )
    return {
        "ok": not problems,
        "problems": problems,
        "total_records": manifest["total_records"],
    }
