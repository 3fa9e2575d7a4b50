"""Structured Streaming ops: bounded availableNow drains must equal batch
results; the stateful token-bucket ledger must conserve counts."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_windowed_counts_equal_batch(spark, events):
    from crawler_spark.streaming.ingest import run_windowed_counts

    got = sorted(map(tuple, run_windowed_counts(spark, SF).collect()))
    expect = sorted(
        map(
            tuple,
            events.groupBy(
                F.window(F.col("ts").cast("timestamp"), "1 hour").alias("win"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .select(F.unix_millis("win.start"), "event_type", "n")
            .collect(),
        )
    )
    assert got == expect


def test_streaming_dedup_equals_batch_distinct(spark, events):
    from crawler_spark.streaming.ingest import run_dedup_counts

    got = sorted(map(tuple, run_dedup_counts(spark, SF).collect()))
    expect = sorted(
        map(
            tuple,
            events.select("user_id", (F.col("event_id") % 500).alias("k"))
            .distinct()
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect(),
        )
    )
    assert got == expect


def test_stateful_budget_conserves_counts(spark, events):
    from crawler_spark.streaming.ingest import run_host_budget

    rows = run_host_budget(spark, SF).collect()
    assert len(rows) > 0
    per_host_expect = {
        r[0]: r[1]
        for r in events.select(
            F.concat(F.lit("portal"), (F.col("user_id") % 50).cast("string"), F.lit(".go.id")).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*"))
        .collect()
    }
    for r in rows:
        assert r.n_requests == per_host_expect[r.host]
        # granted + throttled == seen, tokens never negative
        assert 0 <= r.tokens_left
        assert 0 <= r.n_throttled <= r.n_requests


def test_stream_near_dup_multi_batch_equals_batch_join(spark, tmp_path):
    """Continuous dedup across REAL micro-batch boundaries. Synthetic corpus:
    120 docs whose text repeats every 40 ids, split into thirds — so docs k,
    k+40, k+80 share a fingerprint but land in batches 0, 1, 2, and every
    matching base-base pair CROSSES a micro-batch boundary. The drained
    union must equal the batch banded self-join on the full corpus, each
    pair exactly once. A probe that re-initialized the corpus index between
    batches loses the cross-batch pairs; one that re-scanned prior batches
    re-emits them."""
    import os
    import time

    from pyspark.sql import functions as F

    from crawler_spark.operators.dedup import simhash_near_dup_join
    from crawler_spark.streaming.ingest import run_incremental_near_dup

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, f"dokumen putusan nomor {i % 40} tahun dua ribu") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "landing")
    os.makedirs(d)
    t0 = time.time() - 100
    for i in range(3):
        part = rows[40 * i:40 * (i + 1)]
        p = os.path.join(d, f"part-{i:03d}.parquet")
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in part], pa.int64()),
                "text": [r[1] for r in part],
            }),
            p,
        )
        os.utime(p, (t0 + 10 * i, t0 + 10 * i))

    got = run_incremental_near_dup(
        spark, SF, src_dir=d, max_files_per_trigger=1
    ).collect()
    pairs = [(r.id_a, r.id_b, r.distance) for r in got]
    assert len(pairs) == len(set(pairs)), "a pair was emitted more than once"

    fp = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10).cast("long")
    flips = (F.col("doc_id") % 4 + 1).cast("int")
    corpus = docs.select(F.col("doc_id").alias("id"), fp.alias("fp")).unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("id"),
            fp.bitwiseXOR(F.pow(F.lit(2.0), flips).cast("long") - 1).alias("fp"),
        )
    )
    want = {
        (r.id_a, r.id_b, r.distance)
        for r in simhash_near_dup_join(corpus, id_col="id", fp_col="fp").collect()
    }
    assert set(pairs) == want
    # cross-batch carry-over genuinely exercised: doc 0 (batch 0) matches
    # docs 40 and 80 (batches 1 and 2) at distance 0
    assert (0, 40, 0) in want and (0, 80, 0) in want and (40, 80, 0) in want


def test_stateful_budget_multi_batch_replay(spark, tmp_path):
    """The availableNow single-batch oracle alone can't prove the state
    carry-over; here the input is split into 3 files drained one per
    micro-batch (maxFilesPerTrigger=1, mtime-ordered), and the final ledger
    must equal a Python replay of the token bucket over the SAME batch
    boundaries — refill per batch, grant capped by balance, throttle the
    rest. A stateful operator that dropped or re-initialized state between
    batches fails on n_throttled/tokens_left."""
    import os
    import time
    from collections import Counter

    import pyarrow.parquet as pq

    from crawler_spark.streaming.ingest import _run_to_memory, stateful_host_budget

    tbl = pq.read_table(f"{SF}/events.parquet")
    n = tbl.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    d = str(tmp_path / "landing")
    os.makedirs(d)
    t0 = time.time() - 100
    slices = []
    for i in range(3):
        part = tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
        p = os.path.join(d, f"part-{i:03d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (t0 + 10 * i, t0 + 10 * i))  # oldest-first drain order
        slices.append(part)

    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    rows = _run_to_memory(stateful_host_budget(stream), "update").collect()

    # the drain really was 3 micro-batches: every host present in all three
    # slices emitted one update row per batch
    updates_per_host = Counter(r.host for r in rows)
    assert max(updates_per_host.values()) == 3

    final = {}
    for r in rows:  # n_requests is monotone, so max identifies the last update
        if r.host not in final or r.n_requests > final[r.host].n_requests:
            final[r.host] = r

    rps, burst, round_seconds = 2.0, 10.0, 60.0
    state = {}
    for part in slices:
        counts = Counter(
            f"portal{u % 50}.go.id" for u in part.column("user_id").to_pylist()
        )
        for host, cnt in counts.items():
            tokens, n_seen, n_thr = state.get(host, (burst, 0, 0))
            tokens = min(burst + rps * round_seconds, tokens + rps * round_seconds)
            grant = min(cnt, int(tokens))
            tokens -= grant
            state[host] = (tokens, n_seen + cnt, n_thr + cnt - grant)

    assert set(final) == set(state)
    for host, (tokens, n_seen, n_thr) in state.items():
        r = final[host]
        assert (r.tokens_left, r.n_requests, r.n_throttled) == (
            tokens, n_seen, n_thr,
        ), host


def test_incremental_near_dup_zero_batches_returns_empty(spark, tmp_path):
    """Review finding: an existing-but-empty landing dir (first poll)
    produced an AnalysisException from the unwritten pairs path; the
    correct answer is an empty pairs frame."""
    import os

    from crawler_spark.streaming.ingest import run_incremental_near_dup

    d = str(tmp_path / "empty_landing")
    os.makedirs(d)
    got = run_incremental_near_dup(spark, SF, src_dir=d)
    assert got.columns == ["id_a", "id_b", "distance", "similarity_pct"]
    assert got.count() == 0
