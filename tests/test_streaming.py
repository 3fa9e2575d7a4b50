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
