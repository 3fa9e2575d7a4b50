"""Streaming front-end equivalence: Structured Streaming (foreachBatch over
a seed-file queue) driving the superstep engine must converge to the SAME
final state as the batch engine given all seeds upfront — same seen set,
same fetched pages (url_hash + content sha), same DLQ — and enqueue must be
idempotent under micro-batch replay (the exactly-once argument)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.streaming.crawl_stream import run_streaming_crawl

SPEC = CorpusSpec(n_hosts=3, listing_pages=2, details_per_page=3, hosts_with_robots=1)
BUDGET = 5
MAX_ROUNDS = 12


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(SPEC)


@pytest.fixture(scope="module")
def robots():
    return robots_map(SPEC)


@pytest.fixture(scope="module")
def batch_engine(spark, corpus, robots, tmp_path_factory):
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("batch")), corpus, robots,
                      per_host_budget=BUDGET)
    eng.run(seeds=seed_urls(SPEC), max_rounds=MAX_ROUNDS)
    return eng


@pytest.fixture(scope="module")
def stream_result(spark, corpus, robots, tmp_path_factory):
    """One seed file per host -> one micro-batch per host (the second and
    third hosts' seeds arrive while earlier hosts are already crawled)."""
    seed_dir = tmp_path_factory.mktemp("seeds")
    for i, url in enumerate(seed_urls(SPEC)):
        with open(seed_dir / f"seed-{i}.json", "w") as fh:
            fh.write(json.dumps({"url": url}) + "\n")
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("stream")), corpus, robots,
                      per_host_budget=BUDGET)
    log = run_streaming_crawl(
        spark, eng, str(seed_dir), str(tmp_path_factory.mktemp("ckpt")),
        rounds_per_batch=MAX_ROUNDS, max_files_per_trigger=1,
    )
    return eng, log


def _pages_set(spark, eng):
    return {
        (r["url_hash"], r["content_sha256"])
        for r in eng.store.read(spark, "pages")
        .select("url_hash", "content_sha256").collect()
    }


def test_ran_one_microbatch_per_seed_file(stream_result):
    _, log = stream_result
    assert len(log) == len(seed_urls(SPEC))
    assert all(b["drained"] for b in log)


def test_final_seen_set_matches_batch(spark, batch_engine, stream_result):
    s_eng, _ = stream_result
    assert s_eng.seen_set() == batch_engine.seen_set()


def test_final_pages_match_batch(spark, batch_engine, stream_result):
    s_eng, _ = stream_result
    assert _pages_set(spark, s_eng) == _pages_set(spark, batch_engine)


def test_dlq_matches_batch(spark, batch_engine, stream_result):
    s_eng, _ = stream_result
    def dlq(eng):
        df = eng.store.read(spark, "dlq")
        return {(r["url_norm"], r["error_category"], r["attempt"])
                for r in df.collect()}
    assert dlq(s_eng) == dlq(batch_engine)


def test_within_host_order_still_monotonic(spark, stream_result):
    """The scheduler invariant survives mid-crawl enqueues: within a host,
    fetch_log order follows ascending (fetched_round, fetch_order)."""
    s_eng, _ = stream_result
    rows = (
        s_eng.store.read(spark, "fetch_log")
        .select("host", "fetched_round", "fetch_order")
        .orderBy("host", "fetched_round", "fetch_order").collect()
    )
    assert rows, "fetch log must be non-empty"
    per_host: dict[str, list] = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(
            (r["fetched_round"], r["fetch_order"]))
    for seq in per_host.values():
        assert seq == sorted(seq)


def test_log_feed_tail_is_incremental_and_complete(
    spark, corpus, robots, tmp_path_factory
):
    """tail_fetch_log over a log_feed engine: first tail delivers exactly the
    rows logged so far, a second tail with the SAME checkpoint delivers only
    the rows from rounds run in between, and the union equals the fetch_log
    table (the WebSocket-log-streaming analogue, as a resumable file feed)."""
    from crawler_spark.streaming.crawl_stream import tail_fetch_log

    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("feed")), corpus, robots,
                      per_host_budget=BUDGET, log_feed=True)
    ckpt = str(tmp_path_factory.mktemp("feed_ckpt"))

    def drain_tail(name):
        got = []

        def sink(batch_df, batch_id):
            got.append(batch_df.count())

        q = (
            tail_fetch_log(spark, eng.store.root)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sum(got)

    eng.run(seeds=seed_urls(SPEC), max_rounds=3)
    logged_early = eng.store.read(spark, "fetch_log").count()
    first = drain_tail("tail1")
    assert first == logged_early > 0

    eng.run(max_rounds=MAX_ROUNDS)  # continue to drain (crosses compaction)
    total = eng.store.read(spark, "fetch_log").count()
    second = drain_tail("tail2")
    assert second == total - first > 0  # only the new rounds' rows
    assert first + second == total


def test_enqueue_replay_is_idempotent(spark, corpus, robots, tmp_path_factory):
    """Re-delivering an already-processed seed batch (the crash-replay case)
    is a metrics-only no-op: no new frontier rows, no new seen rows."""
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("replay")), corpus, robots,
                      per_host_budget=BUDGET)
    seeds = seed_urls(SPEC)[:1]
    m1 = eng.add_seeds(seeds)
    assert m1["n_enqueued"] == 1
    before = eng.store.table_rows("frontier")
    m2 = eng.add_seeds(seeds)  # replay
    assert m2["n_enqueued"] == 0
    assert eng.store.table_rows("frontier") == before
    # and the crawl still runs to completion afterwards
    rounds = eng.run(max_rounds=MAX_ROUNDS)
    assert rounds and rounds[-1].get("done")


def test_midcrawl_enqueue_urls_already_seen_are_dropped(
    spark, corpus, robots, tmp_path_factory
):
    """Enqueueing a URL the crawl already discovered organically must not
    re-crawl it (enqueue==seen anti-join)."""
    eng = CrawlEngine(spark, str(tmp_path_factory.mktemp("midc")), corpus, robots,
                      per_host_budget=BUDGET)
    eng.run(seeds=seed_urls(SPEC)[:1], max_rounds=MAX_ROUNDS)
    fetched_twice_check = eng.store.read(spark, "fetch_log").count()
    # every URL the first crawl saw, plus one genuinely new seed
    seen_urls = [u for u in seed_urls(SPEC)[:1]]
    m = eng.add_seeds(seen_urls + [seed_urls(SPEC)[1]])
    assert m["n_enqueued"] == 1
    eng.run(max_rounds=MAX_ROUNDS)
    log = eng.store.read(spark, "fetch_log")
    dup = (log.groupBy("url_hash").count().filter(F.col("count") > 1)
           .join(log.filter(F.col("status_code") == 200), "url_hash").count())
    # no successfully-fetched URL is fetched twice across the enqueue boundary
    assert dup == 0
    assert log.count() > fetched_twice_check  # the new seed's host was crawled
