"""TTL'd (windowed) URL-seen membership — the reference's 24h Redis TTL in
round units: expired URLs become crawlable again via re-discovery cycles,
and the distributed engine still matches the simulator exactly."""

from collections import Counter

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.simulator import simulate
from crawler_spark.engine.superstep import CrawlEngine

SPEC = CorpusSpec(n_hosts=2, listing_pages=3, details_per_page=3, hosts_with_robots=0)
TTL = 2
ROUNDS = 10


def test_ttl_recrawl_matches_simulator(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)

    sim = simulate(corpus, robots, seeds, per_host_budget=3,
                   max_rounds=ROUNDS, ttl_rounds=TTL)
    eng = CrawlEngine(spark, str(tmp_path / "ttl"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    eng.run(seeds=seeds, max_rounds=ROUNDS)

    assert eng.crawl_order() == sorted(sim.crawl_order)

    # TTL must actually matter: some URL crawled more than once via the
    # prev-link cycle after its seen entry expired
    recrawled = [u for u, n in Counter(u for *_, u in sim.crawl_order).items() if n > 1]
    assert recrawled, "fixture must produce at least one TTL re-crawl"

    # seen table stays bounded to the window (compaction)
    seen = eng.store.read(spark, "seen")
    max_round = max(r for r, *_ in eng.crawl_order())
    assert seen.filter(f"seen_round < {max_round - TTL}").count() == 0


def test_no_ttl_never_recrawls(spark, tmp_path):
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    sim = simulate(corpus, robots, seeds, per_host_budget=3, max_rounds=ROUNDS)
    counts = Counter(u for *_, u in sim.crawl_order)
    assert counts and all(n == 1 for n in counts.values())


def test_ttl_recrawl_replaces_page_row_not_duplicates(spark, tmp_path):
    """Q1 latest-crawl-wins MERGE: a TTL-expired URL that is re-crawled must
    REPLACE its page row (ON CONFLICT DO UPDATE, crawled_page.sql:1-37);
    every fetch still appears in the append-only fetch_log."""
    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "q1"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    eng.run(seeds=seeds, max_rounds=ROUNDS)

    order = eng.crawl_order()
    recrawled = [u for u, n in Counter(u for *_, u in order).items() if n > 1]
    assert recrawled, "fixture must produce at least one TTL re-crawl"

    pages = eng.store.read(spark, "pages")
    # one row per (host, url_hash) despite multiple crawls
    dup_keys = (
        pages.groupBy("host", "url_hash").count().filter("count > 1").count()
    )
    assert dup_keys == 0, "pages table must be latest-wins merged"
    # the surviving row is the LATEST crawl
    url = recrawled[0]
    last_round = max(r for r, _, _, u in order if u == url)
    row = pages.filter(pages.url_norm == url).collect()
    assert len(row) == 1 and row[0]["fetched_round"] == last_round
    # fetch_log keeps every attempt
    log = eng.store.read(spark, "fetch_log")
    assert log.filter(log.url_norm == url).count() >= 2


def test_enqueue_round_retires_expiring_cohort_from_cuckoo(spark, tmp_path):
    """An enqueue_seeds commit advances the round counter, so it must also
    retire its round's expiring cohort from the filter store — previously it
    skipped the delete and those keys sat in the filter until the next full
    rebuild (found by review). Uses a duplicate-seed enqueue (n_fresh == 0)
    so the early-return path is the one exercised. Retirement is now a
    tombstone delta element appended to the chain (merge-on-read), so the
    probe must walk the CHAIN with exact resolution."""
    from pyspark.sql import functions as F

    from crawler_spark.engine.superstep import N_SHARDS
    from crawler_spark.operators.seenset import probe_seen_files

    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "ttlq"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    # 4 rounds leaves TWO populated cohorts inside the TTL window (2 and 3),
    # so the enqueue retires the older one while the newer stays active
    eng.run(seeds=seeds, max_rounds=4)

    seen = eng.store.read(spark, "seen")
    cohort_rounds = sorted(
        r[0] for r in seen.select("seen_round").distinct().collect()
    )
    # target the OLDEST cohort still retirable at/after the next round, so
    # newer cohorts stay in the active window; idle-enqueue forward until
    # the next enqueue round is the one that retires it (each intermediate
    # enqueue retires its own, possibly empty, cohort)
    target = next(
        c for c in cohort_rounds if c + TTL >= eng.store.latest_round() + 1
    )
    enqueue_round = target + TTL
    while eng.store.latest_round() + 1 < enqueue_round:
        eng.add_seeds([seeds[0]])  # duplicate -> n_fresh == 0
    cohort = seen.filter(
        F.col("seen_round") == target
    ).select("host", "url_hash").collect()
    active = seen.filter(
        F.col("seen_round") > target
    ).select("host", "url_hash").collect()
    assert cohort, "fixture must have an expiring cohort at the enqueue round"
    assert active, "fixture must keep at least one newer cohort active"

    eng.add_seeds([seeds[0]])  # already-seen -> n_fresh == 0 path
    assert eng.store.latest_round() == enqueue_round
    chain = eng.store.latest_blob_chain()
    assert chain[-1].endswith(f"{enqueue_round:05d}"), (
        "enqueue must append a delta element carrying its cohort retirement"
    )

    def probes(rows):
        df = spark.createDataFrame(rows, "host string, url_hash string")
        return {
            (r["host"], r["url_hash"]): r["maybe_seen"]
            for r in probe_seen_files(
                df, chain, n_shards=N_SHARDS, layer="cuckoo", exact=True
            ).collect()
        }

    assert not any(probes(cohort).values()), "expired cohort still probes seen"
    assert all(probes(active).values()), "active window keys must stay present"


def test_idle_round_retires_expiring_cohort_from_cuckoo(spark, tmp_path):
    """A metrics-only round (due empty because everything is held by retry
    backoff) still advances the round counter, so it must retire its TTL
    cohort from the shard files — with exact_files the final arbiter, a
    skipped delete round would suppress that cohort's TTL re-crawls until
    the next full rebuild (found by second review pass). Forced directly:
    commit a frontier whose entries are all held, then run the idle round."""
    from pyspark.sql import functions as F

    from crawler_spark.engine.superstep import N_SHARDS
    from crawler_spark.operators.seenset import probe_seen_files

    corpus, robots, seeds = build_corpus(SPEC), robots_map(SPEC), seed_urls(SPEC)
    eng = CrawlEngine(spark, str(tmp_path / "ttlidle"), corpus, robots,
                      per_host_budget=3, ttl_rounds=TTL)
    eng.run(seeds=seeds, max_rounds=4)

    seen = eng.store.read(spark, "seen")
    cohort_rounds = sorted(
        r[0] for r in seen.select("seen_round").distinct().collect()
    )
    target = next(
        c for c in cohort_rounds if c + TTL >= eng.store.latest_round() + 1
    )
    idle_round = target + TTL
    # hold every frontier entry past the idle round so due is empty
    # (materialized: the commit would otherwise overwrite the snapshot
    # files its own lineage reads)
    held_rows = eng.store.read(spark, "frontier").withColumn(
        "not_before", F.lit(idle_round + 100).cast("long")
    ).collect()
    frontier = spark.createDataFrame(
        held_rows, eng.store.read(spark, "frontier").schema
    )
    # bring the store to idle_round - 1 with the held frontier
    eng.store.commit_round(
        idle_round - 1, {"frontier": frontier}, metrics={"phase": "hold"}
    )
    cohort = seen.filter(F.col("seen_round") == target).select(
        "host", "url_hash"
    ).collect()
    assert cohort

    m = eng.run_round(idle_round)
    assert m["n_due"] == 0 and not m.get("done")
    chain = eng.store.latest_blob_chain()
    assert chain[-1].endswith(f"{idle_round:05d}"), (
        "idle round must append a delta element carrying its cohort retirement"
    )
    probed = probe_seen_files(
        spark.createDataFrame(cohort, "host string, url_hash string"),
        chain, n_shards=N_SHARDS, layer="cuckoo", exact=True,
    )
    assert not any(r["maybe_seen"] for r in probed.collect()), (
        "expired cohort still probes seen after the idle round"
    )


def test_retry_and_rediscovery_coexist_in_frontier(spark, tmp_path):
    """TTL corner the hash-keyed simulator frontier used to get wrong: a URL
    whose seen entry expired can be RE-DISCOVERED while a retry row for the
    same URL is still recirculating — the engine's frontier table holds both
    rows (enqueue dedup happens only through the seen set at extraction
    time), so the simulator must too.

    Hand-built web: host A's permanent-429 detail X is retried with
    Retry-After=2 while host B's listing chain re-links X two rounds later,
    after X's 1-round seen window expired — so an attempt=1 retry row and a
    fresh attempt=0 row for X coexist, and X accumulates MORE fetch attempts
    than one frontier row could ever produce (MAX_ATTEMPTS=3)."""
    pad = "<p>" + "menimbang bahwa perkara ini diperiksa dengan seksama " * 4 + "</p>"
    X = "https://a.go.id/putusan/detail/9"
    corpus = {
        "https://a.go.id/putusan?page=1": (
            200, f'<html><body>{pad}<a href="/putusan/detail/9">X</a></body></html>', None),
        X: (429, "", "2"),
        "https://b.go.id/putusan?page=1": (
            200, f'<html><body>{pad}<a href="/putusan?page=2">n</a></body></html>', None),
        "https://b.go.id/putusan?page=2": (
            200, f'<html><body>{pad} halaman dua <a href="/putusan?page=3">n</a></body></html>', None),
        "https://b.go.id/putusan?page=3": (
            200, f'<html><body>{pad} halaman tiga <a href="{X}">X lagi</a></body></html>', None),
    }
    seeds = ["https://a.go.id/putusan?page=1", "https://b.go.id/putusan?page=1"]

    sim = simulate(corpus, {}, seeds, per_host_budget=1, max_rounds=12,
                   ttl_rounds=1)
    eng = CrawlEngine(spark, str(tmp_path / "coexist"), corpus, {},
                      per_host_budget=1, ttl_rounds=1)
    eng.run(seeds=seeds, max_rounds=12)

    assert eng.crawl_order() == sorted(sim.crawl_order)
    # (sim.seen is cumulative ever-seen; the engine's TTL seen table is
    # windowed+compacted — compare the ORDER and ATTEMPT invariants instead)
    log = eng.store.read(spark, "fetch_log")
    got = sorted((r.fetched_round, r.host, r.url_norm, r.status_code)
                 for r in log.collect())
    assert got == sorted(sim.fetch_attempts)

    # non-vacuity: one frontier row can yield at most MAX_ATTEMPTS fetch
    # attempts; more proves two rows for X coexisted
    x_attempts = [a for a in sim.fetch_attempts if a[2] == X]
    assert len(x_attempts) > 3, x_attempts
