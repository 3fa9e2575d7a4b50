"""Engine-level + streaming driver entries.

Streaming entries carry DuckDB oracles (bounded availableNow drains equal the
batch aggregate). The frontier-engine entries are rows-only: the stateful
superstep loop (snapshot commits, bloom rebuilds, retry recirculation) is not
ANSI-SQL-expressible — their correctness gate is the simulator equivalence in
tests/test_frontier_engine.py (crawl order ==, seen set ==, resume ==).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.streaming.ingest import (
    run_dedup_counts,
    run_host_budget,
    run_windowed_counts,
)

_ENGINE_CACHE: dict[str, object] = {}

_FIXTURE = dict(n_hosts=2, listing_pages=2, details_per_page=3,
                hosts_with_robots=1)
_BUDGET = 4
_ROUNDS = 8


def _engine(spark: SparkSession):
    """One tiny end-to-end crawl per process (cached): fixture corpus, robots,
    politeness, retries, snapshot commits."""
    if "eng" not in _ENGINE_CACHE:
        from crawler_spark.engine.corpus import (
            CorpusSpec,
            build_corpus,
            robots_map,
            seed_urls,
        )
        from crawler_spark.engine.superstep import CrawlEngine

        spec = CorpusSpec(**_FIXTURE)
        eng = CrawlEngine(
            spark, tempfile.mkdtemp(prefix="crawl_store_"),
            build_corpus(spec), robots_map(spec), per_host_budget=_BUDGET,
        )
        eng.run(seeds=seed_urls(spec), max_rounds=_ROUNDS)
        _ENGINE_CACHE["eng"] = eng
    return _ENGINE_CACHE["eng"]


def _sim(spark: SparkSession):
    """The single-threaded reference simulator over the SAME fixture — the
    in-query expectation the engine entries hard-gate against."""
    if "sim" not in _ENGINE_CACHE:
        from crawler_spark.engine.corpus import (
            CorpusSpec,
            build_corpus,
            robots_map,
            seed_urls,
        )
        from crawler_spark.engine.simulator import simulate

        spec = CorpusSpec(**_FIXTURE)
        _ENGINE_CACHE["sim"] = simulate(
            build_corpus(spec), robots_map(spec), seed_urls(spec),
            per_host_budget=_BUDGET, max_rounds=_ROUNDS,
        )
    return _ENGINE_CACHE["sim"]


def q_frontier_crawl_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-GATED rows check (was rows-only): before returning the crawled
    pages table, the query re-runs the single-threaded simulator on the
    same fixture and asserts the engine's (round, host, fetch_order, url)
    crawl order is IDENTICAL — a drifted engine raises in-query, so the
    driver records err instead of a green row count. The comparison is a
    fixture-scale driver action (a few hundred tuples), not a production
    path."""
    eng = _engine(spark)
    sim = _sim(spark)
    got = eng.crawl_order()
    want = sorted(sim.crawl_order)
    if got != want:
        diff = next(
            ((a, b) for a, b in zip(got, want) if a != b),
            "(length-only divergence)",  # prefix case: zip finds no pair
        )
        raise AssertionError(
            f"engine crawl order diverged from simulator: {len(got)} vs "
            f"{len(want)} rows; first diff: {diff}"
        )
    return (
        eng.store.read(spark, "pages")
        .select("url_hash", "url_norm", "host", "content_sha256",
                "fetched_round", "fetch_order")
        .orderBy("fetched_round", "host", "fetch_order")
    )


def q_frontier_round_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-GATED rows check (was rows-only): per-round fetch/parse/dedup
    metrics from the snapshot manifest, gated in-query against the
    simulator's replay of the same fixture — per-round n_fetched/n_ok must
    match the simulator's attempt/success streams exactly, and the dlq /
    retry totals its decision lists. A metrics regression raises, turning
    the driver row red (err) instead of silently green."""
    from collections import Counter

    eng = _engine(spark)
    sim = _sim(spark)
    rows = [
        (
            int(m["round"]),
            int(m.get("n_selected", 0)),
            int(m.get("n_fetched", 0)),
            int(m.get("n_ok", 0)),
            int(m.get("n_new_urls", 0)),
            int(m.get("n_dup_dropped", 0)),
            int(m.get("n_robots_excluded", 0)),
            int(m.get("n_retry", 0)),
            int(m.get("n_dlq", 0)),
        )
        for m in eng.store.round_metrics()
        if m.get("n_selected") is not None
    ]
    want_fetched = Counter(r for (r, _, _, _) in sim.fetch_attempts)
    want_ok = Counter(r for (r, _, _, _) in sim.crawl_order)
    for (rnd, _sel, n_fetched, n_ok, *_rest) in rows:
        if n_fetched != want_fetched.get(rnd, 0) or n_ok != want_ok.get(rnd, 0):
            raise AssertionError(
                f"round {rnd} metrics diverged from simulator: "
                f"fetched {n_fetched} vs {want_fetched.get(rnd, 0)}, "
                f"ok {n_ok} vs {want_ok.get(rnd, 0)}"
            )
    n_retry_total = sum(r[7] for r in rows)
    n_dlq_total = sum(r[8] for r in rows)
    if n_retry_total != len(sim.retries) or n_dlq_total != len(sim.dlq):
        raise AssertionError(
            f"retry/dlq totals diverged: retries {n_retry_total} vs "
            f"{len(sim.retries)}, dlq {n_dlq_total} vs {len(sim.dlq)}"
        )
    return spark.createDataFrame(
        rows,
        "round int, n_selected int, n_fetched int, n_ok int, n_new_urls int,"
        " n_dup_dropped int, n_robots_excluded int, n_retry int, n_dlq int",
    ).orderBy("round")


def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_windowed_counts(spark, sf_dir)


O_STREAM_WINDOW_COUNTS = """
SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
       event_type, count(*) AS n_requests
FROM events GROUP BY 1, 2
"""


def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_dedup_counts(spark, sf_dir)


O_STREAM_DEDUP_COUNTS = """
SELECT user_id, count(DISTINCT event_id % 500) AS n_unique_urls
FROM events GROUP BY 1
"""


def q_stream_host_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState token-bucket ledger. Update-mode emissions
    depend on micro-batch boundaries in general, but the driver's table is
    ONE parquet file, so availableNow yields exactly one batch and the final
    ledger is a closed form: refill = min(burst + rps*60, burst + rps*60) =
    130 tokens, grant = min(n, 130) per host — which the oracle replays
    (multi-batch deployments would keep this rows-only)."""
    return run_host_budget(spark, sf_dir).orderBy("host")


O_STREAM_HOST_BUDGET = """
SELECT 'portal' || (user_id % 50) || '.go.id' AS host,
       count(*) AS n_requests,
       CAST(130 - least(count(*), 130) AS DOUBLE) AS tokens_left,
       count(*) - least(count(*), 130) AS n_throttled
FROM events
GROUP BY 1
"""


def q_stream_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parse-UDF path: documents arrive as a file stream, run the
    batch parse UDF, spans aggregate per kind — the oracle replays the span
    construction in SQL and aggregates identically."""
    from crawler_spark.streaming.ingest import run_span_extract_counts

    return run_span_extract_counts(spark, sf_dir)


O_STREAM_SPAN_EXTRACT = r"""
SELECT kind, count(*) AS n_spans,
       CAST(sum(span_offset) AS BIGINT) AS sum_offset,
       max(span_offset) AS max_offset
FROM (
  WITH d AS (
    SELECT doc_id,
           trim(regexp_replace(substr(text, 1, 80), '\s+', ' ', 'g')) AS p1,
           trim(regexp_replace(substr(text, 81, 80), '\s+', ' ', 'g')) AS p2
    FROM documents
  )
  SELECT doc_id, 'text' AS kind, 0 AS span_offset FROM d
  UNION ALL SELECT doc_id, 'text', 1 FROM d
  UNION ALL SELECT doc_id, 'text', 2 FROM d WHERE p1 <> ''
  UNION ALL SELECT doc_id, 'media',
       CASE WHEN p1 <> '' THEN 3 ELSE 2 END FROM d
  UNION ALL SELECT doc_id, 'text',
       CASE WHEN p1 <> '' THEN 4 ELSE 3 END FROM d WHERE p2 <> ''
  UNION ALL SELECT doc_id, 'media',
       (CASE WHEN p1 <> '' THEN 4 ELSE 3 END)
         + (CASE WHEN p2 <> '' THEN 1 ELSE 0 END) FROM d
)
GROUP BY kind
"""


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous dedup: micro-batches probe the accumulated corpus index
    and append to it (foreachBatch over simhash_incremental_near_dup) —
    each near-dup pair is emitted exactly once, when its later member
    arrives, so the drained union equals the batch self-join and the oracle
    is the simhash_near_dup SQL verbatim."""
    from crawler_spark.streaming.ingest import run_incremental_near_dup

    return run_incremental_near_dup(spark, sf_dir)


QUERIES = {
    "frontier_crawl_pages": q_frontier_crawl_pages,
    "frontier_round_metrics": q_frontier_round_metrics,
    "stream_window_counts": q_stream_window_counts,
    "stream_dedup_counts": q_stream_dedup_counts,
    "stream_host_budget": q_stream_host_budget,
    "stream_span_extract": q_stream_span_extract,
    "stream_near_dup": q_stream_near_dup,
}


from crawler_spark.queries_content import O_SIMHASH_NEAR_DUP  # noqa: E402

ORACLES = {
    "stream_window_counts": O_STREAM_WINDOW_COUNTS,
    "stream_dedup_counts": O_STREAM_DEDUP_COUNTS,
    "stream_span_extract": O_STREAM_SPAN_EXTRACT,
    "stream_host_budget": O_STREAM_HOST_BUDGET,
    "stream_near_dup": O_SIMHASH_NEAR_DUP,
}
