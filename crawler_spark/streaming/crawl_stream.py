"""Streaming front-end of the superstep crawl engine.

The reference runs continuously: the FastAPI control plane publishes jobs to
NATS and long-lived workers consume them while crawls are in flight
(`/root/reference/crawler/worker.py`, `crawler/services/nats_queue.py:93-130`
— WORK_QUEUE retention, 5-min publish-dedup window). The Spark-native
equivalent is Structured Streaming driving the SAME batch engine:

    seed files land in a directory (the queue)
      -> readStream (file source = the durable, replayable queue;
         maxFilesPerTrigger bounds a micro-batch like NATS batch size)
      -> foreachBatch: CrawlEngine.enqueue_seeds(batch) — distributed
         normalize/hash/dedup, enqueue==seen invariant, atomic commit —
         then run rounds until the frontier drains (or a per-batch cap)

Exactly-once composition: the streaming checkpoint makes each file's batch
replay on failure, and enqueue_seeds is idempotent under replay (already-
seen URLs anti-join away; a re-enqueued batch is a metrics-only commit), so
crash/restart anywhere yields the same frontier, seen set, and pages as one
uninterrupted run — the same argument as the engine's own resume gate.

NOT a rewrite of the crawl as a stateful streaming operator: the frontier's
priority/politeness selection is a global-rank decision per round, which is
exactly what foreachBatch exists for (batch semantics inside a stream).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from crawler_spark.engine.superstep import FETCH_LOG_SCHEMA, CrawlEngine

SEED_SCHEMA = "url string"


def tail_fetch_log(spark: SparkSession, store_root: str):
    """Live log streaming, Spark-native (the reference streams per-job logs
    over WebSockets, `log_publisher.py` / PRD <200 ms target): an engine
    built with ``log_feed=True`` appends each round's fetch_log rows to an
    append-only feed directory (`_logfeed/`), so a streaming file source
    over it IS a log tail — each committed round's files are discovered as
    one micro-batch, a restart with the same checkpoint resumes from the
    last streamed file, and the consumer is any writeStream sink (console,
    Kafka, memory). The snapshot table itself can't be tailed directly:
    compaction rounds fold the round's delta into a full rewrite, which a
    file source would re-deliver — the feed dir is the log-shipping channel,
    the table stays the queryable state. Delivery is at-least-once across a
    crash mid-round (a re-run rewrites the same feed dir idempotently)."""
    return (
        spark.readStream.schema(FETCH_LOG_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(f"{store_root}/_logfeed/feed-*")
    )


def run_streaming_crawl(
    spark: SparkSession,
    engine: CrawlEngine,
    seed_dir: str,
    checkpoint_dir: str,
    rounds_per_batch: int = 20,
    max_files_per_trigger: int = 1,
) -> list[dict[str, Any]]:
    """Drain all seed files currently in ``seed_dir`` (availableNow), one
    micro-batch per ``max_files_per_trigger`` files, crawling to frontier
    drain after each enqueue. Returns per-batch engine metrics.

    Production shape: swap the trigger for processingTime and the engine
    keeps absorbing seed drops forever; the snapshot store commits atomically
    between micro-batches, so cancel/resume semantics are unchanged.
    """
    batch_log: list[dict[str, Any]] = []

    def _handle(batch_df, batch_id: int) -> None:
        m = engine.enqueue_seeds(batch_df)
        rounds = engine.run(max_rounds=rounds_per_batch)
        batch_log.append(
            {"batch_id": batch_id, "enqueue": m, "n_rounds": len(rounds),
             "drained": bool(rounds and rounds[-1].get("done"))}
        )

    stream = (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(seed_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batch_log


SITEMAP_DOC_SCHEMA = "xml string"


def run_streaming_sitemap_crawl(
    spark: SparkSession,
    engine: CrawlEngine,
    sitemap_dir: str,
    checkpoint_dir: str,
    fetch_sitemap=None,
    rounds_per_batch: int = 20,
    max_files_per_trigger: int = 1,
    max_index_depth: int = 4,
) -> list[dict[str, Any]]:
    """Sitemap documents as the durable seed queue (the production shape of
    sitemap ingestion: a discovery fetcher drops each fetched sitemap XML
    into a directory; the crawl absorbs them as micro-batches).

    Per batch: ``enqueue_sitemaps`` parses the documents distributed and
    enqueues page entries (protocol priority -> S1, enqueue==seen
    invariant); <sitemapindex> children are resolved through the
    ``fetch_sitemap(url) -> xml`` callable (the network boundary — None
    disables recirculation) and fed back, one level per iteration up to
    ``max_index_depth``; then the engine crawls to drain. Replay of a
    micro-batch after a crash re-parses the same documents and anti-joins
    away — the same exactly-once composition as run_streaming_crawl.

    Rows are JSON lines ``{"xml": "<urlset…>"}`` — a file source needs a
    columnar schema, and the queue element is the DOCUMENT (its source URL
    is not load-bearing: entries carry absolute locs)."""
    batch_log: list[dict[str, Any]] = []

    def _handle(batch_df, batch_id: int) -> None:
        m, children = engine.enqueue_sitemaps(batch_df)
        enqueues = [m]
        rows = children.collect()
        depth = 0
        while rows and fetch_sitemap is not None and depth < max_index_depth:
            docs = spark.createDataFrame(
                [(fetch_sitemap(r["sitemap_url"]),) for r in rows],
                SITEMAP_DOC_SCHEMA,
            )
            m_child, children = engine.enqueue_sitemaps(docs)
            enqueues.append(m_child)
            rows = children.collect()
            depth += 1
        rounds = engine.run(max_rounds=rounds_per_batch)
        batch_log.append(
            {
                "batch_id": batch_id,
                "n_enqueued": sum(e["n_enqueued"] for e in enqueues),
                "n_sitemap_children": sum(
                    e.get("n_sitemap_children", 0) for e in enqueues
                ),
                "n_rounds": len(rounds),
                "drained": bool(rounds and rounds[-1].get("done")),
            }
        )

    stream = (
        spark.readStream.schema(SITEMAP_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(sitemap_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batch_log
