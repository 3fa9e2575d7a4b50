"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in crawler_spark/queries_crawl.py (frontier, URL dedup,
scheduling, retry — SURVEY.md §2.1/2.3-2.5) and crawler_spark/queries_content.py
(content dedup, simhash, minhash, ANN, text analysis, spans — §2.2/2.6-2.8).
Engine-level (stateful, non-SQL-expressible) entries return rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: schedule one politeness-paced frontier round on sf0.001 —
    normalize+hash -> within-batch dedup -> seen anti-join -> priority rank
    per host -> token-bucket pacing (the reference's core crawl loop as one
    declarative plan)."""
    from crawler_spark.queries_crawl import q_politeness_pacing

    return q_politeness_pacing(spark, "/root/testdata/sf0.001")


# The driver's correctness run walks queries() in dict-insertion order and may
# stop after a fixed budget (r02 covered exactly the first 50 of 59 entries).
# Register the least-proven queries FIRST so the budget always lands on them;
# long-green stalwarts go last. Names absent from the current registry are
# skipped, so this list may lead the code by a round.
_CHECK_FIRST = [
    # --- r05 priority 1: new queries this round (real box resample, MP4
    # metadata, JSON-LD extraction)
    "multimodal_resample",
    "multimodal_video_meta",
    "jsonld_extract",
    "substring_dedup",
    "substring_dedup_incremental",
    "multimodal_audio_meta",
    # --- r05 priority 2: everything reading the snapshot store — the TTL
    # seen expiry floor, the file-level pages fold, and fold-ref pruning
    # all changed the store's read/commit paths this round
    "seen_probe_exact",
    "frontier_crawl_pages",
    "frontier_round_metrics",
    "page_upsert",
    "retention_expiry",
    "log_range_scan",
    # --- r05 priority 3: the r01/r02 stalwarts with no driver row in 2+
    # rounds (cross-round union freshness — VERDICT r04 item 6)
    "url_normalize_hash",
    "url_seen_antijoin",
    "priority_frontier",
    "politeness_budget",
    "politeness_pacing",
    "http_classify",
    "backoff_schedule",
    "retry_routing",
    "pagination_expand",
    "stop_classify",
    "hot_host_salting",
    "global_rate_window",
    "page_listing",
    "topk_common_hashes",
    "pagination_detect",
    "json_extract",
    "dlq_views",
    "workflow_result_agg",
    "backoff_jitter",
    "error_classify",
    "pagination_strategy",
    "url_equivalence",
    "frontier_peek",
    "crawl_executor",
    "idempotent_enqueue",
    "step_validation",
    "varsub_conditions",
    "exact_dup_marking",
    "content_hash_stats",
    "page_stats",
    "simhash_fingerprint",
    "simhash_near_dup",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_profile",
    "doc_fingerprint",
    "span_extract",
    "multimodal_meta",
    "dedup_embedding_cosine",
    "ann_lsh_topk",
    "multimodal_decode",
    "dedup_ngram_jaccard",
    "duplicate_groups",
    "ann_ivf_topk",
    "selector_extract",
    "xpath_extract",
    "simhash_incremental",
    "minhash_incremental",
    "stream_near_dup",
    "depth_priority_frontier",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "decontaminate",
    "gopher_quality",
]


def _ordered(full: dict) -> dict:
    out = {k: full[k] for k in _CHECK_FIRST if k in full}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_spark import queries_admin, queries_content, queries_crawl

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(queries_crawl.QUERIES)
    out.update(queries_content.QUERIES)
    out.update(queries_admin.QUERIES)
    try:  # engine-level rows-only entries (added as the engine lands)
        from crawler_spark import queries_engine

        out.update(queries_engine.QUERIES)
    except ImportError:
        pass
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    from crawler_spark import queries_admin, queries_content, queries_crawl

    out: dict[str, str] = {}
    out.update(queries_crawl.ORACLES)
    out.update(queries_content.ORACLES)
    out.update(queries_admin.ORACLES)
    try:
        from crawler_spark import queries_engine

        out.update(queries_engine.ORACLES)
    except ImportError:
        pass
    return _ordered(out)
