"""Crawl-side query surface (SURVEY.md §2.1, §2.3-2.5) with DuckDB oracles.

Each query synthesizes crawl-shaped inputs DETERMINISTICALLY from the driver's
parquet tables (events) so an ANSI-SQL oracle can reproduce the expected
output exactly: the Spark side exercises the real operators/UDFs, the oracle
side re-derives the result constructively.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions.frontier_exprs import (
    backoff_col,
    classify_http_col,
    is_retryable_col,
    priority_score_col,
)
from crawler_spark.functions.url_udfs import normalize_url_udf, url_hash
from crawler_spark.operators.frontier import per_host_budget_selection
from crawler_spark.sources.fetch import paced_fetch_schedule


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the driver ships ONE parquet file per table -> one scan partition; at
    # real scale the table is many files and the scan parallelizes itself.
    # Spread the small file across cores so UDF/explode stages aren't
    # single-threaded (cheap: <100 MB shuffle).
    return spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def synth_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic frontier derived from `events`: raw URLs with
    tracking params / mixed case (normalizing collapses them), a host per
    user_id bucket, priority 0-10, the event ts as scheduled_at."""
    ev = _events(spark, sf_dir)
    host_num = (F.col("user_id") % 50).cast("string")
    return ev.select(
        "event_id",
        F.concat(F.lit("portal"), host_num, F.lit(".go.id")).alias("host"),
        F.concat(
            F.lit("HTTPS://Portal"), host_num, F.lit(".GO.ID/cases/"),
            (F.col("event_id") % 997).cast("string"),
            F.lit("?utm_source=feed&ref=x&page="),
            (F.col("event_id") % 7 + 1).cast("string"),
            F.lit("&b="), (F.col("user_id") % 13).cast("string"),
            F.lit("&a=1#s"),
        ).alias("url"),
        (F.col("event_id") % 11).cast("int").alias("priority"),
        F.col("ts").alias("scheduled_at"),
    )


# Shared oracle CTE: the constructive normalized form of synth_frontier's URLs.
_F_CTE = """
WITH f AS (
  SELECT event_id,
         'portal' || (user_id % 50) || '.go.id' AS host,
         'https://portal' || (user_id % 50) || '.go.id/cases/' || (event_id % 997)
           || '?a=1&b=' || (user_id % 13) || '&page=' || (event_id % 7 + 1) AS url_norm,
         CAST(event_id % 11 AS INT) AS priority,
         ts AS scheduled_at
  FROM events
)
"""


def q_url_normalize_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U3: vectorized canonicalization + sha256 seen-set key."""
    df = synth_frontier(spark, sf_dir)
    df = df.withColumn("url_norm", normalize_url_udf(F.col("url")))
    return df.select("event_id", "url_norm", url_hash("url_norm").alias("url_hash"))


O_URL_NORMALIZE_HASH = _F_CTE + """
SELECT event_id, url_norm, sha256(url_norm) AS url_hash FROM f
"""


def q_url_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/U7 + U6: within-batch first-wins dedup + seen-set exclusion
    (events with event_id % 3 = 0 simulate previously-crawled URLs).

    Both semantics are folded into ONE map-side-combinable aggregation over
    the hashed frame: min(event_id) per url_hash is the first-wins winner
    (U5/U7) and a max(seen-flag) marks hashes with any previously-crawled row
    (U6). One pass over the normalize UDF, one shuffle — the r01 form
    evaluated the UDF twice (batch + seen derived independently) and paid an
    extra anti-join shuffle. The composable operator forms (first_by_order /
    seen_anti_join, used when the seen set is a separate table) live in
    operators/dedup.py and are exercised by the engine."""
    df = q_url_normalize_hash(spark, sf_dir)
    agg = df.groupBy("url_hash").agg(
        F.min("event_id").alias("event_id"),
        F.max((F.col("event_id") % 3 == 0).cast("int")).alias("seen_flag"),
    )
    return agg.filter(F.col("seen_flag") == 0).select("event_id", "url_hash")


O_URL_SEEN_ANTIJOIN = _F_CTE + """
, hashed AS (SELECT event_id, sha256(url_norm) AS url_hash FROM f),
batch AS (
  SELECT event_id, url_hash FROM (
    SELECT event_id, url_hash,
           row_number() OVER (PARTITION BY url_hash ORDER BY event_id) AS rn
    FROM hashed) WHERE rn = 1
),
seen AS (SELECT DISTINCT url_hash FROM hashed WHERE event_id % 3 = 0)
SELECT b.event_id, b.url_hash FROM batch b ANTI JOIN seen s USING (url_hash)
"""


_PROBE_BLOBS: dict[str, str] = {}


def q_seen_probe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 in its r03-final production shape: the shard-local exact layer IS
    the dedup arbiter — candidates repartition once on shard, each task
    probes its shard's bloom blob and verifies hits against the exact
    (filter_key, verify_key) pair file; no anti-join against the seen table
    exists in the plan (single-Exchange/no-Join gate in tests/test_seenset).
    Seen = documents with doc_id%3==0; candidates = doc_id%2==0, so dup and
    fresh rows both occur. The oracle states the contract as the plain
    anti-join. Shard files build once per process (standing state, keyed by
    sf_dir — the probe is what's under test)."""
    import tempfile

    from crawler_spark.operators.seenset import (
        seen_filter_pipeline_files,
        update_seen_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.concat(F.lit("portal"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".go.id"))
    seen = docs.filter(F.col("doc_id") % 3 == 0).select(
        host.alias("host"), F.sha2(F.col("text"), 256).alias("url_hash")
    )
    if sf_dir not in _PROBE_BLOBS:
        d = tempfile.mkdtemp(prefix="probe_query_blobs_")
        update_seen_shards(
            seen, blob_dir=None, n_shards=8, out_dir=d, with_exact=True
        ).collect()
        _PROBE_BLOBS[sf_dir] = d
    cands = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id"), host.alias("host"),
        F.sha2(F.col("text"), 256).alias("url_hash"),
    )
    return seen_filter_pipeline_files(
        cands, seen, _PROBE_BLOBS[sf_dir], n_shards=8, seen_unique=True,
        exact_files=True,
    )


O_SEEN_PROBE_EXACT = """
WITH seen AS (
  SELECT DISTINCT sha256(text) AS url_hash FROM documents WHERE doc_id % 3 = 0
),
cands AS (
  SELECT doc_id,
         'portal' || (doc_id % 7) || '.go.id' AS host,
         sha256(text) AS url_hash
  FROM documents WHERE doc_id % 2 = 0
)
SELECT c.doc_id, c.host, c.url_hash
FROM cands c ANTI JOIN seen s USING (url_hash)
"""


def q_priority_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3: exact-int priority score, per-host rank, top-5 per host.
    Tiebreak on event_id keeps order deterministic under any parallelism."""
    df = synth_frontier(spark, sf_dir).withColumn(
        "priority_score", priority_score_col(F.col("priority"), F.col("scheduled_at"))
    )
    w = Window.partitionBy("host").orderBy(F.col("priority_score").asc(), F.col("event_id").asc())
    return (
        df.withColumn("fetch_order", F.row_number().over(w))
        .filter(F.col("fetch_order") <= 5)
        .select("event_id", "host", "priority_score", "fetch_order")
    )


O_PRIORITY_FRONTIER = _F_CTE + """
, scored AS (
  SELECT event_id, host,
         CAST(10 - priority AS BIGINT) * 1000000000000 + epoch_ms(scheduled_at)
           AS priority_score
  FROM f
)
SELECT event_id, host, priority_score,
       CAST(fetch_order AS INT) AS fetch_order
FROM (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority_score, event_id)
           AS fetch_order
  FROM scored)
WHERE fetch_order <= 5
"""


def q_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 as data: per-host budget floor(rps*30)+10 rows per round, selected
    by priority rank (rps varies by host bucket)."""
    df = synth_frontier(spark, sf_dir).withColumn(
        "priority_score", priority_score_col(F.col("priority"), F.col("scheduled_at"))
    )
    budgets = (
        df.groupBy("host")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "rps",
            ((F.regexp_extract(F.col("host"), r"portal(\d+)", 1).cast("int") % 4 + 1) * 0.5),
        )
        .withColumn("budget", (F.floor(F.col("rps") * 30) + 10).cast("long"))
        .select("host", "budget")
    )
    sel = per_host_budget_selection(
        df, budgets, host="host", score="priority_score", tiebreak="event_id"
    )
    return sel.select("event_id", "host", F.col("fetch_order").cast("int").alias("fetch_order"))


O_POLITENESS_BUDGET = _F_CTE + """
, scored AS (
  SELECT event_id, host,
         CAST(10 - priority AS BIGINT) * 1000000000000 + epoch_ms(scheduled_at)
           AS priority_score,
         CAST(floor(((CAST(regexp_extract(host, 'portal(\\d+)', 1) AS INT) % 4 + 1) * 0.5) * 30)
              + 10 AS BIGINT) AS budget
  FROM f
)
SELECT event_id, host, CAST(fetch_order AS INT) AS fetch_order
FROM (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority_score, event_id)
           AS fetch_order
  FROM scored)
WHERE fetch_order <= budget
"""


def q_depth_priority_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-horizon + domain-priority selection (north rule "depth/
    domain-priority frontier"; engine analogue: CrawlEngine(max_depth=...,
    domain_priority=...), gated vs the simulator in tests/test_depth_frontier
    .py). Each row carries a hop-count depth; rows beyond the horizon are
    dropped BEFORE ranking (in the engine: before the seen set), and hosts
    in the domain-priority map score with the override instead of the
    row-type default — the reference's per-website crawl_job.priority
    (current_schema.sql:172) folded into the same S1 score."""
    df = synth_frontier(spark, sf_dir).withColumn(
        "depth", (F.col("event_id") % 5).cast("int")
    )
    # every 7th portal is a priority-9 domain (a literal broadcast map,
    # exactly the engine's _priority_expr shape)
    pairs: list = []
    for i in range(0, 50, 7):
        pairs.extend([F.lit(f"portal{i}.go.id"), F.lit(9)])
    prio_eff = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("host")), F.col("priority")
    ).cast("int")
    scored = (
        df.filter(F.col("depth") <= 3)  # horizon: max_depth=3
        .withColumn("prio_eff", prio_eff)
        .withColumn(
            "priority_score",
            priority_score_col(F.col("prio_eff"), F.col("scheduled_at")),
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority_score").asc(), F.col("event_id").asc()
    )
    return (
        scored.withColumn("fetch_order", F.row_number().over(w))
        .filter(F.col("fetch_order") <= 4)
        .select("event_id", "host", "depth", "prio_eff",
                F.col("fetch_order").cast("int").alias("fetch_order"))
    )


O_DEPTH_PRIORITY_FRONTIER = _F_CTE + """
, scored AS (
  SELECT event_id, host,
         CAST(event_id % 5 AS INT) AS depth,
         CAST(CASE WHEN CAST(regexp_extract(host, 'portal(\\d+)', 1) AS INT) % 7 = 0
              THEN 9 ELSE priority END AS INT) AS prio_eff,
         scheduled_at
  FROM f
  WHERE event_id % 5 <= 3
)
SELECT event_id, host, depth, prio_eff, CAST(fetch_order AS INT) AS fetch_order
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY host
           ORDER BY CAST(10 - prio_eff AS BIGINT) * 1000000000000
                    + epoch_ms(scheduled_at), event_id) AS fetch_order
  FROM scored)
WHERE fetch_order <= 4
"""


def q_politeness_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 token-bucket pacing: the applyInPandas per-host fetch scheduler
    assigns each URL a virtual fetch time from genuine incremental token-bucket
    simulation; the oracle is the closed form max(0, (k-burst)/rps)."""
    df = q_priority_frontier(spark, sf_dir)
    rps = (F.regexp_extract(F.col("host"), r"portal(\d+)", 1).cast("int") % 4 + 1) * 0.5
    withr = df.withColumn("rps", rps).withColumn("burst", F.lit(3))
    return paced_fetch_schedule(withr).select("event_id", "host", "fetch_order", "fetch_at_ms")


O_POLITENESS_PACING = _F_CTE + """
, scored AS (
  SELECT event_id, host,
         CAST(10 - priority AS BIGINT) * 1000000000000 + epoch_ms(scheduled_at)
           AS priority_score,
         ((CAST(regexp_extract(host, 'portal(\\d+)', 1) AS INT) % 4 + 1) * 0.5) AS rps
  FROM f
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority_score, event_id)
           AS fetch_order
  FROM scored
)
SELECT event_id, host, CAST(fetch_order AS INT) AS fetch_order,
       CAST(floor(greatest(0.0, (fetch_order - 3) / rps) * 1000 + 0.5) AS BIGINT)
         AS fetch_at_ms
FROM ranked WHERE fetch_order <= 5
"""


def q_http_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: status classification + retryability as one CASE chain."""
    ev = _events(spark, sf_dir)
    status = F.element_at(
        F.array(*[F.lit(s) for s in [200, 404, 403, 429, 408, 500, 503, 301, 400, 418]]),
        (F.col("event_id") % 10 + 1).cast("int"),
    )
    df = ev.select("event_id", status.alias("status_code"))
    df = df.withColumn("error_category", classify_http_col(F.col("status_code")))
    return df.withColumn("retryable", is_retryable_col(F.col("error_category")))


O_HTTP_CLASSIFY = """
WITH s AS (
  SELECT event_id,
         ([200,404,403,429,408,500,503,301,400,418])[CAST(event_id % 10 AS INT) + 1]
           AS status_code
  FROM events
)
SELECT event_id, status_code,
  CASE WHEN status_code = 404 THEN 'not_found'
       WHEN status_code IN (401,403) THEN 'auth_error'
       WHEN status_code = 429 THEN 'rate_limit'
       WHEN status_code = 408 THEN 'timeout'
       WHEN status_code >= 400 AND status_code < 500 THEN 'client_error'
       WHEN status_code >= 500 AND status_code < 600 THEN 'server_error'
       ELSE 'unknown' END AS error_category,
  CASE WHEN status_code = 404 THEN FALSE
       WHEN status_code IN (401,403) THEN FALSE
       WHEN status_code = 429 THEN TRUE
       WHEN status_code = 408 THEN TRUE
       WHEN status_code >= 400 AND status_code < 500 THEN FALSE
       WHEN status_code >= 500 AND status_code < 600 THEN TRUE
       ELSE FALSE END AS retryable
FROM s
"""


def q_backoff_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 (deterministic form): exponential backoff, truncate-then-cap-300."""
    ev = _events(spark, sf_dir)
    df = ev.select("event_id", (F.col("event_id") % 9 + 1).cast("int").alias("attempt"))
    return df.withColumn(
        "delay_s", backoff_col(F.col("attempt"), "exponential", initial=2, max_delay=300, multiplier=2.0)
    )


O_BACKOFF_SCHEDULE = """
SELECT event_id, CAST(event_id % 9 + 1 AS INT) AS attempt,
       least(CAST(floor(2 * power(2.0, CAST(event_id % 9 AS INT))) AS BIGINT), 300)
         AS delay_s
FROM events
"""


def q_retry_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/R5: route each fetch outcome to ok / retry / dlq / failed
    (max_attempts = 3), then count per route — the DLQ dataflow as one agg."""
    df = q_http_classify(spark, sf_dir).withColumn(
        "attempt", (F.col("event_id") % 5).cast("int")
    )
    route = (
        F.when(F.col("status_code") < 400, "ok")
        .when(F.col("retryable") & (F.col("attempt") < 3), "retry")
        .when(F.col("retryable"), "dlq")
        .otherwise("failed")
    )
    return (
        df.withColumn("route", route)
        .groupBy("route", "error_category")
        .agg(F.count("*").alias("n"))
    )


O_RETRY_ROUTING = """
WITH s AS (
  SELECT event_id,
         ([200,404,403,429,408,500,503,301,400,418])[CAST(event_id % 10 AS INT) + 1]
           AS status_code,
         CAST(event_id % 5 AS INT) AS attempt
  FROM events
),
c AS (
  SELECT *,
    CASE WHEN status_code = 404 THEN 'not_found'
         WHEN status_code IN (401,403) THEN 'auth_error'
         WHEN status_code = 429 THEN 'rate_limit'
         WHEN status_code = 408 THEN 'timeout'
         WHEN status_code >= 400 AND status_code < 500 THEN 'client_error'
         WHEN status_code >= 500 AND status_code < 600 THEN 'server_error'
         ELSE 'unknown' END AS error_category,
    CASE WHEN status_code IN (429, 408) THEN TRUE
         WHEN status_code >= 500 AND status_code < 600 THEN TRUE
         ELSE FALSE END AS retryable
  FROM s
)
SELECT CASE WHEN status_code < 400 THEN 'ok'
            WHEN retryable AND attempt < 3 THEN 'retry'
            WHEN retryable THEN 'dlq'
            ELSE 'failed' END AS route,
       error_category, count(*) AS n
FROM c GROUP BY 1, 2
"""


def q_retry_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 per-attempt audit (retry_history, current_schema.sql:523-534 +
    job_retry_handler.record_retry_attempt): one row per failure routing
    decision — the exact projection the engine appends each round
    (engine/superstep.py new_history), including the R3 Retry-After
    precedence (server value overrides attempt backoff)."""
    df = (
        q_http_classify(spark, sf_dir)
        .withColumn("attempt", (F.col("event_id") % 5).cast("int"))
        .withColumn(
            "retry_after",
            F.when(
                F.col("status_code") == 429,
                (F.col("event_id") % 3 + 2).cast("string"),
            ),
        )
        .withColumn("decided_round", (F.col("event_id") % 7).cast("int"))
        .filter(F.col("status_code") != 200)
    )
    retryable_now = F.col("retryable") & (F.col("attempt") + 1 < 3)
    exhausted = F.col("retryable") & (F.col("attempt") + 1 >= 3)
    backoff = F.coalesce(
        F.expr("try_cast(retry_after AS long)"), (F.col("attempt") + 1).cast("long")
    )
    return df.select(
        "event_id",
        (F.col("attempt") + 1).cast("int").alias("attempt_number"),
        "error_category",
        F.when(retryable_now, "retry")
        .when(exhausted, "dlq")
        .otherwise("drop")
        .alias("action"),
        F.when(retryable_now, backoff).otherwise(F.lit(0))
        .cast("long")
        .alias("retry_delay_rounds"),
        F.when(retryable_now, F.col("decided_round") + backoff)
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("not_before"),
        "decided_round",
    )


O_RETRY_HISTORY = """
WITH s AS (
  SELECT event_id,
         ([200,404,403,429,408,500,503,301,400,418])[CAST(event_id % 10 AS INT) + 1]
           AS status_code,
         CAST(event_id % 5 AS INT) AS attempt,
         CAST(event_id % 7 AS INT) AS decided_round
  FROM events
),
c AS (
  SELECT *,
    CASE WHEN status_code = 404 THEN 'not_found'
         WHEN status_code IN (401,403) THEN 'auth_error'
         WHEN status_code = 429 THEN 'rate_limit'
         WHEN status_code = 408 THEN 'timeout'
         WHEN status_code >= 400 AND status_code < 500 THEN 'client_error'
         WHEN status_code >= 500 AND status_code < 600 THEN 'server_error'
         ELSE 'unknown' END AS error_category,
    CASE WHEN status_code IN (429, 408) THEN TRUE
         WHEN status_code >= 500 AND status_code < 600 THEN TRUE
         ELSE FALSE END AS retryable,
    CASE WHEN status_code = 429 THEN CAST(event_id % 3 + 2 AS VARCHAR) END
      AS retry_after
  FROM s WHERE status_code <> 200
),
r AS (
  SELECT *,
    retryable AND attempt + 1 < 3 AS retry_now,
    retryable AND attempt + 1 >= 3 AS exhausted,
    coalesce(TRY_CAST(retry_after AS BIGINT), CAST(attempt + 1 AS BIGINT))
      AS backoff
  FROM c
)
SELECT event_id,
       CAST(attempt + 1 AS INT) AS attempt_number,
       error_category,
       CASE WHEN retry_now THEN 'retry'
            WHEN exhausted THEN 'dlq'
            ELSE 'drop' END AS action,
       CAST(CASE WHEN retry_now THEN backoff ELSE 0 END AS BIGINT)
         AS retry_delay_rounds,
       CAST(CASE WHEN retry_now THEN decided_round + backoff ELSE -1 END
            AS BIGINT) AS not_before,
       decided_round
FROM r
"""


def q_seed_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 per-seed outcome enum (seed_url_crawler.py:35-47,862-910): classify
    each seed host's crawl from a synthetic fetch log — first fetch = the
    seed (404 / error short-circuit), then success_no_urls / partial_success
    / success from page + detail-URL counts. Same aggregation the engine's
    seed_outcomes() reporting runs over its real fetch_log."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    status = F.element_at(
        F.array(*[F.lit(s) for s in [200, 404, 403, 429, 408, 500, 503, 301, 400, 418]]),
        (F.col("event_id") % 10 + 1).cast("int"),
    )
    log = ev.select(
        (F.col("user_id") % 40).alias("seed_host"),
        (F.col("event_id") % 5).cast("int").alias("fetched_round"),
        (F.col("event_id") % 13).cast("int").alias("fetch_order"),
        "event_id",
        status.alias("status_code"),
        F.when(F.col("event_id") % 4 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id"))
        .alias("detail_id"),
    )
    w = Window.partitionBy("seed_host").orderBy(
        "fetched_round", "fetch_order", "event_id"
    )
    ranked = log.withColumn("rk", F.row_number().over(w))
    per_host = ranked.groupBy("seed_host").agg(
        F.max(F.when(F.col("rk") == 1, F.col("status_code"))).alias("seed_status"),
        F.count(F.when(F.col("status_code") == 200, 1)).alias("pages_crawled"),
        F.count(F.when(F.col("status_code") != 200, 1)).alias("n_failed"),
        F.count_distinct(F.col("detail_id")).alias("urls_extracted"),
    )
    outcome = (
        F.when(F.col("seed_status") == 404, "seed_url_404")
        .when(F.col("seed_status") != 200, "seed_url_error")
        .when(F.col("urls_extracted") == 0, "success_no_urls")
        .when(F.col("n_failed") > 0, "partial_success")
        .otherwise("success")
    )
    return per_host.select(
        "seed_host",
        outcome.alias("outcome"),
        F.col("pages_crawled").cast("long").alias("pages_crawled"),
        F.col("urls_extracted").cast("long").alias("urls_extracted"),
    )


O_SEED_OUTCOMES = """
WITH log AS (
  SELECT user_id % 40 AS seed_host,
         CAST(event_id % 5 AS INT) AS fetched_round,
         CAST(event_id % 13 AS INT) AS fetch_order,
         event_id,
         ([200,404,403,429,408,500,503,301,400,418])[CAST(event_id % 10 AS INT) + 1]
           AS status_code,
         CASE WHEN event_id % 4 = 0 THEN NULL ELSE event_id END AS detail_id
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY seed_host ORDER BY fetched_round, fetch_order, event_id
  ) AS rk FROM log
),
per_host AS (
  SELECT seed_host,
         max(CASE WHEN rk = 1 THEN status_code END) AS seed_status,
         count(CASE WHEN status_code = 200 THEN 1 END) AS pages_crawled,
         count(CASE WHEN status_code <> 200 THEN 1 END) AS n_failed,
         count(DISTINCT detail_id) AS urls_extracted
  FROM ranked GROUP BY seed_host
)
SELECT seed_host,
       CASE WHEN seed_status = 404 THEN 'seed_url_404'
            WHEN seed_status <> 200 THEN 'seed_url_error'
            WHEN urls_extracted = 0 THEN 'success_no_urls'
            WHEN n_failed > 0 THEN 'partial_success'
            ELSE 'success' END AS outcome,
       CAST(pages_crawled AS BIGINT) AS pages_crawled,
       CAST(urls_extracted AS BIGINT) AS urls_extracted
FROM per_host
"""


def q_request_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-task request retry (executor_retry.py policy inside the mapInPandas
    request core): five deterministic per-URL behaviors — 503,503,200 /
    404-permanent / 429-exhausted / 503,200 / 200 — under max_attempts=3
    exponential backoff. Asserts final status, success flag, category, and
    attempts-used per row."""
    from crawler_spark.sources.api import http_batch

    ev = _events(spark, sf_dir)
    urls = ev.select(
        "event_id",
        F.concat(
            F.lit("https://api.go.id/r/"), F.col("event_id").cast("string"),
            F.lit("/v"), (F.col("event_id") % 5).cast("string"),
        ).alias("url"),
    )

    def fetcher(url: str):
        calls = fetcher.__dict__.setdefault("calls", {})
        n = calls[url] = calls.get(url, 0) + 1
        variant = int(url.rsplit("/v", 1)[1])
        if variant == 0:
            return (503, None) if n <= 2 else (200, "<p>ok</p>")
        if variant == 1:
            return 404, None
        if variant == 2:
            return 429, None
        if variant == 3:
            return (503, None) if n == 1 else (200, "<p>ok</p>")
        return 200, "<p>ok</p>"

    cfg = {"max_attempts": 3, "initial_delay_seconds": 1,
           "max_delay_seconds": 60, "backoff_strategy": "exponential",
           "backoff_multiplier": 2.0}
    out = http_batch(urls, fetcher, {}, retry_config=cfg, sleep=lambda s: None)
    return out.select(
        "event_id", "status_code", "success", "error_category",
        F.col("attempts").cast("int").alias("attempts"),
    )


O_REQUEST_RETRY = """
SELECT event_id,
       CAST(CASE event_id % 5 WHEN 1 THEN 404 WHEN 2 THEN 429 ELSE 200 END
            AS INT) AS status_code,
       event_id % 5 NOT IN (1, 2) AS success,
       CASE event_id % 5 WHEN 1 THEN 'not_found' WHEN 2 THEN 'rate_limit' END
         AS error_category,
       CAST(CASE event_id % 5 WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 3
            WHEN 3 THEN 2 ELSE 1 END AS INT) AS attempts
FROM events
"""


def q_pagination_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: frontier fan-out — every 100th event is a pagination seed expanded
    to pages 1..(event_id%5+2) (query-param pattern)."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") % 100 == 0)
    base = F.concat(
        F.lit("https://portal"), (F.col("user_id") % 50).cast("string"),
        F.lit(".go.id/list"),
    )
    pages = F.sequence(F.lit(1), (F.col("event_id") % 5 + 2).cast("int"))
    return ev.select(
        "event_id", base.alias("base"), F.explode(pages).alias("page_no")
    ).select(
        "event_id",
        "page_no",
        F.concat(F.col("base"), F.lit("?page="), F.col("page_no").cast("string")).alias("page_url"),
    )


O_PAGINATION_EXPAND = """
SELECT event_id, CAST(page_no AS INT) AS page_no,
       'https://portal' || (user_id % 50) || '.go.id/list?page=' || page_no AS page_url
FROM events, LATERAL unnest(generate_series(1, CAST(event_id % 5 AS INT) + 2)) AS t(page_no)
WHERE event_id % 100 = 0
"""


def q_stop_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (stateless rules): per-response stop decision for HTTP errors.
    (The stateful rules — consecutive-empty, duplicate-content, circular —
    live in the fetch group loop; engine tests cover them.)"""
    df = q_http_classify(spark, sf_dir).select("event_id", "status_code")
    stop_reason = (
        F.when(F.col("status_code") == 404, "404 Not Found - end of pagination")
        .when(F.col("status_code") == 403, "403 Forbidden - access denied")
        .when(F.col("status_code") >= 500, F.concat(F.lit("Server error: HTTP "), F.col("status_code").cast("string")))
    )
    return df.withColumn("stop_reason", stop_reason).withColumn(
        "should_stop", F.col("stop_reason").isNotNull()
    )


O_STOP_CLASSIFY = """
WITH s AS (
  SELECT event_id,
         ([200,404,403,429,408,500,503,301,400,418])[CAST(event_id % 10 AS INT) + 1]
           AS status_code
  FROM events
)
SELECT event_id, status_code,
  CASE WHEN status_code = 404 THEN '404 Not Found - end of pagination'
       WHEN status_code = 403 THEN '403 Forbidden - access denied'
       WHEN status_code >= 500 THEN 'Server error: HTTP ' || status_code
       END AS stop_reason,
  CASE WHEN status_code = 404 OR status_code = 403 OR status_code >= 500
       THEN TRUE ELSE FALSE END AS should_stop
FROM s
"""


def q_hot_host_salting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew plan: one deliberately hot host (~50% of rows) gets spread over 16
    salts, cold hosts keep salt 0; output is the (host, salt) load map.
    (The production salt is xxhash64(url_hash); here a portable modulus so the
    oracle can reproduce the exact assignment.)"""
    ev = _events(spark, sf_dir)
    host = F.when(F.col("event_id") % 2 == 0, F.lit("hot.go.id")).otherwise(
        F.concat(F.lit("portal"), (F.col("user_id") % 50).cast("string"), F.lit(".go.id"))
    )
    df = ev.select("event_id", host.alias("host"))
    counts = df.groupBy("host").agg(F.count("*").alias("pending"))
    joined = df.join(F.broadcast(counts), "host")
    salt = (
        F.when(F.col("pending") > 1000, (F.col("event_id") % 16))
        .otherwise(F.lit(0))
        .cast("int")
    )
    return (
        joined.withColumn("salt", salt)
        .groupBy("host", "salt")
        .agg(F.count("*").alias("n"))
    )


O_HOT_HOST_SALTING = """
WITH d AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0 THEN 'hot.go.id'
              ELSE 'portal' || (user_id % 50) || '.go.id' END AS host
  FROM events
),
c AS (SELECT host, count(*) AS pending FROM d GROUP BY host)
SELECT d.host,
       CAST(CASE WHEN c.pending > 1000 THEN d.event_id % 16 ELSE 0 END AS INT) AS salt,
       count(*) AS n
FROM d JOIN c USING (host)
GROUP BY 1, 2
"""


def q_global_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: sliding-window global limiter as data — requests per (host,
    60s tumbling window); rows beyond the limit are flagged (the INCR+EXPIRE
    guard from redis_cache.py:360-463 as one window count)."""
    df = synth_frontier(spark, sf_dir)
    w = F.window(F.col("scheduled_at").cast("timestamp"), "60 seconds")
    counts = (
        df.groupBy("host", w.alias("win"))
        .agg(F.count("*").alias("n_requests"))
        .select(
            "host",
            F.unix_millis(F.col("win.start")).alias("window_start_ms"),
            "n_requests",
            (F.col("n_requests") > 50).alias("throttled"),
        )
    )
    return counts


O_GLOBAL_RATE_WINDOW = _F_CTE + """
SELECT host,
       epoch_ms(time_bucket(INTERVAL 60 SECONDS, scheduled_at)) AS window_start_ms,
       count(*) AS n_requests,
       count(*) > 50 AS throttled
FROM f GROUP BY 1, 2
"""


def q_page_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: newest-first page listing with OFFSET 10 LIMIT 30
    (crawled_page.sql:53-71; deterministic tiebreak on event_id).

    Scale-safe form (r01 review: a bare global window = every row through ONE
    task): orderBy().limit(offset+limit) compiles to TakeOrderedAndProject —
    a distributed per-partition top-k + driver merge of 40 rows — and only
    then does the row_number window run, over <= offset+limit rows. Deep
    OFFSETs should switch to keyset pagination on (crawled_at, id); this
    form is exact for the listing-page depths the reference's API serves."""
    offset, limit = 10, 30
    df = synth_frontier(spark, sf_dir)
    top = df.orderBy(F.col("scheduled_at").desc(), F.col("event_id").desc()).limit(
        offset + limit
    )
    w = Window.orderBy(F.col("scheduled_at").desc(), F.col("event_id").desc())
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > offset)
        .select("event_id", "host", F.col("rn").cast("int").alias("rn"))
    )


O_PAGE_LISTING = _F_CTE + """
SELECT event_id, host, CAST(rn AS INT) AS rn
FROM (SELECT event_id, host,
             row_number() OVER (ORDER BY scheduled_at DESC, event_id DESC) AS rn
      FROM f)
WHERE rn > 10 AND rn <= 40
"""


def q_topk_common_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: most-shared content hashes above a threshold (content_hash.sql:28-32),
    deterministic ORDER BY (count desc, hash) LIMIT 20."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select(F.sha2(F.substring("text", 1, 40), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.count("*").alias("occurrence_count"))
        .filter(F.col("occurrence_count") > 1)
    )
    return counts.orderBy(
        F.col("occurrence_count").desc(), F.col("content_sha256").asc()
    ).limit(20)


O_TOPK_COMMON_HASHES = """
SELECT sha256(substr(text,1,40)) AS content_sha256, count(*) AS occurrence_count
FROM documents GROUP BY 1 HAVING count(*) > 1
ORDER BY occurrence_count DESC, content_sha256 LIMIT 20
"""


def q_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 + TTL semantics: partition the seen set into fresh vs expired by a
    cutoff on seen_at (24h Redis TTL -> partition-prunable predicate); report
    per-host counts of each (the DELETE WHERE source set)."""
    df = synth_frontier(spark, sf_dir)
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        df.withColumn("expired", F.col("scheduled_at").cast("timestamp") < cutoff)
        .groupBy("host")
        .agg(
            F.sum(F.when(F.col("expired"), 1).otherwise(0)).alias("n_expired"),
            F.sum(F.when(~F.col("expired"), 1).otherwise(0)).alias("n_fresh"),
        )
    )


O_RETENTION_EXPIRY = _F_CTE + """
SELECT host,
       CAST(sum(CASE WHEN scheduled_at < TIMESTAMP '2024-01-15 00:00:00'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
       CAST(sum(CASE WHEN scheduled_at < TIMESTAMP '2024-01-15 00:00:00'
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_fresh
FROM f GROUP BY 1
"""


def q_dlq_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: the dead-letter reporting views — unresolved counts per error
    category + retry-eligible backlog (partial-index semantics become plain
    prunable predicates)."""
    ev = _events(spark, sf_dir)
    cat = F.element_at(
        F.array(*[F.lit(c) for c in
                  ["network_error", "timeout", "server_error", "rate_limit",
                   "parse_error", "auth_error"]]),
        (F.col("event_id") % 6 + 1).cast("int"),
    )
    dlq = ev.select(
        "event_id",
        cat.alias("error_category"),
        (F.col("event_id") % 7 == 0).alias("resolved"),
        (F.col("event_id") % 3 == 0).alias("retry_eligible"),
    )
    return (
        dlq.filter(~F.col("resolved"))
        .groupBy("error_category")
        .agg(
            F.count("*").alias("n_unresolved"),
            F.sum(F.when(F.col("retry_eligible"), 1).otherwise(0)).alias("n_retry_eligible"),
        )
    )


O_DLQ_VIEWS = """
WITH dlq AS (
  SELECT event_id,
         (['network_error','timeout','server_error','rate_limit','parse_error','auth_error'])
           [CAST(event_id % 6 AS INT) + 1] AS error_category,
         event_id % 7 = 0 AS resolved,
         event_id % 3 = 0 AS retry_eligible
  FROM events
)
SELECT error_category, count(*) AS n_unresolved,
       CAST(sum(CASE WHEN retry_eligible THEN 1 ELSE 0 END) AS BIGINT) AS n_retry_eligible
FROM dlq WHERE NOT resolved GROUP BY 1
"""


def q_log_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: time-range log scan (partition-prunable predicate on the
    RANGE-partitioned log table) with per-type counts in the window."""
    ev = _events(spark, sf_dir)
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ts = F.col("ts").cast("timestamp")
    return (
        ev.filter((ts >= lo) & (ts < hi))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event_id"))
    )


O_LOG_RANGE_SCAN = """
SELECT event_type, count(*) AS n, min(event_id) AS first_event_id
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY 1
"""


def q_workflow_result_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: merge per-page ExecutionResults into step results — success = ANY
    page succeeded, error only if ALL failed (step_orchestrator.py:692-784
    semantics as one aggregation)."""
    ev = _events(spark, sf_dir)
    df = ev.select(
        F.concat(F.lit("step"), (F.col("event_id") % 4).cast("string")).alias("step"),
        (F.col("event_id") % 5 != 0).alias("success"),
        (F.col("event_id") % 7).cast("int").alias("n_extracted"),
    )
    return df.groupBy("step").agg(
        F.count("*").alias("n_results"),
        F.sum(F.when(F.col("success"), F.col("n_extracted")).otherwise(0)).alias(
            "total_extracted"
        ),
        F.max("success").alias("any_success"),
        (~F.max("success")).alias("step_failed"),
        F.sum(F.when(F.col("success"), 0).otherwise(1)).alias("n_failed"),
    )


O_WORKFLOW_RESULT_AGG = """
WITH r AS (
  SELECT 'step' || (event_id % 4) AS step,
         event_id % 5 <> 0 AS success,
         CAST(event_id % 7 AS INT) AS n_extracted
  FROM events
)
SELECT step, count(*) AS n_results,
       CAST(sum(CASE WHEN success THEN n_extracted ELSE 0 END) AS BIGINT)
         AS total_extracted,
       max(success) AS any_success,
       NOT max(success) AS step_failed,
       CAST(sum(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT) AS n_failed
FROM r GROUP BY 1
"""


def q_pagination_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: pattern detection over a mixed URL corpus (query-param, offset with
    limit, path-segment, path-embedded, none) via the vectorized kernel; the
    oracle reconstructs the expected pattern per flavor."""
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.pagination import detect_pattern

    @pandas_udf("kind string, current_page int")
    def detect_udf(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            try:
                p = detect_pattern(u)
            except ValueError:
                p = None
            rows.append(
                {"kind": p["kind"] if p else None,
                 "current_page": p["current_page"] if p else None}
            )
        return pd.DataFrame(rows)

    ev = _events(spark, sf_dir)
    n = (F.col("event_id") % 37 + 1).cast("string")
    flavor = F.col("event_id") % 5
    url = (
        F.when(flavor == 0, F.concat(F.lit("https://x.go.id/list?page="), n))
        .when(flavor == 1, F.concat(F.lit("https://x.go.id/list?offset="),
                                    ((F.col("event_id") % 37) * 20).cast("string"),
                                    F.lit("&limit=20")))
        .when(flavor == 2, F.concat(F.lit("https://x.go.id/arsip/page/"), n))
        .when(flavor == 3, F.concat(F.lit("https://x.go.id/berita-"), n, F.lit(".html")))
        .otherwise(F.lit("https://x.go.id/tentang-kami"))
    )
    df = ev.select("event_id", url.alias("url"))
    return df.select(
        "event_id", detect_udf(F.col("url")).alias("p")
    ).select("event_id", F.col("p.kind").alias("kind"), F.col("p.current_page").alias("current_page"))


O_PAGINATION_DETECT = """
SELECT event_id,
  CASE event_id % 5
    WHEN 0 THEN 'query_param'
    WHEN 1 THEN 'query_param'
    WHEN 2 THEN 'path_segment'
    WHEN 3 THEN 'path_embedded'
  END AS kind,
  CAST(CASE event_id % 5
    WHEN 0 THEN event_id % 37 + 1
    WHEN 1 THEN event_id % 37 + 1
    WHEN 2 THEN event_id % 37 + 1
    WHEN 3 THEN event_id % 37 + 1
  END AS INT) AS current_page
FROM events
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: JSON-path extraction over API-response payloads (events.props)
    with built-in get_json_object — no UDF."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        (F.get_json_object("props", "$.k").cast("int") > 50).alias("k_high"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
    )


O_JSON_EXTRACT = """
SELECT event_id,
       CAST(props->>'$.k' AS INT) AS k,
       CAST(props->>'$.k' AS INT) > 50 AS k_high,
       props->>'$.missing' AS missing_path
FROM events
"""


def q_page_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: latest-crawl-wins page MERGE on (website_id, url_hash) — the
    reference's ON CONFLICT DO UPDATE (crawled_page.sql:1-37). Existing rows
    0..399, incoming 200..599 one hour later: 0..199 keep v1, 200..399 are
    replaced by v2, 400..599 insert as v2."""
    from crawler_spark.operators.merge import merge_latest_wins

    ev = _events(spark, sf_dir).filter(F.col("event_id") < 600).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    existing = ev.filter(F.col("event_id") < 400).select(
        (F.col("event_id") % 5).cast("int").alias("website_id"),
        F.sha2(F.concat(F.lit("u"), F.col("event_id").cast("string")), 256).alias("url_hash"),
        F.lit("v1").alias("title"),
        F.unix_millis(F.col("ts")).alias("crawled_ms"),
    )
    incoming = ev.filter(F.col("event_id") >= 200).select(
        (F.col("event_id") % 5).cast("int").alias("website_id"),
        F.sha2(F.concat(F.lit("u"), F.col("event_id").cast("string")), 256).alias("url_hash"),
        F.lit("v2").alias("title"),
        (F.unix_millis(F.col("ts")) + F.lit(3600_000)).alias("crawled_ms"),
    )
    return merge_latest_wins(
        existing, incoming, keys=["website_id", "url_hash"], order_col="crawled_ms"
    )


O_PAGE_UPSERT = """
WITH ev AS (SELECT event_id, ts FROM events WHERE event_id < 600),
existing AS (
  SELECT CAST(event_id % 5 AS INT) AS website_id,
         sha256('u' || event_id) AS url_hash,
         'v1' AS title, epoch_ms(ts) AS crawled_ms
  FROM ev WHERE event_id < 400
),
incoming AS (
  SELECT CAST(event_id % 5 AS INT) AS website_id,
         sha256('u' || event_id) AS url_hash,
         'v2' AS title, epoch_ms(ts) + 3600000 AS crawled_ms
  FROM ev WHERE event_id >= 200
),
tagged AS (
  SELECT *, 0 AS src FROM existing UNION ALL SELECT *, 1 AS src FROM incoming
)
SELECT website_id, url_hash, title, crawled_ms
FROM (SELECT *, row_number() OVER (PARTITION BY website_id, url_hash
                                   ORDER BY crawled_ms DESC, src DESC) AS rn
      FROM tagged)
WHERE rn = 1
"""


def q_backoff_jitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 full precedence chain as ONE column expression: Retry-After
    (delay-seconds or HTTP-date vs a pinned 'now') overrides the
    strategy backoff; otherwise strategy delay +/-20% jitter, then
    min(max_delay, 300) (retry_policy.py:519-748). Jitter uses a portable
    integer LCG on event_id so DuckDB reproduces it bit-for-bit (the
    reference's random jitter, made deterministic for the oracle; production
    would use rand(seed))."""
    ev = _events(spark, sf_dir).select("event_id")
    initial, max_delay, mult = 2, 200, 3
    attempt = (F.col("event_id") % 5 + 1).cast("int")
    strategy = F.element_at(
        F.array(F.lit("exponential"), F.lit("linear"), F.lit("fixed")),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    base = (
        F.when(strategy == "exponential",
               F.least(F.floor(F.lit(initial) * F.pow(F.lit(mult), attempt - 1)),
                       F.lit(max_delay)))
        .when(strategy == "linear",
              F.least(F.floor(F.lit(initial) + F.lit(mult) * (attempt - 1)),
                      F.lit(max_delay)))
        .otherwise(F.least(F.lit(initial), F.lit(max_delay)))
    ).cast("long")
    amount = F.floor(base / 5).cast("long")  # int(delay * 0.2)
    lcg = (F.col("event_id") * F.lit(1103515245) + F.lit(12345)) % F.lit(2147483648)
    delta = lcg % (F.lit(2) * amount + 1) - amount
    jittered = F.greatest(F.lit(0).cast("long"), base + delta)
    retry_after = (
        F.when(F.col("event_id") % 11 == 0, F.lit("90"))
        .when(F.col("event_id") % 11 == 1, F.lit("Thu, 01 Jan 2026 00:02:00 GMT"))
        .otherwise(F.lit(None).cast("string"))
    )
    now_s = F.unix_timestamp(F.lit("2026-01-01 00:00:00").cast("timestamp"))
    ra_s = F.coalesce(
        F.expr("try_cast(retry_after AS long)"),
        F.greatest(
            F.lit(0).cast("long"),
            # 'Thu, 01 Jan 2026 00:02:00 GMT' -> strip weekday + zone (the
            # Spark 4 parser rejects 'EEE' in parse patterns); session tz is
            # UTC so the GMT wall time parses exactly
            F.unix_timestamp(
                F.expr(
                    "try_to_timestamp(replace(substring(retry_after, 6), ' GMT', ''),"
                    " 'dd MMM yyyy HH:mm:ss')"
                )
            ) - now_s,
        ),
    )
    df = ev.select(
        "event_id", strategy.alias("strategy"), attempt.alias("attempt"),
        base.alias("base_delay_s"), retry_after.alias("retry_after"),
    ).withColumn("jittered", jittered)
    return df.select(
        "event_id", "strategy", "attempt", "base_delay_s",
        F.when(
            F.col("retry_after").isNotNull(), F.least(ra_s, F.lit(max_delay).cast("long"))
        ).otherwise(
            F.least(F.col("jittered"), F.lit(max_delay).cast("long"), F.lit(300).cast("long"))
        ).alias("delay_s"),
    )


O_BACKOFF_JITTER = """
WITH e AS (
  SELECT event_id,
         CAST(event_id % 5 + 1 AS INT) AS attempt,
         ['exponential', 'linear', 'fixed'][CAST(event_id % 3 + 1 AS INT)] AS strategy
  FROM events
),
b AS (
  SELECT *,
         CAST(CASE strategy
           WHEN 'exponential' THEN least(floor(2 * power(3, attempt - 1)), 200)
           WHEN 'linear' THEN least(floor(2 + 3 * (attempt - 1)), 200)
           ELSE least(2, 200) END AS BIGINT) AS base_delay_s,
         CASE WHEN event_id % 11 = 0 THEN '90'
              WHEN event_id % 11 = 1 THEN 'Thu, 01 Jan 2026 00:02:00 GMT'
              END AS retry_after
  FROM e
),
j AS (
  SELECT *,
         base_delay_s // 5 AS amount,
         (event_id * 1103515245 + 12345) % 2147483648 AS lcg
  FROM b
)
SELECT event_id, strategy, attempt, base_delay_s,
       CASE
         WHEN retry_after = '90' THEN least(90, 200)
         WHEN retry_after IS NOT NULL THEN least(
           greatest(0, CAST(epoch(strptime(retry_after, '%a, %d %b %Y %H:%M:%S GMT'))
                       - epoch(TIMESTAMP '2026-01-01 00:00:00') AS BIGINT)), 200)
         ELSE least(greatest(0, base_delay_s + lcg % (2 * amount + 1) - amount), 200, 300)
       END AS delay_s
FROM j
"""


def q_error_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: exception-name classification ladder (retry_policy.py:143-345) as
    a pure CASE column over synthesized (name, message, module, errno)
    tuples covering every branch: explicit timeout/network names, httpx
    module-qualified names, browser-crash names, the type-NAME timeout
    substring heuristic, validation, MemoryError, OSError errno 24/28,
    unknown (k=14's timeout MESSAGE on an unknown name stays unknown —
    the reference has no message fallback, retry_policy.py:328-345)."""
    from crawler_spark.functions.frontier_exprs import (
        classify_error_col,
        is_retryable_col,
    )

    ev = _events(spark, sf_dir).select("event_id")
    k = (F.col("event_id") % 16).cast("int")
    names = [
        "TimeoutError", "ConnectTimeout", "ConnectionError", "SSLError",
        "ConnectError", "ConnectError", "BrowserCrashError", "PageClosedError",
        "PlaywrightTimeoutError", "ValueError", "MemoryError", "OSError",
        "OSError", "KeyError", "SomeError", "SomeError",
    ]
    name = F.element_at(F.array(*[F.lit(n) for n in names]), k + 1)
    module = F.when(k == 4, "httpx").otherwise("builtins")
    message = (
        F.when(k == 14, "read timeout on socket")
        .when(k == 15, "boom")
        .otherwise(F.lit(""))
    )
    errno = F.when(k == 11, 24).otherwise(F.lit(None).cast("int"))
    df = ev.select(
        "event_id", name.alias("error_name"), module.alias("module"),
        message.alias("message"), errno.alias("os_errno"),
    )
    cat = classify_error_col(
        F.col("error_name"), F.col("message"), F.col("module"), F.col("os_errno")
    )
    return df.select(
        "event_id", "error_name", "module", "os_errno",
        cat.alias("category"),
        is_retryable_col(cat).alias("retryable"),
    )


O_ERROR_CLASSIFY = """
WITH e AS (
  SELECT event_id, CAST(event_id % 16 AS INT) AS k FROM events
),
d AS (
  SELECT event_id, k,
         ['TimeoutError','ConnectTimeout','ConnectionError','SSLError',
          'ConnectError','ConnectError','BrowserCrashError','PageClosedError',
          'PlaywrightTimeoutError','ValueError','MemoryError','OSError',
          'OSError','KeyError','SomeError','SomeError'][k + 1] AS error_name,
         CASE WHEN k = 4 THEN 'httpx' ELSE 'builtins' END AS module,
         CASE WHEN k = 14 THEN 'read timeout on socket'
              WHEN k = 15 THEN 'boom' ELSE '' END AS message,
         CASE WHEN k = 11 THEN 24 END AS os_errno
  FROM e
),
c AS (
  SELECT *,
         CASE
           WHEN error_name IN ('TimeoutError','ConnectTimeout','ReadTimeout')
             THEN 'timeout'
           WHEN error_name IN ('ConnectionError','DNSError','SSLError',
                               'ConnectionRefusedError','ConnectionResetError')
             THEN 'network_error'
           WHEN module = 'httpx' AND error_name IN
                ('ConnectError','ReadError','WriteError','PoolTimeout','ProtocolError')
             THEN 'network_error'
           WHEN error_name IN ('BrowserCrashError','TargetClosedError',
                               'BrowserContextClosedError','PageClosedError')
             THEN 'browser_crash'
           WHEN lower(error_name) LIKE '%timeout%'
                OR error_name LIKE '%TimeoutException%'
             THEN 'timeout'
           WHEN error_name IN ('StepValidationError','ValidationError','ValueError')
             THEN 'validation_error'
           WHEN error_name IN ('MemoryError','OSError')
             THEN 'resource_error'
           ELSE 'unknown'
         END AS category
  FROM d
)
SELECT event_id, error_name, module, CAST(os_errno AS INT) AS os_errno, category,
       category IN ('rate_limit','timeout','server_error','network_error',
                    'browser_crash','resource_error') AS retryable
FROM c
"""


def q_scrape_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: unordered scrape-executor batch map — per-row success flags via
    mapInPandas (the Arrow batch IS the reference's batch-of-100), then the
    step-level 'error only if ALL fail' rule per batch
    (scrape_executor.py:46,71-259). Fetch outcome derives deterministically
    from sha256(url) so DuckDB replays it."""
    import hashlib

    from crawler_spark.sources.scrape import batch_outcomes, scrape_batch

    urls = synth_frontier(spark, sf_dir).select(
        "event_id", F.col("url").alias("url"),
        (F.col("event_id") % 25).cast("int").alias("batch_id"),
    )

    def fetcher(url: str) -> tuple[int, str | None]:
        h = int(hashlib.sha256(url.encode()).hexdigest()[:2], 16)
        if h % 7 == 0:
            return 404, None
        if h % 7 == 1:
            return 500, None
        return 200, "ok:" + url

    results = scrape_batch(urls, fetcher)
    outcomes = batch_outcomes(results, "batch_id")
    return results.select(
        "event_id", "batch_id", "status_code", "success", "error_category"
    ).join(outcomes.select("batch_id", "n_success", "batch_error"), "batch_id")


O_SCRAPE_BATCH = """
WITH raw AS (
  SELECT event_id,
         'HTTPS://Portal' || (user_id % 50) || '.GO.ID/cases/' || (event_id % 997)
           || '?utm_source=feed&ref=x&page=' || (event_id % 7 + 1)
           || '&b=' || (user_id % 13) || '&a=1#s' AS url
  FROM events
),
r AS (
  SELECT event_id,
         CAST(event_id % 25 AS INT) AS batch_id,
         ('0x' || substr(sha256(url), 1, 2))::INT % 7 AS h
  FROM raw
),
rows_ AS (
  SELECT event_id, batch_id,
         CAST(CASE WHEN h = 0 THEN 404 WHEN h = 1 THEN 500 ELSE 200 END AS INT)
           AS status_code,
         h NOT IN (0, 1) AS success,
         CASE WHEN h = 0 THEN 'not_found' WHEN h = 1 THEN 'server_error' END
           AS error_category
  FROM r
),
o AS (
  SELECT batch_id,
         CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
         sum(CASE WHEN success THEN 1 ELSE 0 END) = 0 AS batch_error
  FROM rows_ GROUP BY batch_id
)
SELECT rows_.batch_id, event_id, status_code, success, error_category,
       n_success, batch_error
FROM rows_ JOIN o USING (batch_id)
"""


def q_api_executor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 API step executor (api_executor.py:93-199): per-URL JSON API
    request + JSON parse + JSON-path field extraction as one mapInPandas
    batch map (sources/api.py). Outcome and body derive deterministically
    from sha256(url) and the URL's embedded case/page numbers so DuckDB
    replays every branch: 404 -> not_found, 429 -> rate_limit, invalid JSON
    -> parsing_error, else extracted fields (scalar, list-index, JSON array,
    per-field miss -> NULL)."""
    import hashlib
    import json as _json
    import re

    from crawler_spark.sources.api import api_batch

    urls = synth_frontier(spark, sf_dir).select("event_id", "url")

    def fetcher(url: str) -> tuple[int, str | None]:
        h = int(hashlib.sha256(url.encode()).hexdigest()[:2], 16)
        if h % 7 == 0:
            return 404, None
        if h % 7 == 1:
            return 429, None
        if h % 7 == 2:
            return 200, "{not json"
        case = re.search(r"/cases/(\d+)", url).group(1)
        page = int(re.search(r"page=(\d+)", url).group(1))
        return 200, _json.dumps(
            {"data": {"title": f"case-{case}",
                      "items": [f"item-{case}-1", f"item-{case}-2"]},
             "count": page}
        )

    selectors = {
        "title": "data.title",
        "first_item": "data.items.0",
        "page_count": "count",
        "items": {"selector": "data.items", "type": "array"},
        "missing": "data.nope.deep",
    }
    return api_batch(urls, fetcher, selectors).select(
        "event_id", "status_code", "success", "error_category",
        "title", "first_item", "page_count", "items", "missing",
    )


O_API_EXECUTOR = """
WITH raw AS (
  SELECT event_id,
         'HTTPS://Portal' || (user_id % 50) || '.GO.ID/cases/' || (event_id % 997)
           || '?utm_source=feed&ref=x&page=' || (event_id % 7 + 1)
           || '&b=' || (user_id % 13) || '&a=1#s' AS url,
         event_id % 997 AS case_n,
         event_id % 7 + 1 AS page
  FROM events
),
r AS (
  SELECT event_id, case_n, page,
         ('0x' || substr(sha256(url), 1, 2))::INT % 7 AS h
  FROM raw
)
SELECT event_id,
       CAST(CASE WHEN h = 0 THEN 404 WHEN h = 1 THEN 429 ELSE 200 END AS INT)
         AS status_code,
       h NOT IN (0, 1, 2) AS success,
       CASE WHEN h = 0 THEN 'not_found' WHEN h = 1 THEN 'rate_limit'
            WHEN h = 2 THEN 'parsing_error' END AS error_category,
       CASE WHEN h NOT IN (0, 1, 2) THEN 'case-' || case_n END AS title,
       CASE WHEN h NOT IN (0, 1, 2) THEN 'item-' || case_n || '-1' END AS first_item,
       CASE WHEN h NOT IN (0, 1, 2) THEN CAST(page AS VARCHAR) END AS page_count,
       CASE WHEN h NOT IN (0, 1, 2)
            THEN '["item-' || case_n || '-1", "item-' || case_n || '-2"]' END AS items,
       CAST(NULL AS VARCHAR) AS missing
FROM r
"""


def q_http_executor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 HTTP step executor (http_executor.py:68-213): per-URL page
    request + CSS/XPath selector extraction over the HTML body as one
    mapInPandas batch map (sources/api.py http_batch) — same classified
    error dataflow as the API step, no JSON parse. The page body derives
    deterministically from the URL's case number; selectors mix CSS, an
    attribute-array field, an XPath field, and a guaranteed miss."""
    import hashlib
    import re

    from crawler_spark.sources.api import http_batch

    urls = synth_frontier(spark, sf_dir).select("event_id", "url")

    def fetcher(url: str) -> tuple[int, str | None]:
        h = int(hashlib.sha256(url.encode()).hexdigest()[:2], 16)
        if h % 7 == 0:
            return 404, None
        if h % 7 == 1:
            return 500, None
        case = re.search(r"/cases/(\d+)", url).group(1)
        return 200, (
            f'<html><body><h1 class="t">Case {case}</h1>'
            f'<div id="m"><span class="nomor">NO-{case}</span></div>'
            f'<a class="dl" href="/f/{case}_1.pdf">d1</a>'
            f'<a class="dl" href="/f/{case}_2.pdf">d2</a></body></html>'
        )

    selectors = {
        "title": "h1.t",
        "nomor": {"selector": "#m span.nomor"},
        "links": {"selector": "a.dl", "attribute": "href", "type": "array"},
        "xtitle": "//h1[@class='t']/text()",
        "missing": "div.none",
    }
    return http_batch(urls, fetcher, selectors).select(
        "event_id", "status_code", "success", "error_category",
        "title", "nomor", "links", "xtitle", "missing",
    )


O_HTTP_EXECUTOR = """
WITH raw AS (
  SELECT event_id,
         'HTTPS://Portal' || (user_id % 50) || '.GO.ID/cases/' || (event_id % 997)
           || '?utm_source=feed&ref=x&page=' || (event_id % 7 + 1)
           || '&b=' || (user_id % 13) || '&a=1#s' AS url,
         event_id % 997 AS case_n
  FROM events
),
r AS (
  SELECT event_id, case_n,
         ('0x' || substr(sha256(url), 1, 2))::INT % 7 AS h
  FROM raw
)
SELECT event_id,
       CAST(CASE WHEN h = 0 THEN 404 WHEN h = 1 THEN 500 ELSE 200 END AS INT)
         AS status_code,
       h NOT IN (0, 1) AS success,
       CASE WHEN h = 0 THEN 'not_found' WHEN h = 1 THEN 'server_error' END
         AS error_category,
       CASE WHEN h NOT IN (0, 1) THEN 'Case ' || case_n END AS title,
       CASE WHEN h NOT IN (0, 1) THEN 'NO-' || case_n END AS nomor,
       CASE WHEN h NOT IN (0, 1)
            THEN '["/f/' || case_n || '_1.pdf", "/f/' || case_n || '_2.pdf"]' END
         AS links,
       CASE WHEN h NOT IN (0, 1) THEN 'Case ' || case_n END AS xtitle,
       CAST(NULL AS VARCHAR) AS missing
FROM r
"""


def q_browser_executor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 browser step executor (browser_executor.py): per-URL browser
    navigation + CSS/XPath extraction as one mapInPandas batch map
    (sources/browser.py) through the STATIC-DOM RENDER layer
    (kernels/render.py — the deterministic half of Playwright rendering;
    JS execution remains the honest hook boundary). Three config variants
    (event_id % 3) exercise the full timeout ladder (:55-80) and the
    wait_for > wait_until > 'load' precedence (:151-152); the fetcher's
    sha256-derived branches cover 404 / 503 / response-None / redirect
    final_url / META-REFRESH navigation (h=4: the raw DOM is a refresh stub
    with NO extractable fields — only the rendered target has them) /
    IFRAME inlining (h=5: the nomor span lives in the frame document, so
    raw-DOM extraction would return NULL); selector_wait hit/miss varies
    with the case number's parity on the plain branch (h=6)."""
    import hashlib
    import re

    from crawler_spark.kernels.render import static_dom_render
    from crawler_spark.sources.browser import browser_batch

    urls = synth_frontier(spark, sf_dir).select(
        "event_id", "url", (F.col("event_id") % 3).cast("int").alias("variant")
    )

    def _pages(url: str) -> str | None:
        """The render layer's corpus: refresh targets + frame documents.
        Relative srcs resolve against the RAW frontier URL (uppercase
        host form), so the match is case-insensitive on host."""
        m = re.search(r"(?i)^https://portal(\d+)\.go\.id/rendered/(\d+)$", url)
        if m:
            case = m.group(2)
            return (
                f'<html><body><h1 class="t">Case {case}</h1>'
                f'<a class="dl" href="/f/{case}.pdf">d</a></body></html>'
            )
        m = re.search(r"(?i)^https://portal(\d+)\.go\.id/frame/(\d+)$", url)
        if m:
            case = m.group(2)
            return (
                f'<html><body><div id="m"><span class="nomor">NO-{case}'
                f"</span></div></body></html>"
            )
        return None

    render = static_dom_render(_pages)

    def fetcher(url: str) -> tuple[int | None, str | None, str]:
        h = int(hashlib.sha256(url.encode()).hexdigest()[:2], 16) % 7
        if h == 0:
            return 404, None, url
        if h == 1:
            return 503, None, url
        if h == 2:  # Playwright `response is None` path -> proceeds
            return None, "<html><body></body></html>", url
        case = re.search(r"/cases/(\d+)", url).group(1)
        hostnum = re.search(r"Portal(\d+)", url).group(1)
        if h == 4:  # legacy refresh-redirect portal page
            body = (
                '<html><head><meta http-equiv="refresh" content="0; '
                f'url=/rendered/{case}"></head><body></body></html>'
            )
            # the raw stub resolves relative to the canonical host form
            return 200, body, f"https://portal{hostnum}.go.id/cases/{case}"
        if h == 5:  # detail page whose metadata block is an iframe
            body = (
                f'<html><body><h1 class="t">Case {case}</h1>'
                f'<iframe src="/frame/{case}"></iframe>'
                f'<a class="dl" href="/f/{case}.pdf">d</a></body></html>'
            )
            return 200, body, f"https://portal{hostnum}.go.id/cases/{case}"
        body = (
            f'<html><body><h1 class="t">Case {case}</h1>'
            + (
                f'<div id="m"><span class="nomor">NO-{case}</span></div>'
                if int(case) % 2 == 0
                else ""
            )
            + f'<a class="dl" href="/f/{case}.pdf">d</a></body></html>'
        )
        final = (
            f"https://portal{hostnum}.go.id/cases/{case}" if h == 3 else url
        )
        return 200, body, final

    selectors = {
        "title": "h1.t",
        "nomor": {"selector": "#m span.nomor"},
        "link": {"selector": "a.dl", "attribute": "href"},
        "missing": "div.none",
    }
    configs = [
        {  # GlobalConfig dict timeouts + legacy wait_for + CSS wait
            "timeout": {"page_load": 20, "selector_wait": 5},
            "wait_for": "domcontentloaded",
            "selector_wait": "#m span.nomor",
        },
        {  # legacy scalar timeout + selector_wait_timeout + XPath wait
            "timeout": 45,
            "selector_wait_timeout": 7,
            "wait_until": "networkidle",
            "selector_wait": "//span[@class='nomor']",
        },
        {},  # all defaults, no selector wait
    ]
    parts = [
        browser_batch(
            urls.filter(F.col("variant") == i), fetcher, selectors, cfg,
            render=render,
        )
        for i, cfg in enumerate(configs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "event_id", "variant", "status_code", "success", "error_category",
        "page_load_timeout_ms", "selector_wait_timeout_ms", "wait_until",
        "selector_wait_hit", "content_length", "final_url",
        "title", "nomor", "link", "missing",
    )


O_BROWSER_EXECUTOR = """
WITH raw AS (
  SELECT event_id,
         CAST(event_id % 3 AS INT) AS variant,
         'HTTPS://Portal' || (user_id % 50) || '.GO.ID/cases/' || (event_id % 997)
           || '?utm_source=feed&ref=x&page=' || (event_id % 7 + 1)
           || '&b=' || (user_id % 13) || '&a=1#s' AS url,
         event_id % 997 AS case_n,
         user_id % 50 AS hostnum
  FROM events
),
r AS (
  SELECT *,
         ('0x' || substr(sha256(url), 1, 2))::INT % 7 AS h,
         -- h=6 / h=3 plain page (parity nomor); h=4 RENDERED refresh
         -- target; h=5 RENDERED page with the frame document inlined
         -- under its iframe element (kernels/render.py semantics)
         CASE
           WHEN h = 4 THEN
             '<html><body><h1 class="t">Case ' || case_n
             || '</h1><a class="dl" href="/f/' || case_n
             || '.pdf">d</a></body></html>'
           WHEN h = 5 THEN
             '<html><body><h1 class="t">Case ' || case_n
             || '</h1><iframe src="/frame/' || case_n
             || '"><div id="m"><span class="nomor">NO-' || case_n
             || '</span></div></iframe><a class="dl" href="/f/' || case_n
             || '.pdf">d</a></body></html>'
           ELSE
             '<html><body><h1 class="t">Case ' || case_n || '</h1>'
             || CASE WHEN case_n % 2 = 0
                     THEN '<div id="m"><span class="nomor">NO-' || case_n
                          || '</span></div>' ELSE '' END
             || '<a class="dl" href="/f/' || case_n || '.pdf">d</a></body></html>'
         END AS body
  FROM raw
)
SELECT event_id, variant,
       CAST(CASE WHEN h = 0 THEN 404 WHEN h = 1 THEN 503
                 WHEN h = 2 THEN NULL ELSE 200 END AS INT) AS status_code,
       h NOT IN (0, 1) AS success,
       CASE WHEN h = 0 THEN 'not_found' WHEN h = 1 THEN 'server_error' END
         AS error_category,
       CAST(CASE variant WHEN 0 THEN 20000 WHEN 1 THEN 45000
                         ELSE 30000 END AS INT) AS page_load_timeout_ms,
       CAST(CASE variant WHEN 0 THEN 5000 WHEN 1 THEN 7000
                         ELSE 10000 END AS INT) AS selector_wait_timeout_ms,
       CASE variant WHEN 0 THEN 'domcontentloaded' WHEN 1 THEN 'networkidle'
                    ELSE 'load' END AS wait_until,
       CASE WHEN variant = 2 OR h IN (0, 1) THEN NULL
            WHEN h = 2 THEN FALSE
            WHEN h = 4 THEN FALSE   -- rendered refresh target has no #m
            WHEN h = 5 THEN TRUE    -- inlined frame carries the span
            ELSE case_n % 2 = 0 END AS selector_wait_hit,
       CAST(CASE WHEN h IN (0, 1) THEN NULL
                 WHEN h = 2 THEN length('<html><body></body></html>')
                 ELSE length(body) END AS INT) AS content_length,
       CASE WHEN h IN (0, 1) THEN NULL
            WHEN h IN (3, 4, 5)
              THEN 'https://portal' || hostnum || '.go.id/cases/' || case_n
            ELSE url END AS final_url,
       CASE WHEN h NOT IN (0, 1, 2) THEN 'Case ' || case_n END AS title,
       CASE WHEN h = 5 THEN 'NO-' || case_n
            WHEN h IN (3, 6) AND case_n % 2 = 0
            THEN 'NO-' || case_n END AS nomor,
       CASE WHEN h NOT IN (0, 1, 2)
            THEN '/f/' || case_n || '.pdf' END AS link,
       CAST(NULL AS VARCHAR) AS missing
FROM r
"""


def q_pagination_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 strategy pick (crawler/services/pagination.py:50-143,292-315):
    template -> auto-detect -> selector fallback -> single page -> disabled,
    with the generated page-URL ranges, via the plan_pagination kernel in a
    pandas UDF (strategy choice is string/dict logic, not columnar)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.pagination import plan_pagination

    ev = _events(spark, sf_dir).select("event_id", "user_id")
    # non-?page variants use a digit-free path: auto-detect would otherwise
    # claim the trailing case number as a path-embedded page counter
    seed = F.when(
        F.col("event_id") % 4 == 0,
        F.concat(F.lit("https://portal"), (F.col("user_id") % 5).cast("string"),
                 F.lit(".go.id/cases/"), (F.col("event_id") % 97).cast("string"),
                 F.lit("?page=3")),
    ).otherwise(
        F.concat(F.lit("https://portal"), (F.col("user_id") % 5).cast("string"),
                 F.lit(".go.id/cases/detail")),
    )
    df = ev.select("event_id", seed.alias("seed_url"),
                   (F.col("event_id") % 4).cast("int").alias("variant"))

    out_type = T.StructType([
        T.StructField("strategy", T.StringType()),
        T.StructField("n_urls", T.IntegerType()),
        T.StructField("first_url", T.StringType()),
        T.StructField("last_url", T.StringType()),
    ])
    configs = {
        0: {"max_pages": 5},                     # auto-detect ?page=3
        1: {"selector": ".next"},                # selector fallback
        2: {"url_template": "https://tpl.go.id/list?page={page}", "max_pages": 5},
        3: {"enabled": False},
    }

    @pandas_udf(out_type)
    def _plan(seed_s, variant_s):
        rows = []
        for s, v in zip(seed_s, variant_s):
            strategy, urls = plan_pagination(s, configs[int(v)])
            rows.append((strategy, len(urls), urls[0], urls[-1]))
        import pandas as pd

        return pd.DataFrame(rows, columns=["strategy", "n_urls", "first_url", "last_url"])

    return df.select(
        "event_id", "variant", _plan("seed_url", "variant").alias("p")
    ).select("event_id", "variant", "p.strategy", "p.n_urls", "p.first_url", "p.last_url")


O_PAGINATION_STRATEGY = """
WITH e AS (
  SELECT event_id, CAST(event_id % 4 AS INT) AS variant,
         'https://portal' || (user_id % 5) || '.go.id/cases/' || (event_id % 97)
           AS numbered,
         'https://portal' || (user_id % 5) || '.go.id/cases/detail' AS plain
  FROM events
)
SELECT event_id, variant,
       CASE variant WHEN 0 THEN 'detected:query_param'
                    WHEN 1 THEN 'selector_fallback'
                    WHEN 2 THEN 'template'
                    ELSE 'disabled' END AS strategy,
       CAST(CASE variant WHEN 0 THEN 3 WHEN 2 THEN 5 ELSE 1 END AS INT) AS n_urls,
       CASE variant WHEN 0 THEN numbered || '?page=3'
                    WHEN 2 THEN 'https://tpl.go.id/list?page=1'
                    ELSE plain END AS first_url,
       CASE variant WHEN 0 THEN numbered || '?page=5'
                    WHEN 2 THEN 'https://tpl.go.id/list?page=5'
                    ELSE plain END AS last_url
FROM e
"""


def q_url_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 are_urls_equivalent (url.py:181-204): normalize both sides, compare
    — tracking params / case / param order never break equivalence, a real
    query-param change does."""
    ev = _events(spark, sf_dir).select("event_id", "user_id")
    hn = (F.col("user_id") % 5).cast("string")
    cid = (F.col("event_id") % 97).cast("string")
    base = F.concat(F.lit("https://portal"), hn, F.lit(".go.id/cases/"), cid)
    # scheme+host case-INsensitive, path case-SENSITIVE (url.py semantics):
    # the equivalent variant uppercases only the scheme+host
    shouting_host = F.concat(
        F.lit("HTTPS://PORTAL"), hn, F.lit(".GO.ID/cases/"), cid
    )
    a = F.concat(base, F.lit("?b=2&a=1&utm_source=x"))
    b = (
        F.when(F.col("event_id") % 3 == 0,
               F.concat(shouting_host, F.lit("?a=1&b=2&fbclid=y#frag")))
        .when(F.col("event_id") % 3 == 1, F.concat(base, F.lit("?b=3&a=1")))
        .otherwise(F.concat(base, F.lit("?b=2&a=1&utm_source=x")))
    )
    df = ev.select("event_id", a.alias("url_a"), b.alias("url_b"))
    return df.select(
        "event_id", "url_a", "url_b",
        (normalize_url_udf(F.col("url_a")) == normalize_url_udf(F.col("url_b"))
         ).alias("equivalent"),
    )


O_URL_EQUIVALENCE = """
WITH e AS (
  SELECT event_id,
         'https://portal' || (user_id % 5) || '.go.id/cases/' || (event_id % 97)
           AS base,
         'HTTPS://PORTAL' || (user_id % 5) || '.GO.ID/cases/' || (event_id % 97)
           AS shouting
  FROM events
)
SELECT event_id,
       base || '?b=2&a=1&utm_source=x' AS url_a,
       CASE WHEN event_id % 3 = 0 THEN shouting || '?a=1&b=2&fbclid=y#frag'
            WHEN event_id % 3 = 1 THEN base || '?b=3&a=1'
            ELSE base || '?b=2&a=1&utm_source=x' END AS url_b,
       event_id % 3 <> 1 AS equivalent
FROM e
"""


def q_frontier_peek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 peek/size + R6 due-filter poll: rows with not_before <= now
    (event_id % 5 simulates the retry schedule), global top-10 by priority
    score (ZRANGE-withscores analogue, priority_queue.py:327-421) carrying
    the queue size — TakeOrdered + a 10-row window, never a global
    single-task window."""
    df = synth_frontier(spark, sf_dir).withColumn(
        "priority_score", priority_score_col(F.col("priority"), F.col("scheduled_at"))
    )
    due = df.filter(F.col("event_id") % 5 != 0)  # not_before <= now
    size = due.agg(F.count("*").alias("queue_size"))
    top = due.orderBy(F.col("priority_score").asc(), F.col("event_id").asc()).limit(10)
    w = Window.orderBy(F.col("priority_score").asc(), F.col("event_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .crossJoin(size)
        .select("rank", "event_id", "host", "priority_score", "queue_size")
    )


O_FRONTIER_PEEK = _F_CTE + """
, due AS (
  SELECT event_id, host,
         CAST(10 - priority AS BIGINT) * 1000000000000 + epoch_ms(scheduled_at)
           AS priority_score
  FROM f WHERE event_id % 5 <> 0
)
SELECT CAST(rank AS INT) AS rank, event_id, host, priority_score,
       (SELECT count(*) FROM due) AS queue_size
FROM (SELECT *, row_number() OVER (ORDER BY priority_score, event_id) AS rank
      FROM due)
WHERE rank <= 10
"""


def q_crawl_executor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 crawl-executor fan-out (crawl_executor.py:73-249,305-340) as one
    declarative plan: seed -> pagination expand (3 pages) -> fetch (status
    from sha256(url), partial failures) -> REAL selector extraction over the
    page HTML -> absolutize -> order-preserving cross-page dedup (U7: a
    '/common' link repeats on every page, first page wins) -> per-seed
    metadata counts with the all-pages-failed error rule."""
    from crawler_spark.functions.selector_udfs import extract_with_selectors
    from crawler_spark.functions.url_udfs import resolve_relative_udf

    seeds = (
        _events(spark, sf_dir).filter(F.col("event_id") < 50)
        .select(
            F.col("event_id").alias("seed_id"),
            F.concat(F.lit("portal"), (F.col("user_id") % 5).cast("string"),
                     F.lit(".go.id")).alias("host"),
        )
    )
    pages = seeds.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("p")
    ).withColumn(
        "page_url",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/list/"),
                 F.col("seed_id").cast("string"), F.lit("?page="),
                 F.col("p").cast("string")),
    ).withColumn(
        "status",
        F.when(F.conv(F.substring(F.sha2(F.col("page_url"), 256), 1, 2), 16, 10)
               .cast("int") % 5 == 0, 404)
        .when(F.conv(F.substring(F.sha2(F.col("page_url"), 256), 1, 2), 16, 10)
              .cast("int") % 5 == 1, 500)
        .otherwise(200).cast("int"),
    )
    ok = pages.filter(F.col("status") == 200).withColumn(
        "html",
        F.concat(
            F.lit('<div><a class="item" href="/det/'), F.col("seed_id").cast("string"),
            F.lit("/"), F.col("p").cast("string"), F.lit('/0">x</a>'),
            F.lit('<a class="item" href="/det/'), F.col("seed_id").cast("string"),
            F.lit("/"), F.col("p").cast("string"), F.lit('/1">y</a>'),
            F.lit('<a class="item" href="/common/'), F.col("seed_id").cast("string"),
            F.lit('">c</a></div>'),
        ),
    )
    extracted = extract_with_selectors(
        ok, "html", {"links": {"selector": "a.item", "attribute": "href", "type": "array"}}
    ).select(
        "seed_id", "p", "page_url", F.posexplode("extracted.links").alias("pos", "href")
    ).withColumn("url", resolve_relative_udf(F.col("href"), F.col("page_url")))
    # U7 order-preserving dedup across the seed's pages: first (p, pos) wins
    w = Window.partitionBy("seed_id", "url").orderBy("p", "pos")
    unique = (
        extracted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("seed_id", "url", F.col("p").alias("src_page"),
                F.col("pos").cast("int").alias("pos"))
    )
    meta = pages.groupBy("seed_id").agg(
        F.sum((F.col("status") == 200).cast("int")).alias("pages_ok"),
        (F.sum((F.col("status") == 200).cast("int")) == 0).alias("all_failed"),
    )
    # reference: error only if ALL pages fail -> those seeds emit one NULL-url
    # row carrying the error outcome instead of extracted rows
    failed_rows = meta.filter(F.col("all_failed")).select(
        "seed_id", F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("int").alias("src_page"),
        F.lit(None).cast("int").alias("pos"),
    )
    return (
        unique.unionByName(failed_rows)
        .join(meta, "seed_id")
        .select("seed_id", "url", "src_page", "pos",
                F.col("pages_ok").cast("int"), "all_failed")
    )


O_CRAWL_EXECUTOR = """
WITH seeds AS (
  SELECT event_id AS seed_id,
         'portal' || (user_id % 5) || '.go.id' AS host
  FROM events WHERE event_id < 50
),
pages AS (
  SELECT seed_id, host, t.p,
         'https://' || host || '/list/' || seed_id || '?page=' || t.p AS page_url
  FROM seeds CROSS JOIN generate_series(1, 3) t(p)
),
st AS (
  SELECT *, ('0x' || substr(sha256(page_url), 1, 2))::INT % 5 AS h FROM pages
),
fetched AS (
  SELECT seed_id, host, p, page_url,
         CASE WHEN h = 0 THEN 404 WHEN h = 1 THEN 500 ELSE 200 END AS status
  FROM st
),
links AS (
  SELECT seed_id, p, t.pos,
         CASE t.pos
           WHEN 0 THEN 'https://' || host || '/det/' || seed_id || '/' || p || '/0'
           WHEN 1 THEN 'https://' || host || '/det/' || seed_id || '/' || p || '/1'
           ELSE 'https://' || host || '/common/' || seed_id
         END AS url
  FROM fetched CROSS JOIN generate_series(0, 2) t(pos)
  WHERE status = 200
),
uniq AS (
  SELECT seed_id, url, p AS src_page, CAST(pos AS INT) AS pos
  FROM (SELECT *, row_number() OVER (PARTITION BY seed_id, url ORDER BY p, pos)
               AS rn
        FROM links)
  WHERE rn = 1
),
meta AS (
  SELECT seed_id,
         CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS INT) AS pages_ok,
         sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) = 0 AS all_failed
  FROM fetched GROUP BY seed_id
),
rows_ AS (
  SELECT seed_id, url, CAST(src_page AS INT) AS src_page, pos FROM uniq
  UNION ALL
  SELECT seed_id, NULL, NULL, NULL FROM meta WHERE all_failed
)
SELECT r.seed_id, r.url, r.src_page, r.pos, m.pages_ok, m.all_failed
FROM rows_ r JOIN meta m USING (seed_id)
"""


def q_idempotent_enqueue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 ZADD-NX enqueue (priority_queue.py:157-234): colliding new rows are
    dropped and existing scores never move; within-batch duplicates collapse
    first-wins before the enqueue (U7 composition)."""
    from crawler_spark.operators.dedup import first_by_order
    from crawler_spark.operators.frontier import enqueue_idempotent

    ev = _events(spark, sf_dir).select("event_id")
    existing = ev.filter(F.col("event_id") % 4 == 0).select(
        F.col("event_id").alias("job_id"),
        (F.col("event_id") + 1000).cast("long").alias("score"),
        F.lit("existing").alias("src"),
    )
    incoming = ev.select(
        ((F.col("event_id") / 2).cast("long") * 2).alias("job_id"),
        (F.col("event_id") + 2000).cast("long").alias("score"),
        F.lit("new").alias("src"),
        F.col("event_id").alias("arrival"),
    )
    batch = first_by_order(incoming, "job_id", ["arrival"]).drop("arrival")
    return enqueue_idempotent(
        existing, batch, key="job_id", dedup_batch=False
    )


O_IDEMPOTENT_ENQUEUE = """
WITH existing AS (
  SELECT event_id AS job_id, CAST(event_id + 1000 AS BIGINT) AS score,
         'existing' AS src
  FROM events WHERE event_id % 4 = 0
),
batch AS (
  SELECT job_id, score, 'new' AS src FROM (
    SELECT (event_id // 2) * 2 AS job_id,
           CAST(event_id + 2000 AS BIGINT) AS score,
           row_number() OVER (PARTITION BY (event_id // 2) * 2
                              ORDER BY event_id) AS rn
    FROM events) WHERE rn = 1
)
SELECT * FROM existing
UNION ALL
SELECT b.* FROM batch b ANTI JOIN existing e USING (job_id)
"""


def q_step_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 semantic step-input validation (step_validator.py:215-283) over
    every input-shape branch, errors-as-data (non-strict mode)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.stepvalidate import validate_input

    ev = _events(spark, sf_dir).select(
        "event_id", (F.col("event_id") % 6).cast("int").alias("variant")
    )

    out_type = T.StructType([
        T.StructField("step_type", T.StringType()),
        T.StructField("n_errors", T.IntegerType()),
        T.StructField("first_error", T.StringType()),
    ])

    @pandas_udf(out_type)
    def _validate(variant):
        cases = [
            ("crawl", {"url": "https://a.go.id"}),
            ("crawl", {"url": "  "}),
            ("crawl", {"url": []}),
            ("scrape", {"urls": ["https://a", "https://b"]}),
            ("scrape", {"urls": ["https://a", ""]}),
            ("crawl", {}),
        ]
        rows = []
        for v in variant:
            step_type, data = cases[int(v)]
            errors = validate_input("s", step_type, data, strict=False)
            rows.append((step_type, len(errors), errors[0] if errors else None))
        return pd.DataFrame(rows, columns=["step_type", "n_errors", "first_error"])

    return ev.select(
        "event_id", "variant", _validate("variant").alias("r")
    ).select("event_id", "variant", "r.step_type", "r.n_errors", "r.first_error")


O_STEP_VALIDATION = """
SELECT event_id, CAST(event_id % 6 AS INT) AS variant,
       CASE WHEN event_id % 6 IN (3, 4) THEN 'scrape' ELSE 'crawl' END AS step_type,
       CAST(CASE WHEN event_id % 6 IN (0, 3) THEN 0 ELSE 1 END AS INT) AS n_errors,
       CASE event_id % 6
         WHEN 1 THEN 'URL cannot be empty string'
         WHEN 2 THEN 'URL list cannot be empty'
         WHEN 4 THEN 'URL at index 1 cannot be empty string'
         WHEN 5 THEN 'crawl step requires ''url'''
       END AS first_error
FROM events
"""


def q_varsub_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 ${namespace.path} substitution + X9 condition evaluation
    (variable_substitution.py, condition_evaluator.py) through the kernels
    in one vectorized pass, per-row contexts built from event columns."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.workflow import evaluate_condition, substitute_variables

    ev = _events(spark, sf_dir).select("event_id", "user_id")

    out_type = T.StructType([
        T.StructField("resolved", T.StringType()),
        T.StructField("run_step", T.BooleanType()),
        T.StructField("missing_is_false", T.BooleanType()),
    ])

    @pandas_udf(out_type)
    def _wf(event_id, user_id):
        rows = []
        for e, u in zip(event_id, user_id):
            ctx = {
                "input": {"url": f"https://portal{int(u) % 5}.go.id/cases/{int(e) % 97}"},
                "pagination": {"current_page": int(e) % 7 + 1},
            }
            resolved = substitute_variables(
                "crawl ${input.url} page ${pagination.current_page}", ctx
            )
            steps = {"fetch": {"count": int(e) % 100}}
            rows.append((
                resolved,
                evaluate_condition("{{fetch.count}} > 50", steps),
                evaluate_condition("exists {{nope.field}}", steps),
            ))
        return pd.DataFrame(rows, columns=["resolved", "run_step", "missing_is_false"])

    return ev.select("event_id", _wf("event_id", "user_id").alias("r")).select(
        "event_id", "r.resolved", "r.run_step", "r.missing_is_false"
    )


O_VARSUB_CONDITIONS = """
SELECT event_id,
       'crawl https://portal' || (user_id % 5) || '.go.id/cases/' || (event_id % 97)
         || ' page ' || (event_id % 7 + 1) AS resolved,
       (event_id % 100) > 50 AS run_step,
       FALSE AS missing_is_false
FROM events
"""


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots.txt gating (north-rule addition; the reference has NO robots
    handling — SURVEY.md header note). Synthesizes one robots.txt PER HOST
    from structured columns (two UA groups, comments, Allow/Disallow with a
    '$' end-anchor and a '*' wildcard, Crawl-delay), round-trips it through
    the RFC 9309 kernel (parse -> group select -> longest-match decide), and
    emits the allow/deny + crawl-delay decision per request. The oracle
    re-derives each decision constructively from the same columns — a parser
    that mis-handles grouping, anchors, wildcards, or longest-match loses."""
    from crawler_spark.functions.robots_udfs import robots_decide_udf

    ev = _events(spark, sf_dir).select("event_id", "user_id")
    h = (F.col("user_id") % 50).cast("int")  # host bucket
    c = (h % 5).cast("string")  # per-host cases prefix digit
    delay = F.concat((h % 7 + 1).cast("string"), F.lit(".5"))
    robots_txt = F.concat(
        F.lit("# synthetic robots\n\nUser-agent: lexibot\nUser-agent: reserved-bot\n"
              "Disallow: /private/\nAllow: /private/pub\nCrawl-delay: "),
        delay,
        F.lit("\n\nUser-agent: *\nDisallow: /cases/"), c,
        F.lit("\nAllow: /cases/"), c, F.lit("0$\nDisallow: /tmp/*x\n"),
    )
    ua = F.when(F.col("event_id") % 13 < 6, F.lit("lexibot/1.0")).otherwise(
        F.lit("crawlerx/2.0")
    )
    v = (F.col("event_id") % 6).cast("int")
    k97 = (F.col("event_id") % 97).cast("string")
    path = (
        F.when(v == 0, F.concat(F.lit("/private/doc"), k97))
        .when(v == 1, F.concat(F.lit("/private/pub/d"), k97))
        .when(v == 2, F.concat(F.lit("/cases/"), c, F.lit("0")))
        .when(v == 3, F.concat(F.lit("/cases/"), c, (F.col("event_id") % 9).cast("string")))
        .when(v == 4, F.concat(F.lit("/tmp/a"),
                               F.when(F.col("event_id") % 2 == 0, F.lit("x")).otherwise(F.lit("y"))))
        .otherwise(F.concat(F.lit("/docs/d"), k97))
    )
    decide = robots_decide_udf()
    return (
        ev.select(
            "event_id",
            ua.alias("ua"),
            path.alias("path"),
            decide(robots_txt, ua, path).alias("r"),
        )
        .select("event_id", "ua", "path", "r.allowed", "r.crawl_delay_s")
    )


O_ROBOTS_GATE = """
WITH r AS (
  SELECT event_id,
         CAST(user_id % 50 AS INT) AS h,
         CAST(event_id % 6 AS INT) AS v,
         (event_id % 13) < 6 AS lexi
  FROM events
)
SELECT event_id,
       CASE WHEN lexi THEN 'lexibot/1.0' ELSE 'crawlerx/2.0' END AS ua,
       CASE v
         WHEN 0 THEN '/private/doc' || (event_id % 97)
         WHEN 1 THEN '/private/pub/d' || (event_id % 97)
         WHEN 2 THEN '/cases/' || (h % 5) || '0'
         WHEN 3 THEN '/cases/' || (h % 5) || (event_id % 9)
         WHEN 4 THEN '/tmp/a' || CASE WHEN event_id % 2 = 0 THEN 'x' ELSE 'y' END
         ELSE '/docs/d' || (event_id % 97)
       END AS path,
       CASE WHEN lexi THEN v <> 0             -- lexibot group: only /private/* rules
            ELSE CASE v                        -- '*' group
              WHEN 3 THEN (event_id % 9) = 0   -- anchored Allow '/cases/c0$' wins only exactly
              WHEN 4 THEN (event_id % 2) <> 0  -- '/tmp/*x' wildcard disallow
              ELSE TRUE                        -- v2 anchored allow; v0/v1/v5 unmatched
            END
       END AS allowed,
       CASE WHEN lexi THEN (h % 7 + 1) + 0.5 END AS crawl_delay_s
FROM r
"""


def q_workflow_toposort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 dependency-graph build + deterministic Kahn toposort
    (dependency_validator.py:63-269): seven fixed workflow shapes covering
    linear chains, diamonds, lexicographic tie-breaks, condition-reference
    edges, cycle reporting (exact DFS cycle path), duplicate-name and
    missing-dependency errors — all error text oracled verbatim."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.workflow import (
        WorkflowValidationError,
        build_dependency_graph,
        topological_order,
    )

    ev = _events(spark, sf_dir).select(
        "event_id", (F.col("event_id") % 7).cast("int").alias("variant")
    )

    cases = [
        [{"name": "a"}, {"name": "b", "input_from": "a"},
         {"name": "c", "input_from": "b"}, {"name": "d", "input_from": "c"}],
        [{"name": "a"}, {"name": "b", "input_from": "a"},
         {"name": "c", "input_from": "a"}, {"name": "d", "input_from": ["b", "c"]}],
        [{"name": "z"}, {"name": "m"}, {"name": "a", "input_from": "z"},
         {"name": "b", "input_from": "m"}],
        [{"name": "a", "input_from": "b"}, {"name": "b", "input_from": "a"},
         {"name": "c"}],
        [{"name": "fetch"}, {"name": "parse", "skip_if": "{{fetch.count}} == 0"}],
        [{"name": "a"}, {"name": "a"}],
        [{"name": "b", "input_from": "ghost"}],
    ]

    out_type = T.StructType([
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_steps", T.IntegerType()),
        T.StructField("order_csv", T.StringType()),
        T.StructField("err", T.StringType()),
    ])

    @pandas_udf(out_type)
    def _topo(variant):
        rows = []
        for vv in variant:
            steps = cases[int(vv)]
            try:
                order = topological_order(build_dependency_graph(steps))
                rows.append((True, len(steps), ",".join(order), None))
            except WorkflowValidationError as e:
                rows.append((False, len(steps), None, str(e)))
        return pd.DataFrame(rows, columns=["ok", "n_steps", "order_csv", "err"])

    return ev.select("event_id", "variant", _topo("variant").alias("r")).select(
        "event_id", "variant", "r.ok", "r.n_steps", "r.order_csv", "r.err"
    )


O_WORKFLOW_TOPOSORT = """
SELECT event_id, CAST(event_id % 7 AS INT) AS variant,
       (event_id % 7) NOT IN (3, 5, 6) AS ok,
       CAST(CASE event_id % 7 WHEN 0 THEN 4 WHEN 1 THEN 4 WHEN 2 THEN 4
                              WHEN 3 THEN 3 WHEN 4 THEN 2 WHEN 5 THEN 2
                              ELSE 1 END AS INT) AS n_steps,
       CASE event_id % 7 WHEN 0 THEN 'a,b,c,d' WHEN 1 THEN 'a,b,c,d'
                         WHEN 2 THEN 'm,b,z,a' WHEN 4 THEN 'fetch,parse'
       END AS order_csv,
       CASE event_id % 7
         WHEN 3 THEN 'dependency cycle: a -> b -> a'
         WHEN 5 THEN 'duplicate step names: [''a'']'
         WHEN 6 THEN 'step ''b'' depends on unknown step(s): [''ghost'']'
       END AS err
FROM events
"""


def q_config_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 config merge (step_orchestrator.py:626-676): global ⊕ step with
    one-level deep-merge for the policy sections (rate_limit/timeout/retry/
    headers — a step overriding rate_limit.rps keeps the global burst) and
    wholesale replacement for everything else. Four merge shapes exercised
    per event row through the kernel; the oracle states the expected merged
    values as a CASE table."""
    import json as _json

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.workflow import merge_config

    ev = _events(spark, sf_dir).select(
        "event_id", (F.col("event_id") % 4).cast("int").alias("variant")
    )
    out_type = T.StructType([
        T.StructField("rps", T.DoubleType()),
        T.StructField("burst", T.IntegerType()),
        T.StructField("timeout_s", T.IntegerType()),
        T.StructField("connect_s", T.IntegerType()),
        T.StructField("selector", T.StringType()),
        T.StructField("meta_json", T.StringType()),
    ])
    g = {"timeout": {"seconds": 30, "connect": 5},
         "rate_limit": {"rps": 2, "burst": 10},
         "selector": "g", "meta": {"a": 1}}
    steps = [
        {},
        {"rate_limit": {"rps": 0.5}},
        {"timeout": {"seconds": 60}, "selector": "s"},
        {"meta": {"b": 2}, "rate_limit": {"burst": 3}},
    ]

    @pandas_udf(out_type)
    def _merge(variant):
        rows = []
        for vv in variant:
            m = merge_config(g, steps[int(vv)])
            rows.append((
                float(m["rate_limit"]["rps"]), int(m["rate_limit"]["burst"]),
                int(m["timeout"]["seconds"]), int(m["timeout"]["connect"]),
                m["selector"], _json.dumps(m["meta"], sort_keys=True),
            ))
        return pd.DataFrame(rows, columns=[
            "rps", "burst", "timeout_s", "connect_s", "selector", "meta_json"
        ])

    return ev.select("event_id", "variant", _merge("variant").alias("r")).select(
        "event_id", "variant", "r.rps", "r.burst", "r.timeout_s",
        "r.connect_s", "r.selector", "r.meta_json",
    )


O_CONFIG_MERGE = """
SELECT event_id, CAST(event_id % 4 AS INT) AS variant,
       CASE event_id % 4 WHEN 1 THEN 0.5 ELSE 2.0 END AS rps,
       CAST(CASE event_id % 4 WHEN 3 THEN 3 ELSE 10 END AS INT) AS burst,
       CAST(CASE event_id % 4 WHEN 2 THEN 60 ELSE 30 END AS INT) AS timeout_s,
       CAST(5 AS INT) AS connect_s,
       CASE event_id % 4 WHEN 2 THEN 's' ELSE 'g' END AS selector,
       CASE event_id % 4 WHEN 3 THEN '{"b": 2}' ELSE '{"a": 1}' END AS meta_json
FROM events
"""


def q_data_attr_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 data-attribute URLs (url_extractor.py:330-384): JS-driven
    navigation targets on non-anchor elements — data-url > data-href >
    data-link precedence per element, anchors keep their text, script
    content is never scanned. One variant per event through the same
    extract_page kernel the crawl loop uses."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.htmlparse import extract_page

    ev = _events(spark, sf_dir).select(
        "event_id", (F.col("event_id") % 5).cast("int").alias("variant"),
        F.col("event_id").cast("string").alias("ids"),
    )
    out_type = T.StructType([
        T.StructField("n_links", T.IntegerType()),
        T.StructField("href", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ])

    @pandas_udf(out_type)
    def _extract(variant, ids):
        rows = []
        for vv, i in zip(variant, ids):
            v = int(vv)
            if v == 0:
                html = f'<div data-url="/d/{i}">x</div>'
            elif v == 1:
                html = (f'<span data-url="/u/{i}" data-href="/h/{i}"'
                        f' data-link="/l/{i}">x</span>')
            elif v == 2:
                html = f'<a href="/a/{i}">Anchor {i}</a>'
            elif v == 3:
                html = f'<script>var x = \'<div data-url="/s/{i}"></div>\';</script>'
            else:
                html = f'<button data-link="/b/{i}">Go</button>'
            links = extract_page(html)["links"]
            href, anchor = (links[0][0], links[0][1]) if links else (None, None)
            rows.append((len(links), href, anchor))
        return pd.DataFrame(rows, columns=["n_links", "href", "anchor"])

    return ev.select(
        "event_id", "variant", _extract("variant", "ids").alias("r")
    ).select("event_id", "variant", "r.n_links", "r.href", "r.anchor")


O_DATA_ATTR_EXTRACT = """
SELECT event_id, CAST(event_id % 5 AS INT) AS variant,
       CAST(CASE WHEN event_id % 5 = 3 THEN 0 ELSE 1 END AS INT) AS n_links,
       CASE event_id % 5
         WHEN 0 THEN '/d/' || event_id
         WHEN 1 THEN '/u/' || event_id
         WHEN 2 THEN '/a/' || event_id
         WHEN 4 THEN '/b/' || event_id
       END AS href,
       CASE event_id % 5 WHEN 2 THEN 'Anchor ' || event_id
                         WHEN 3 THEN NULL ELSE '' END AS anchor
FROM events
"""


def q_cron_next_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 cron next-run (cron.py:9-73 semantics, from-scratch kernel) over
    the SQL-expressible schedule family: minute steps, daily, weekly,
    @monthly alias, hour steps, and a fixed-offset timezone (Etc/GMT-7 =
    UTC+7; DST zones stay pytest-gated — the oracle can't replay IANA
    transition tables). base_time = the event's own timestamp, so every row
    exercises a different next-run boundary."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.cron import calculate_next_run

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", (F.col("event_id") % 6).cast("int").alias("variant")
    )

    scheds = [
        ("*/15 * * * *", "UTC"),
        ("0 3 * * *", "UTC"),
        ("30 2 * * 1", "UTC"),
        ("@monthly", "UTC"),
        ("0 */6 * * *", "UTC"),
        ("0 3 * * *", "Etc/GMT-7"),
    ]

    out_type = T.StructType([
        T.StructField("cron_expr", T.StringType()),
        T.StructField("tz", T.StringType()),
        T.StructField("next_run", T.TimestampType()),
    ])

    @pandas_udf(out_type)
    def _next(variant, ts):
        from datetime import UTC as _UTC

        rows = []
        for vv, t in zip(variant, ts):
            expr, tz = scheds[int(vv)]
            base = t.to_pydatetime().replace(tzinfo=_UTC)  # session tz is UTC
            nxt = calculate_next_run(expr, base, timezone=tz)
            rows.append((expr, tz, nxt.astimezone(_UTC).replace(tzinfo=None)))
        return pd.DataFrame(rows, columns=["cron_expr", "tz", "next_run"])

    return ev.select("event_id", "variant", _next("variant", "ts").alias("r")).select(
        "event_id", "variant", "r.cron_expr", "r.tz", "r.next_run"
    )


O_CRON_NEXT_RUN = """
WITH c AS (
  SELECT event_id, CAST(event_id % 6 AS INT) AS variant, ts,
         date_trunc('day', ts) + INTERVAL 3 HOUR AS daily3,
         date_trunc('day', ts + INTERVAL 7 HOUR) + INTERVAL 3 HOUR AS daily3_l,
         date_trunc('day', ts)
           + ((1 - CAST(extract(dow FROM ts) AS INT) + 7) % 7) * INTERVAL 1 DAY
           + INTERVAL 2 HOUR + INTERVAL 30 MINUTE AS mon230
  FROM events
)
SELECT event_id, variant,
       CASE variant WHEN 0 THEN '*/15 * * * *' WHEN 1 THEN '0 3 * * *'
                    WHEN 2 THEN '30 2 * * 1' WHEN 3 THEN '@monthly'
                    WHEN 4 THEN '0 */6 * * *' ELSE '0 3 * * *' END AS cron_expr,
       CASE WHEN variant = 5 THEN 'Etc/GMT-7' ELSE 'UTC' END AS tz,
       CASE variant
         WHEN 0 THEN date_trunc('minute', ts)
                     + (15 - (CAST(extract(minute FROM ts) AS INT) % 15)) * INTERVAL 1 MINUTE
         WHEN 1 THEN CASE WHEN daily3 > ts THEN daily3 ELSE daily3 + INTERVAL 1 DAY END
         WHEN 2 THEN CASE WHEN mon230 > ts THEN mon230 ELSE mon230 + INTERVAL 7 DAY END
         WHEN 3 THEN date_trunc('month', ts) + INTERVAL 1 MONTH
         WHEN 4 THEN date_trunc('hour', ts)
                     + (6 - (CAST(extract(hour FROM ts) AS INT) % 6)) * INTERVAL 1 HOUR
         ELSE (CASE WHEN daily3_l > ts + INTERVAL 7 HOUR THEN daily3_l
                    ELSE daily3_l + INTERVAL 1 DAY END) - INTERVAL 7 HOUR
       END AS next_run
FROM c
"""


def q_scheduled_job_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 scheduled-job processor tick (scheduled_job_processor.py:43-134
    `_prepare_scheduled_job` + `handle_missed_schedules`:223-262): one pass
    over the scheduled-jobs table classifying every row before the poll
    loop runs —

    - NULL/empty timezone -> backfilled to 'UTC' (legacy rows predating the
      timezone column), flagged;
    - next_run_time IS NULL + valid cron -> orphan repaired: recompute from
      `now` WITHOUT a catch-up firing (reference lines 100-127);
    - next_run_time IS NULL + invalid cron -> deactivated (lines 121-127);
    - due within the 1-hour MAX_CATCHUP_DELAY window -> catchup_fire;
    - due but missed by > 1 hour -> missed_skip (reschedule only, no job);
    - future next_run -> not_due; is_active=false -> inactive.

    The Spark side routes every row through the real `prepare_jobs` kernel
    (kernels/cron.py:200) inside one vectorized pandas UDF; the oracle pins
    the classification per synthesized variant. Metadata-scale table (one
    row per *schedule*, not per URL), so the pandas UDF is not a hot path.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.kernels.cron import prepare_jobs

    now = "2024-06-01 12:00:00"

    jobs = _events(spark, sf_dir).select(
        "event_id", (F.col("event_id") % 7).cast("int").alias("variant")
    ).select(
        "event_id",
        "variant",
        F.expr("CASE WHEN variant = 4 THEN 'not a cron' ELSE '0 3 * * *' END")
        .alias("cron_expr"),
        F.expr("CASE WHEN variant IN (1, 4) THEN NULL ELSE 'UTC' END").alias("tz"),
        F.expr(
            f"CASE WHEN variant IN (3, 4) THEN NULL "
            f"WHEN variant = 2 THEN timestamp'{now}' - INTERVAL 3 HOURS "
            f"WHEN variant = 5 THEN timestamp'{now}' + INTERVAL 2 HOURS "
            f"ELSE timestamp'{now}' - INTERVAL 30 MINUTES END"
        ).alias("next_run_time"),
        F.expr("variant != 6").alias("is_active"),
    )

    out_type = T.StructType([
        T.StructField("tz_eff", T.StringType()),
        T.StructField("tz_backfilled", T.BooleanType()),
        T.StructField("orphan_repaired", T.BooleanType()),
        T.StructField("active_after", T.BooleanType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("fires", T.BooleanType()),
    ])

    @pandas_udf(out_type)
    def _tick(cron_expr, tz, next_run_time, is_active):
        from datetime import UTC as _UTC
        from datetime import datetime, timedelta

        now_dt = datetime(2024, 6, 1, 12, 0, tzinfo=_UTC)
        catchup = timedelta(hours=1)
        raw = [
            {
                "cron_expression": c,
                "timezone": (None if z is None or (isinstance(z, float)) else z),
                "next_run_time": (
                    None if pd.isna(n) else n.to_pydatetime().replace(tzinfo=_UTC)
                ),
                "is_active": bool(a),
            }
            for c, z, n, a in zip(cron_expr, tz, next_run_time, is_active)
        ]
        rows = []
        for j in prepare_jobs(raw, now_dt):
            backfilled = bool(j.get("timezone_backfilled", False))
            repaired = bool(j.get("orphan_repaired", False))
            active = bool(j.get("is_active", True))
            nrt = j.get("next_run_time")
            if not active and not repaired and nrt is not None:
                # was inactive on input (repair never deactivates a row
                # that had a next_run_time)
                outcome, fires = "inactive", False
            elif not active:
                outcome, fires = "deactivated", False
            elif repaired:
                outcome, fires = "orphan_rescheduled", False
            elif nrt > now_dt:
                outcome, fires = "not_due", False
            elif now_dt - nrt <= catchup:
                outcome, fires = "catchup_fire", True
            else:
                outcome, fires = "missed_skip", False
            rows.append(
                (j.get("timezone"), backfilled, repaired, active, outcome, fires)
            )
        return pd.DataFrame(
            rows,
            columns=[
                "tz_eff", "tz_backfilled", "orphan_repaired",
                "active_after", "outcome", "fires",
            ],
        )

    return jobs.select(
        "event_id",
        "variant",
        "cron_expr",
        _tick("cron_expr", "tz", "next_run_time", "is_active").alias("r"),
    ).select(
        "event_id", "variant", "cron_expr", "r.tz_eff", "r.tz_backfilled",
        "r.orphan_repaired", "r.active_after", "r.outcome", "r.fires",
    )


O_SCHEDULED_JOB_TICK = """
SELECT event_id,
       CAST(event_id % 7 AS INT) AS variant,
       CASE WHEN event_id % 7 = 4 THEN 'not a cron' ELSE '0 3 * * *' END AS cron_expr,
       'UTC' AS tz_eff,
       (event_id % 7) IN (1, 4) AS tz_backfilled,
       (event_id % 7) = 3 AS orphan_repaired,
       (event_id % 7) NOT IN (4, 6) AS active_after,
       CASE CAST(event_id % 7 AS INT)
         WHEN 2 THEN 'missed_skip'
         WHEN 3 THEN 'orphan_rescheduled'
         WHEN 4 THEN 'deactivated'
         WHEN 5 THEN 'not_due'
         WHEN 6 THEN 'inactive'
         ELSE 'catchup_fire'
       END AS outcome,
       (event_id % 7) IN (0, 1) AS fires
FROM events
"""


def q_crawl_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection (beyond-reference crawl-tier op): calendars,
    faceted search, and session-id pages generate unbounded URL families a
    crawler must cut off — the classic signal is one path TEMPLATE (digit
    runs collapsed) accounting for an exploding number of distinct URLs on
    one host. The reference caps pagination at max_pages=100
    (`/root/reference/crawler/services/pagination.py:50-143`) but has no
    template-level trap signal; at 10^10 URLs this aggregation is what keeps
    a handful of trap hosts from eating the frontier.

    Shape: pure map (regexp template) + ONE map-side-combinable aggregation
    on (host, template) — count(DISTINCT path) is two-phase but never moves
    raw pages, and the output is O(#templates), tiny. Synthetic input: hosts
    3 and 7 (of 20) serve a calendar-style two-number family (unbounded);
    every other host serves a 23-page bounded section."""
    ev = _events(spark, sf_dir)
    h = F.col("user_id") % 20
    path = F.when(
        h.isin(3, 7),
        F.concat(
            F.lit("/calendar/"), (F.col("event_id") % 1500).cast("string"),
            F.lit("/day/"), (F.col("user_id") % 97).cast("string"),
        ),
    ).otherwise(
        F.concat(F.lit("/cases/"), (F.col("event_id") % 23).cast("string"))
    )
    urls = ev.select(
        F.concat(F.lit("portal"), h.cast("string"), F.lit(".go.id")).alias("host"),
        path.alias("path"),
    )
    agg = (
        urls.withColumn(
            "path_template", F.regexp_replace("path", "[0-9]+", "{N}")
        )
        .groupBy("host", "path_template")
        .agg(
            F.countDistinct("path").alias("n_urls"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return agg.select(
        "host", "path_template", "n_urls", "n_hits",
        (F.col("n_urls") > 30).cast("int").alias("is_trap"),
    )


O_CRAWL_TRAPS = """
WITH u AS (
  SELECT 'portal' || (user_id % 20) || '.go.id' AS host,
         CASE WHEN (user_id % 20) IN (3, 7)
              THEN '/calendar/' || (event_id % 1500) || '/day/' || (user_id % 97)
              ELSE '/cases/' || (event_id % 23) END AS path
  FROM events
)
SELECT host,
       regexp_replace(path, '[0-9]+', '{N}', 'g') AS path_template,
       count(DISTINCT path) AS n_urls,
       count(*) AS n_hits,
       CAST(count(DISTINCT path) > 30 AS INT) AS is_trap
FROM u
GROUP BY host, path_template
"""


def q_host_circuit_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host error circuit breaker (beyond-reference): the reference
    classifies and retries per REQUEST (`retry_policy.py`, R1-R5) but has no
    host-level cutoff, so a host melting down (5xx storm) keeps receiving
    its full politeness budget. Here the fetch log is classified per
    (host, round): a round TRIPS when its error rate crosses the threshold
    with enough attempts; the host then sits in cooldown for the following
    3 rounds (CrawlEngine(breaker=...) zeroes its politeness budget there —
    the open state; re-entry after cooldown is the half-open probe, gated
    engine==simulator in tests/test_breaker.py). This query is the same
    classification as reporting analytics over an observed fetch log.
    Shape: one agg + one RANGE window per host — the window moves
    O(hosts x rounds) rows, never raw requests. Synthetic input: hosts 2 and
    9 (of 25) run a ~70% 5xx storm in rounds 4-6 over a 10% background error
    rate."""
    ev = _events(spark, sf_dir)
    h = F.col("user_id") % 25
    rnd = (F.col("event_id") % 12).cast("int")
    storm = h.isin(2, 9) & rnd.between(4, 6) & (F.col("event_id") % 10 < 7)
    background = F.col("event_id") % 10 == 0
    log = ev.select(
        F.concat(F.lit("portal"), h.cast("string"), F.lit(".go.id")).alias("host"),
        rnd.alias("rnd"),
        F.when(storm | background, F.lit(503)).otherwise(F.lit(200)).alias("status"),
    )
    per = log.groupBy("host", "rnd").agg(
        F.count(F.lit(1)).alias("n_req"),
        F.sum((F.col("status") >= 500).cast("long")).alias("n_err"),
    )
    per = per.withColumn(
        "err_rate", F.col("n_err").cast("double") / F.col("n_req")
    ).withColumn(
        "tripped",
        ((F.col("err_rate") >= 0.5) & (F.col("n_req") >= 5)).cast("int"),
    )
    cooldown = Window.partitionBy("host").orderBy("rnd").rangeBetween(-3, -1)
    per = per.withColumn(
        "suppressed", F.coalesce(F.max("tripped").over(cooldown), F.lit(0))
    )
    state = (
        F.when(F.col("tripped") == 1, F.lit("open"))
        .when(F.col("suppressed") == 1, F.lit("cooldown"))
        .otherwise(F.lit("closed"))
    )
    return per.select(
        "host", "rnd", "n_req", "n_err", "err_rate", "tripped",
        state.alias("state"),
    )


O_HOST_CIRCUIT_BREAKER = """
WITH log AS (
  SELECT 'portal' || (user_id % 25) || '.go.id' AS host,
         CAST(event_id % 12 AS INT) AS rnd,
         CASE WHEN ((user_id % 25) IN (2, 9)
                    AND (event_id % 12) BETWEEN 4 AND 6
                    AND (event_id % 10) < 7)
                   OR (event_id % 10) = 0
              THEN 503 ELSE 200 END AS status
  FROM events
),
per AS (
  SELECT host, rnd,
         count(*) AS n_req,
         CAST(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM log GROUP BY host, rnd
),
rated AS (
  SELECT host, rnd, n_req, n_err,
         CAST(n_err AS DOUBLE) / n_req AS err_rate,
         CAST(CAST(n_err AS DOUBLE) / n_req >= 0.5 AND n_req >= 5 AS INT) AS tripped
  FROM per
),
windowed AS (
  SELECT *,
         coalesce(max(tripped) OVER (
           PARTITION BY host ORDER BY rnd
           RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) AS suppressed
  FROM rated
)
SELECT host, rnd, n_req, n_err, err_rate, tripped,
       CASE WHEN tripped = 1 THEN 'open'
            WHEN suppressed = 1 THEN 'cooldown'
            ELSE 'closed' END AS state
FROM windowed
"""


def q_sitemap_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion end-to-end (beyond-reference — the reference's seed
    discovery is config-only, `seed_url_crawler.py:303+`): robots.txt
    `Sitemap:` discovery (RFC 9309 §2.3 global lines, case-insensitive key)
    -> urlset/sitemapindex parse (sitemaps.org protocol via
    kernels/sitemap.py) -> frontier candidates with the protocol priority
    mapped onto the S1 0-10 scale. sitemapindex children come out as
    kind='sitemap' rows — index fan-out is frontier RECIRCULATION (fetch the
    child next round), the same shape as pagination expansion, never
    in-process recursion.

    The Spark side builds each host's robots + XML documents with JVM
    expressions and round-trips them through the real parser UDFs (a parser
    that misreads namespaces, drops lastmod, or mis-clamps priority fails
    the hash); the oracle regenerates the expected entries constructively,
    never parsing XML. Per-urlset extras pin the protocol edges: an entry
    with no <loc> (dropped) and an out-of-range priority 9.9 (-> default
    0.5). Shape: distinct-host agg + map-only UDF parse + explode — the
    sitemap corpus is O(hosts), trivially parallel, zero joins."""
    from crawler_spark.functions.sitemap_udfs import (
        parse_sitemap_udf,
        sitemap_urls_udf,
    )

    ev = _events(spark, sf_dir)
    hosts = ev.select((F.col("user_id") % 10).alias("h")).distinct()
    hs = F.col("h").cast("string")
    robots = F.concat(
        F.lit("User-agent: *\nDisallow: /private/\n"),
        F.lit("Sitemap: https://portal"), hs, F.lit(".go.id/sitemap.xml\n"),
        F.when(
            F.col("h") % 4 == 0,
            F.concat(F.lit("sitemap: https://portal"), hs,
                     F.lit(".go.id/sitemap-index.xml\n")),
        ).otherwise(F.lit("")),
    )
    discovered = hosts.select(
        "h", F.explode(sitemap_urls_udf(robots)).alias("sitemap_url")
    )

    def entry_xml(i):
        loc = F.concat(F.lit("https://portal"), hs, F.lit(".go.id/doc/"),
                       i.cast("string"))
        lastmod = F.when(
            i % 3 == 0,
            F.concat(F.lit("<lastmod>2025-01-"),
                     F.lpad((i % 9 + 1).cast("string"), 2, "0"),
                     F.lit("</lastmod>")),
        ).otherwise(F.lit(""))
        chf = (
            F.when(i % 4 == 0, F.lit("<changefreq>daily</changefreq>"))
            .when(i % 4 == 1, F.lit("<changefreq>weekly</changefreq>"))
            .when(i % 4 == 3, F.lit("<changefreq>monthly</changefreq>"))
            .otherwise(F.lit(""))
        )
        pr = F.concat(
            F.lit("<priority>"),
            F.when(i % 11 == 10, F.lit("1.0")).otherwise(
                F.concat(F.lit("0."), (i % 11).cast("string"))
            ),
            F.lit("</priority>"),
        )
        return F.concat(F.lit("<url><loc>"), loc, F.lit("</loc>"),
                        lastmod, chf, pr, F.lit("</url>"))

    def child_xml(k):
        return F.concat(
            F.lit("<sitemap><loc>https://portal"), hs,
            F.lit(".go.id/sitemap-part-"), k.cast("string"), F.lit(".xml</loc>"),
            F.when(
                k % 2 == 0,
                F.concat(F.lit("<lastmod>2025-02-0"), (k + 1).cast("string"),
                         F.lit("</lastmod>")),
            ).otherwise(F.lit("")),
            F.lit("</sitemap>"),
        )

    urlset_doc = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.col("h") + 11), entry_xml), ""
        ),
        # protocol edges: loc-less entry is unusable (dropped); out-of-range
        # priority falls back to the 0.5 default
        F.lit("<url><priority>0.9</priority></url>"),
        F.lit("<url><loc>https://portal"), hs,
        F.lit(".go.id/special</loc><priority>9.9</priority></url>"),
        F.lit("</urlset>"),
    )
    index_doc = F.concat(
        F.lit("<sitemapindex>"),
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(2)), child_xml), ""),
        F.lit("</sitemapindex>"),
    )
    parsed = discovered.select(
        "h",
        "sitemap_url",
        F.explode(
            parse_sitemap_udf(
                F.when(F.col("sitemap_url").endswith("/sitemap.xml"), urlset_doc)
                .otherwise(index_doc)
            )
        ).alias("e"),
    )
    return parsed.select(
        F.concat(F.lit("portal"), hs, F.lit(".go.id")).alias("host"),
        "sitemap_url",
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority").alias("priority"),
        # S1 mapping (kernels/sitemap.py sitemap_priority_to_frontier:
        # protocol 1.0 -> 10, crawled first): the grid has no .5 ties, so
        # HALF_UP here == the kernel's banker's rounding (pinned against
        # the kernel in tests/test_sitemap.py)
        F.round(F.col("e.priority") * 10, 0).cast("int")
        .alias("frontier_priority"),
    )


O_SITEMAP_EXPAND = """
WITH hosts AS (SELECT DISTINCT user_id % 10 AS h FROM events),
urlset AS (
  SELECT h,
         'https://portal' || h || '.go.id/sitemap.xml' AS sitemap_url,
         'url' AS kind,
         'https://portal' || h || '.go.id/doc/' || i AS loc,
         CASE WHEN i % 3 = 0
              THEN '2025-01-' || lpad(CAST(i % 9 + 1 AS VARCHAR), 2, '0')
         END AS lastmod,
         CASE CAST(i % 4 AS INT) WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
              WHEN 3 THEN 'monthly' END AS changefreq,
         CAST(i % 11 AS DOUBLE) / 10.0 AS priority,
         CAST(i % 11 AS INT) AS frontier_priority
  FROM (SELECT h, unnest(generate_series(0, 11 + h)) AS i FROM hosts)
),
special AS (
  SELECT h,
         'https://portal' || h || '.go.id/sitemap.xml' AS sitemap_url,
         'url' AS kind,
         'https://portal' || h || '.go.id/special' AS loc,
         CAST(NULL AS VARCHAR) AS lastmod,
         CAST(NULL AS VARCHAR) AS changefreq,
         0.5 AS priority,
         5 AS frontier_priority
  FROM hosts
),
idx AS (
  SELECT h,
         'https://portal' || h || '.go.id/sitemap-index.xml' AS sitemap_url,
         'sitemap' AS kind,
         'https://portal' || h || '.go.id/sitemap-part-' || k || '.xml' AS loc,
         CASE WHEN k % 2 = 0 THEN '2025-02-0' || (k + 1) END AS lastmod,
         CAST(NULL AS VARCHAR) AS changefreq,
         0.5 AS priority,
         5 AS frontier_priority
  FROM hosts, generate_series(0, 2) AS t(k)
  WHERE h % 4 = 0
)
SELECT 'portal' || h || '.go.id' AS host, sitemap_url, kind, loc, lastmod,
       changefreq, priority, frontier_priority
FROM (SELECT * FROM urlset UNION ALL SELECT * FROM special
      UNION ALL SELECT * FROM idx)
"""


def q_conditional_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional re-crawl classification (beyond-reference — the reference
    re-fetches unconditionally; RFC 9110 §8.8.3/§13.1.2 ETag +
    If-None-Match): due re-crawl candidates join the standing pages table on
    identity; a stored validator matching the live body is a 304 —
    'not_modified' keeps the stored page row (the engine additionally
    recirculates the STORED link set) and SKIPS parse + page write
    (at 100 TB the dominant re-crawl economy: most pages don't change
    between visits, so write amplification and parse CPU follow the CHANGE
    rate, not the visit rate); a mismatch is 'modified' (re-parse, MERGE by
    operators/merge.py latest-wins); no stored page is 'new'. Shape: one
    keyed equi-join (both sides bucketable on the join key — the
    operators/bucketing.py layout) + map-only CASE; parse_needed marks
    exactly the rows the parse stage reads. Synthetic input: even doc_ids
    are stored; every 5th live body changed; doc_id%3==1 not due."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("page_doc"),
        F.sha2(F.col("text"), 256).alias("stored_etag"),
    )
    live_body = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("<p>rev2</p>"))
    ).otherwise(F.col("text"))
    cands = docs.filter(F.col("doc_id") % 3 != 1).select(
        "doc_id", F.sha2(live_body, 256).alias("live_etag")
    )
    j = cands.join(pages, cands.doc_id == pages.page_doc, "left")
    action = (
        F.when(F.col("stored_etag").isNull(), F.lit("new"))
        .when(F.col("stored_etag") == F.col("live_etag"), F.lit("not_modified"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        "doc_id",
        action.alias("action"),
        "stored_etag",
        "live_etag",
        (action != F.lit("not_modified")).cast("int").alias("parse_needed"),
    )


O_CONDITIONAL_RECRAWL = """
WITH pages AS (
  SELECT doc_id AS page_doc, sha256(text) AS stored_etag
  FROM documents WHERE doc_id % 2 = 0
),
cands AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % 5 = 0 THEN text || '<p>rev2</p>'
                     ELSE text END) AS live_etag
  FROM documents WHERE doc_id % 3 != 1
)
SELECT c.doc_id,
       CASE WHEN p.stored_etag IS NULL THEN 'new'
            WHEN p.stored_etag = c.live_etag THEN 'not_modified'
            ELSE 'modified' END AS action,
       p.stored_etag,
       c.live_etag,
       CAST(CASE WHEN p.stored_etag IS NULL THEN 'new'
                 WHEN p.stored_etag = c.live_etag THEN 'not_modified'
                 ELSE 'modified' END != 'not_modified' AS INT) AS parse_needed
FROM cands c LEFT JOIN pages p ON c.doc_id = p.page_doc
"""


def q_politeness_domain_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain politeness grouping (beyond-reference crawl-tier
    op): the reference keys rate limits on the raw hostname (rate_limiter
    per website), so www./m./arsip. mirrors of ONE portal each get a full
    budget — at 10^10 URLs a subdomain-sharded site multiplies its crawl
    rate by its mirror count. Grouping hosts by registrable domain (public
    suffix + one label; kernels/urlnorm.registered_domain, suffix set = the
    .id registry's PSL slice) restores one budget per organization and
    splits it evenly across that organization's live hosts.

    Shape: pure map (split + CASE on the suffix set, zero UDF) + ONE
    map-side-combinable aggregation on registered_domain; output is
    O(#organizations). Synthetic input: 4 subdomain variants x 12 base
    hosts (user_id%12 determines user_id%6, so each of the 6 families gets
    2 bases) across go.id / co.id / ac.id / or.id / plain .id / .com —
    every suffix-rule branch fires, incl. the bare-ccTLD default rule."""
    from crawler_spark.functions.frontier_exprs import registered_domain_col

    ev = _events(spark, sf_dir)
    d = F.col("user_id") % 12
    fam = F.col("user_id") % 6
    base = (
        F.when(fam == 0, F.concat(F.lit("mahkamah"), d.cast("string"), F.lit(".go.id")))
        .when(fam == 1, F.concat(F.lit("firma"), d.cast("string"), F.lit(".co.id")))
        .when(fam == 2, F.concat(F.lit("kampus"), d.cast("string"), F.lit(".ac.id")))
        .when(fam == 3, F.concat(F.lit("komunitas"), d.cast("string"), F.lit(".or.id")))
        .when(fam == 4, F.concat(F.lit("situs"), d.cast("string"), F.lit(".id")))
        .otherwise(F.concat(F.lit("portal"), d.cast("string"), F.lit(".com")))
    )
    sub = F.col("event_id") % 4
    host = (
        F.when(sub == 0, base)
        .when(sub == 1, F.concat(F.lit("www."), base))
        .when(sub == 2, F.concat(F.lit("m."), base))
        .otherwise(F.concat(F.lit("arsip.putusan."), base))
    )
    hosts = ev.select(host.alias("host"))
    grouped = (
        hosts.withColumn("registered_domain", registered_domain_col(F.col("host")))
        .groupBy("registered_domain")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_requests"),
        )
    )
    # one organization-level budget (2 rps, the reference's politeness
    # default) split evenly across the organization's live hosts
    return grouped.select(
        "registered_domain", "n_hosts", "n_requests",
        F.round(F.lit(2.0) / F.col("n_hosts"), 4).alias("per_host_rps"),
        (F.col("n_hosts") > 1).cast("int").alias("is_sharded"),
    )


from crawler_spark.kernels.urlnorm import ID_SECOND_LEVEL_SUFFIXES as _ID_SUF

# ONE source of truth for the suffix set: the oracle interpolates the same
# frozenset the kernel and the Catalyst expr read, so editing the PSL slice
# cannot silently drift the two engines apart
_SUFFIX_IN = ", ".join(f"'{sfx}'" for sfx in sorted(_ID_SUF))

O_POLITENESS_DOMAIN_GROUP = f"""
WITH h AS (
  SELECT CASE WHEN event_id % 4 = 0 THEN ''
              WHEN event_id % 4 = 1 THEN 'www.'
              WHEN event_id % 4 = 2 THEN 'm.'
              ELSE 'arsip.putusan.' END
         || CASE WHEN user_id % 6 = 0 THEN 'mahkamah' || (user_id % 12) || '.go.id'
                 WHEN user_id % 6 = 1 THEN 'firma' || (user_id % 12) || '.co.id'
                 WHEN user_id % 6 = 2 THEN 'kampus' || (user_id % 12) || '.ac.id'
                 WHEN user_id % 6 = 3 THEN 'komunitas' || (user_id % 12) || '.or.id'
                 WHEN user_id % 6 = 4 THEN 'situs' || (user_id % 12) || '.id'
                 ELSE 'portal' || (user_id % 12) || '.com' END AS host
  FROM events
),
rd AS (
  SELECT host,
         CASE WHEN len(string_split(host, '.')) <= 2 THEN host
              WHEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                   IN ({_SUFFIX_IN})
              THEN string_split(host, '.')[-3] || '.'
                   || string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
              ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
         END AS registered_domain
  FROM h
)
SELECT registered_domain,
       count(DISTINCT host) AS n_hosts,
       count(*) AS n_requests,
       round(2.0 / count(DISTINCT host), 4) AS per_host_rps,
       CAST(count(DISTINCT host) > 1 AS INT) AS is_sharded
FROM rd
GROUP BY registered_domain
"""


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive re-crawl scheduling (beyond-reference): the reference
    re-crawls on a FIXED per-website cron (scheduled_job.cron_schedule);
    conditional_recrawl makes an unchanged re-fetch cheap, but the visit
    CADENCE stays static. The classic fix (Cho & Garcia-Molina, "Estimating
    Frequency of Change", ACM TOIT 2003) estimates each page's Poisson
    change rate from repeated observations — the published
    incomplete-observation estimator lambda = -ln((n - X + 0.5)/(n + 0.5))
    / dbar for n visits, X observed changes, mean inter-visit gap dbar —
    and schedules the next visit at ~1/lambda. At 10^10 URLs this is what
    moves crawl budget from static archives to hourly-changing dockets.

    Shape: ONE map-side-combinable aggregation per URL (count/sum/avg) +
    scalar math, zero UDF, zero window. Synthetic history: url u =
    event_id % 149, per-visit gap 1 + event_id % 7 hours, change flag
    (event_id % (2 + u % 9)) == 0 — per-URL change propensity spans
    1/2 .. 1/10, so the schedule spread covers the clamp at both ends."""
    ev = _events(spark, sf_dir)
    u = (F.col("event_id") % 149).alias("url_id")
    obs = ev.select(
        u,
        (F.lit(1) + F.col("event_id") % 7).cast("double").alias("gap_h"),
        (F.col("event_id") % (F.lit(2) + F.col("event_id") % 149 % 9) == 0)
        .cast("long")
        .alias("changed"),
    )
    agg = obs.groupBy("url_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("changed").alias("n_changed"),
        F.avg("gap_h").alias("avg_gap_h"),
    )
    # survival ratio is a pure division (bit-identical across engines);
    # ln/division outputs are rounded to 4dp
    ratio = (F.col("n_obs") - F.col("n_changed") + 0.5) / (F.col("n_obs") + 0.5)
    lam = -F.log(ratio) / F.col("avg_gap_h")
    # X == 0 gives lam == 0 exactly (ln(1)): the estimator is degenerate
    # there, and ANSI mode would throw on 1/0 — schedule the max interval
    interval = F.when(
        lam > 0, F.least(F.lit(720.0), F.greatest(F.lit(1.0), F.lit(1.0) / lam))
    ).otherwise(F.lit(720.0))
    return agg.select(
        "url_id", "n_obs", "n_changed",
        F.round("avg_gap_h", 4).alias("avg_gap_h"),
        F.round(lam, 6).alias("change_rate_per_h"),
        F.round(interval, 4).alias("next_interval_h"),
    )


O_RECRAWL_SCHEDULE = """
WITH obs AS (
  SELECT event_id % 149 AS url_id,
         CAST(1 + event_id % 7 AS DOUBLE) AS gap_h,
         CAST(event_id % (2 + (event_id % 149) % 9) = 0 AS BIGINT) AS changed
  FROM events
),
agg AS (
  SELECT url_id, count(*) AS n_obs, sum(changed) AS n_changed,
         avg(gap_h) AS avg_gap_h
  FROM obs GROUP BY url_id
),
est AS (
  SELECT url_id, n_obs, n_changed, avg_gap_h,
         -ln((n_obs - n_changed + 0.5) / (n_obs + 0.5)) / avg_gap_h AS lam
  FROM agg
)
SELECT url_id, n_obs, CAST(n_changed AS BIGINT) AS n_changed,
       round(avg_gap_h, 4) AS avg_gap_h,
       round(lam, 6) AS change_rate_per_h,
       round(CASE WHEN lam > 0
                  THEN least(720.0, greatest(1.0, 1.0 / lam))
                  ELSE 720.0 END, 4) AS next_interval_h
FROM est
"""


QUERIES = {
    "politeness_domain_group": q_politeness_domain_group,
    "recrawl_schedule": q_recrawl_schedule,
    "scheduled_job_tick": q_scheduled_job_tick,
    "crawl_traps": q_crawl_traps,
    "host_circuit_breaker": q_host_circuit_breaker,
    "sitemap_expand": q_sitemap_expand,
    "conditional_recrawl": q_conditional_recrawl,
    "robots_gate": q_robots_gate,
    "workflow_toposort": q_workflow_toposort,
    "config_merge": q_config_merge,
    "data_attr_extract": q_data_attr_extract,
    "cron_next_run": q_cron_next_run,
    "url_normalize_hash": q_url_normalize_hash,
    "url_seen_antijoin": q_url_seen_antijoin,
    "seen_probe_exact": q_seen_probe_exact,
    "priority_frontier": q_priority_frontier,
    "depth_priority_frontier": q_depth_priority_frontier,
    "politeness_budget": q_politeness_budget,
    "politeness_pacing": q_politeness_pacing,
    "http_classify": q_http_classify,
    "backoff_schedule": q_backoff_schedule,
    "retry_routing": q_retry_routing,
    "retry_history": q_retry_history,
    "request_retry": q_request_retry,
    "seed_outcomes": q_seed_outcomes,
    "pagination_expand": q_pagination_expand,
    "stop_classify": q_stop_classify,
    "hot_host_salting": q_hot_host_salting,
    "global_rate_window": q_global_rate_window,
    "page_listing": q_page_listing,
    "topk_common_hashes": q_topk_common_hashes,
    "retention_expiry": q_retention_expiry,
    "pagination_detect": q_pagination_detect,
    "json_extract": q_json_extract,
    "dlq_views": q_dlq_views,
    "log_range_scan": q_log_range_scan,
    "workflow_result_agg": q_workflow_result_agg,
    "page_upsert": q_page_upsert,
    "backoff_jitter": q_backoff_jitter,
    "scrape_batch": q_scrape_batch,
    "api_executor": q_api_executor,
    "http_executor": q_http_executor,
    "browser_executor": q_browser_executor,
    "error_classify": q_error_classify,
    "pagination_strategy": q_pagination_strategy,
    "url_equivalence": q_url_equivalence,
    "frontier_peek": q_frontier_peek,
    "crawl_executor": q_crawl_executor,
    "idempotent_enqueue": q_idempotent_enqueue,
    "step_validation": q_step_validation,
    "varsub_conditions": q_varsub_conditions,
}

ORACLES = {
    "politeness_domain_group": O_POLITENESS_DOMAIN_GROUP,
    "recrawl_schedule": O_RECRAWL_SCHEDULE,
    "crawl_traps": O_CRAWL_TRAPS,
    "host_circuit_breaker": O_HOST_CIRCUIT_BREAKER,
    "sitemap_expand": O_SITEMAP_EXPAND,
    "conditional_recrawl": O_CONDITIONAL_RECRAWL,
    "robots_gate": O_ROBOTS_GATE,
    "workflow_toposort": O_WORKFLOW_TOPOSORT,
    "config_merge": O_CONFIG_MERGE,
    "data_attr_extract": O_DATA_ATTR_EXTRACT,
    "cron_next_run": O_CRON_NEXT_RUN,
    "scheduled_job_tick": O_SCHEDULED_JOB_TICK,
    "url_normalize_hash": O_URL_NORMALIZE_HASH,
    "url_seen_antijoin": O_URL_SEEN_ANTIJOIN,
    "seen_probe_exact": O_SEEN_PROBE_EXACT,
    "priority_frontier": O_PRIORITY_FRONTIER,
    "depth_priority_frontier": O_DEPTH_PRIORITY_FRONTIER,
    "politeness_budget": O_POLITENESS_BUDGET,
    "politeness_pacing": O_POLITENESS_PACING,
    "http_classify": O_HTTP_CLASSIFY,
    "backoff_schedule": O_BACKOFF_SCHEDULE,
    "retry_routing": O_RETRY_ROUTING,
    "retry_history": O_RETRY_HISTORY,
    "request_retry": O_REQUEST_RETRY,
    "seed_outcomes": O_SEED_OUTCOMES,
    "pagination_expand": O_PAGINATION_EXPAND,
    "stop_classify": O_STOP_CLASSIFY,
    "hot_host_salting": O_HOT_HOST_SALTING,
    "global_rate_window": O_GLOBAL_RATE_WINDOW,
    "page_listing": O_PAGE_LISTING,
    "topk_common_hashes": O_TOPK_COMMON_HASHES,
    "retention_expiry": O_RETENTION_EXPIRY,
    "pagination_detect": O_PAGINATION_DETECT,
    "json_extract": O_JSON_EXTRACT,
    "dlq_views": O_DLQ_VIEWS,
    "log_range_scan": O_LOG_RANGE_SCAN,
    "workflow_result_agg": O_WORKFLOW_RESULT_AGG,
    "page_upsert": O_PAGE_UPSERT,
    "backoff_jitter": O_BACKOFF_JITTER,
    "scrape_batch": O_SCRAPE_BATCH,
    "api_executor": O_API_EXECUTOR,
    "http_executor": O_HTTP_EXECUTOR,
    "browser_executor": O_BROWSER_EXECUTOR,
    "error_classify": O_ERROR_CLASSIFY,
    "pagination_strategy": O_PAGINATION_STRATEGY,
    "url_equivalence": O_URL_EQUIVALENCE,
    "frontier_peek": O_FRONTIER_PEEK,
    "crawl_executor": O_CRAWL_EXECUTOR,
    "idempotent_enqueue": O_IDEMPOTENT_ENQUEUE,
    "step_validation": O_STEP_VALIDATION,
    "varsub_conditions": O_VARSUB_CONDITIONS,
}
