"""Admin/reporting query surface: the reference's sqlc stats + audit queries
re-expressed set-oriented (one row per website/job/category instead of the
API's :one-per-call), each with a DuckDB oracle.

Reference parity targets:
- website_statistics  -> GetWebsiteStatistics (sql/queries/website.sql:71-108)
- log_level_stats     -> GetLogStatsByJob (sql/queries/crawl_log.sql:138-148)
- dlq_stats_category  -> GetDLQStats + GetDLQStatsByCategory
                         (sql/queries/dead_letter_queue.sql:72-89)
- config_history_versions -> GetLatestConfigVersion / GetConfigHistory /
                         GetConfigByVersion (sql/queries/website_config_history.sql)

Inputs are synthesized deterministically from the driver's `events` parquet
(jobs/logs/DLQ entries keyed off event_id/user_id) plus `nation` as the
25-row website dimension, so the ANSI-SQL oracle reproduces every value.

Scale notes: the website dimension is broadcast (25 rows; a real deployment
has O(10^2-10^4) websites — still broadcast-size); job and page aggregates
are single map-side-combinable groupBys; the pages->jobs join shuffles on
job_id, the same key both tables would be bucketed by in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_STATUSES = ["completed", "completed", "failed", "cancelled", "running"]
_LEVELS = [
    "DEBUG", "DEBUG", "INFO", "INFO", "INFO", "INFO",
    "WARNING", "ERROR", "ERROR", "CRITICAL",
]
_CATEGORIES = [
    "network_error", "timeout", "server_error",
    "rate_limit", "parse_error", "auth_error",
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _pick(options: list[str], idx):
    return F.element_at(F.array(*[F.lit(o) for o in options]), idx.cast("int"))


def _jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic crawl_job table: websites 20-24 get no jobs at all so the
    statistics query's LEFT JOIN / COALESCE zero path is exercised."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 25 < 20)
    status = _pick(_STATUSES, F.col("event_id") % 5 + 1)
    return ev.select(
        F.col("event_id").alias("job_id"),
        (F.col("user_id") % 25).cast("int").alias("website_id"),
        status.alias("status"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        (F.col("event_id") % 4).cast("int").alias("n_pages"),
    )


def q_website_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetWebsiteStatistics (website.sql:71-108), set-oriented over ALL
    websites: per-website job totals by status, success rate, page count via
    the pages->jobs join, and last completed-crawl timestamp. Websites with
    zero jobs surface with COALESCEd zeros (LEFT JOIN path)."""
    websites = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("int").alias("website_id"),
        F.col("n_name").alias("website_name"),
    )
    jobs = _jobs(spark, sf_dir)
    job_stats = jobs.groupBy("website_id").agg(
        F.count("*").alias("total_jobs"),
        F.count(F.when(F.col("status") == "completed", 1)).alias("completed_jobs"),
        F.count(F.when(F.col("status") == "failed", 1)).alias("failed_jobs"),
        F.count(F.when(F.col("status") == "cancelled", 1)).alias("cancelled_jobs"),
        F.max(F.when(F.col("status") == "completed", F.col("ts_ms"))).alias(
            "last_crawl_ms"
        ),
    )
    # crawled_page rows materialized per completed job, then joined back on
    # job_id (the reference's page_stats CTE join shape; bucket key at scale)
    pages = (
        jobs.filter((F.col("status") == "completed") & (F.col("n_pages") > 0))
        .select("job_id", F.explode(F.sequence(F.lit(1), F.col("n_pages"))).alias("pn"))
        .select("job_id")
    )
    page_stats = (
        pages.join(jobs.select("job_id", "website_id"), "job_id")
        .groupBy("website_id")
        .agg(F.count("*").alias("total_pages_crawled"))
    )
    out = (
        F.broadcast(websites)
        .join(job_stats, "website_id", "left")
        .join(page_stats, "website_id", "left")
    )
    total = F.coalesce(F.col("total_jobs"), F.lit(0))
    completed = F.coalesce(F.col("completed_jobs"), F.lit(0))
    return out.select(
        "website_id",
        "website_name",
        total.cast("long").alias("total_jobs"),
        completed.cast("long").alias("completed_jobs"),
        F.coalesce(F.col("failed_jobs"), F.lit(0)).cast("long").alias("failed_jobs"),
        F.coalesce(F.col("cancelled_jobs"), F.lit(0))
        .cast("long")
        .alias("cancelled_jobs"),
        F.when(total == 0, F.lit(0.0))
        .otherwise(completed.cast("double") * 100.0 / total.cast("double"))
        .alias("success_rate"),
        F.coalesce(F.col("total_pages_crawled"), F.lit(0))
        .cast("long")
        .alias("total_pages_crawled"),
        F.col("last_crawl_ms").cast("long").alias("last_crawl_ms"),
    )


_JOBS_CTE = """
WITH jobs AS (
  SELECT event_id AS job_id,
         CAST(user_id % 25 AS INT) AS website_id,
         (['completed','completed','failed','cancelled','running'])
           [CAST(event_id % 5 AS INT) + 1] AS status,
         epoch_ms(ts) AS ts_ms,
         CAST(event_id % 4 AS INT) AS n_pages
  FROM events WHERE user_id % 25 < 20
)
"""

O_WEBSITE_STATISTICS = _JOBS_CTE + """
, job_stats AS (
  SELECT website_id,
         count(*) AS total_jobs,
         count(CASE WHEN status = 'completed' THEN 1 END) AS completed_jobs,
         count(CASE WHEN status = 'failed' THEN 1 END) AS failed_jobs,
         count(CASE WHEN status = 'cancelled' THEN 1 END) AS cancelled_jobs,
         max(CASE WHEN status = 'completed' THEN ts_ms END) AS last_crawl_ms
  FROM jobs GROUP BY website_id
),
pages AS (
  SELECT job_id
  FROM jobs, LATERAL unnest(generate_series(1, n_pages)) AS t(pn)
  WHERE status = 'completed' AND n_pages > 0
),
page_stats AS (
  SELECT j.website_id, count(*) AS total_pages_crawled
  FROM pages p JOIN jobs j USING (job_id) GROUP BY j.website_id
)
SELECT n.n_nationkey AS website_id,
       n.n_name AS website_name,
       CAST(coalesce(js.total_jobs, 0) AS BIGINT) AS total_jobs,
       CAST(coalesce(js.completed_jobs, 0) AS BIGINT) AS completed_jobs,
       CAST(coalesce(js.failed_jobs, 0) AS BIGINT) AS failed_jobs,
       CAST(coalesce(js.cancelled_jobs, 0) AS BIGINT) AS cancelled_jobs,
       CASE WHEN coalesce(js.total_jobs, 0) = 0 THEN 0.0
            ELSE CAST(js.completed_jobs AS DOUBLE) * 100.0
                 / CAST(js.total_jobs AS DOUBLE) END AS success_rate,
       CAST(coalesce(ps.total_pages_crawled, 0) AS BIGINT) AS total_pages_crawled,
       CAST(js.last_crawl_ms AS BIGINT) AS last_crawl_ms
FROM nation n
LEFT JOIN job_stats js ON n.n_nationkey = js.website_id
LEFT JOIN page_stats ps ON n.n_nationkey = ps.website_id
"""


def q_log_level_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetLogStatsByJob (crawl_log.sql:138-148) for every job at once: the
    5-level FILTER pivot as one map-side-combinable aggregation."""
    ev = _events(spark, sf_dir)
    logs = ev.select(
        (F.col("event_id") % 500).alias("job_id"),
        _pick(_LEVELS, F.col("event_id") % 10 + 1).alias("log_level"),
    )
    agg = [
        F.count(F.when(F.col("log_level") == lv, 1)).alias(f"{lv.lower()}_count")
        for lv in ["DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"]
    ]
    return logs.groupBy("job_id").agg(F.count("*").alias("total_logs"), *agg)


O_LOG_LEVEL_STATS = """
WITH logs AS (
  SELECT event_id % 500 AS job_id,
         (['DEBUG','DEBUG','INFO','INFO','INFO','INFO','WARNING','ERROR','ERROR','CRITICAL'])
           [CAST(event_id % 10 AS INT) + 1] AS log_level
  FROM events
)
SELECT job_id,
       count(*) AS total_logs,
       count(CASE WHEN log_level = 'DEBUG' THEN 1 END) AS debug_count,
       count(CASE WHEN log_level = 'INFO' THEN 1 END) AS info_count,
       count(CASE WHEN log_level = 'WARNING' THEN 1 END) AS warning_count,
       count(CASE WHEN log_level = 'ERROR' THEN 1 END) AS error_count,
       count(CASE WHEN log_level = 'CRITICAL' THEN 1 END) AS critical_count
FROM logs GROUP BY job_id
"""


def q_dlq_stats_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetDLQStats + GetDLQStatsByCategory (dead_letter_queue.sql:72-89) plus
    the dlq_metrics_updater.py oldest-unresolved gauge: per error category —
    entries, unresolved backlog, retry attempts/successes, and the oldest
    unresolved entry's timestamp (the alerting age metric). (Distinct from
    dlq_views, which is the unresolved retry-eligible view.)"""
    ev = _events(spark, sf_dir)
    dlq = ev.select(
        _pick(_CATEGORIES, F.col("event_id") % 6 + 1).alias("error_category"),
        (F.col("event_id") % 7 == 0).alias("resolved"),
        (F.col("event_id") % 3 == 0).alias("retry_attempted"),
        ((F.col("event_id") % 3 == 0) & (F.col("event_id") % 6 == 0)).alias(
            "retry_success"
        ),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("added_ms"),
    )
    return dlq.groupBy("error_category").agg(
        F.count("*").alias("entry_count"),
        F.count(F.when(~F.col("resolved"), 1)).alias("unresolved_count"),
        F.count(F.when(F.col("retry_attempted"), 1)).alias("retry_attempted_count"),
        F.count(F.when(F.col("retry_success"), 1)).alias("retry_success_count"),
        F.min(F.when(~F.col("resolved"), F.col("added_ms"))).alias(
            "oldest_unresolved_ms"
        ),
    )


O_DLQ_STATS_CATEGORY = """
WITH dlq AS (
  SELECT (['network_error','timeout','server_error','rate_limit','parse_error','auth_error'])
           [CAST(event_id % 6 AS INT) + 1] AS error_category,
         event_id % 7 = 0 AS resolved,
         event_id % 3 = 0 AS retry_attempted,
         event_id % 3 = 0 AND event_id % 6 = 0 AS retry_success,
         epoch_ms(ts) AS added_ms
  FROM events
)
SELECT error_category,
       count(*) AS entry_count,
       count(CASE WHEN NOT resolved THEN 1 END) AS unresolved_count,
       count(CASE WHEN retry_attempted THEN 1 END) AS retry_attempted_count,
       count(CASE WHEN retry_success THEN 1 END) AS retry_success_count,
       min(CASE WHEN NOT resolved THEN added_ms END) AS oldest_unresolved_ms
FROM dlq GROUP BY error_category
"""


def q_config_history_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """website_config_history semantics (website_config_history.sql): an
    append-only versioned config audit — version = row_number per website in
    change order (CreateConfigHistory's next-version assignment), rolled up
    to GetLatestConfigVersion + the latest entry's attribution."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") % 17 == 0)
    hist = ev.select(
        (F.col("user_id") % 25).cast("int").alias("website_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("changed_ms"),
        F.concat(F.lit("reason_"), (F.col("event_id") % 5).cast("string")).alias(
            "change_reason"
        ),
        F.concat(F.lit("user"), (F.col("event_id") % 7).cast("string")).alias(
            "changed_by"
        ),
        "event_id",
    )
    w = Window.partitionBy("website_id").orderBy("changed_ms", "event_id")
    versioned = hist.withColumn("version", F.row_number().over(w))
    return versioned.groupBy("website_id").agg(
        F.max("version").cast("long").alias("latest_version"),
        F.max_by("change_reason", F.col("version")).alias("latest_reason"),
        F.max_by("changed_by", F.col("version")).alias("latest_changed_by"),
        F.min("changed_ms").alias("first_change_ms"),
        F.max("changed_ms").alias("last_change_ms"),
    )


O_CONFIG_HISTORY_VERSIONS = """
WITH hist AS (
  SELECT CAST(user_id % 25 AS INT) AS website_id,
         epoch_ms(ts) AS changed_ms,
         'reason_' || (event_id % 5) AS change_reason,
         'user' || (event_id % 7) AS changed_by,
         event_id
  FROM events WHERE event_id % 17 = 0
),
versioned AS (
  SELECT *, row_number() OVER (
    PARTITION BY website_id ORDER BY changed_ms, event_id
  ) AS version FROM hist
)
SELECT website_id,
       CAST(max(version) AS BIGINT) AS latest_version,
       max_by(change_reason, version) AS latest_reason,
       max_by(changed_by, version) AS latest_changed_by,
       min(changed_ms) AS first_change_ms,
       max(changed_ms) AS last_change_ms
FROM versioned GROUP BY website_id
"""


def q_metrics_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus scrape re-expressed set-oriented (the last §2.9 scope cut
    made Spark-native, like live log tailing did for WebSocket streaming):
    the reference registers counter/gauge families over crawl tasks, queues,
    and the DLQ (crawler/core/metrics.py:15-29,99-117) and a background task
    refreshes the DLQ gauges from the database
    (crawler/services/dlq_metrics_updater.py:19-60) — here every family is
    derived from the snapshot tables in ONE query whose output is scrape-
    shaped: (metric, labels, value).

    Scale shape: one fine-grained pre-aggregation (a single map-side-
    combinable shuffle over the fact scan) produces a label-cardinality cube
    (<= |task_type| x |status| x |category| x |queue| x 2 rows); each cube
    row then EXPLODES into its per-family (metric, labels) contributions and
    a second, label-cardinality-sized aggregation folds them — the fact
    table is scanned exactly once. (A union-of-rollups formulation re-scans
    per family: Catalyst pushes the per-family grouping-key filters through
    the shared aggregate, so the subplans stop being identical and
    ReuseExchange can't dedup them.)"""
    ev = _events(spark, sf_dir)
    ref_now = F.lit("2024-02-01 00:00:00").cast("timestamp").cast("long")
    facts = ev.select(
        _pick(["crawl", "scrape", "api", "http", "browser"],
              F.col("event_id") % 5 + 1).alias("task_type"),
        F.when(F.col("event_id") % 10 < 7, F.lit("completed"))
        .otherwise(F.lit("failed")).alias("status"),
        _pick(_CATEGORIES, F.col("event_id") % 6 + 1).alias("error_category"),
        F.when(F.col("event_id") % 2 == 0, F.lit("crawl_jobs"))
        .otherwise(F.lit("scrape_jobs")).alias("queue_name"),
        (F.col("event_id") % 7 == 0).alias("resolved"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    cube = facts.groupBy(
        "task_type", "status", "error_category", "queue_name", "resolved"
    ).agg(
        F.count("*").alias("n"),
        F.min(F.col("ts").cast("long")).alias("min_ts"),
    )

    def lab(*parts) -> F.Column:
        return F.concat_ws(",", *[
            F.concat(F.lit(f"{c}="), F.col(c)) for c in parts
        ]) if parts else F.lit("")

    def fam(metric: str, labels: F.Column, when=None) -> F.Column:
        s = F.struct(F.lit(metric).alias("metric"), labels.alias("labels"))
        return s if when is None else F.when(when, s)

    # DLQ base: a failed task lands in the DLQ; resolved entries are
    # excluded, matching dlq_metrics_updater's unresolved-only refresh
    failed = F.col("status") == "failed"
    in_dlq = failed & ~F.col("resolved")
    # the two UNGROUPED DLQ gauges are emitted from EVERY cube row with a
    # zero/NULL contribution outside the DLQ subset: a scrape (and the
    # oracle's ungrouped aggregate arms) must report unresolved=0 and
    # age=NULL even when no unresolved failure exists — a conditional
    # struct would drop the rows entirely on such inputs
    exploded = cube.select(
        "n", "min_ts", in_dlq.alias("in_dlq"),
        F.explode(F.array_compact(F.array(
            fam("crawl_tasks_total", lab("task_type")),
            fam("crawl_tasks_completed_total", lab("task_type", "status")),
            fam("crawl_tasks_failed_total",
                lab("task_type", "error_category"), failed),
            fam("queue_messages_processed_total", lab("queue_name")),
            fam("dlq_entries_unresolved", lab()),
            fam("dlq_entries_by_category", lab("error_category"), in_dlq),
            fam("dlq_oldest_unresolved_age_seconds", lab()),
        ))).alias("f"),
    )
    ungrouped_dlq = F.col("f.metric").isin(
        "dlq_entries_unresolved", "dlq_oldest_unresolved_age_seconds"
    )
    contrib = exploded.select(
        "f",
        F.when(ungrouped_dlq & ~F.col("in_dlq"), F.lit(0))
        .otherwise(F.col("n")).alias("n"),
        F.when(ungrouped_dlq & ~F.col("in_dlq"), F.lit(None).cast("long"))
        .otherwise(F.col("min_ts")).alias("min_ts"),
    )
    return (
        contrib.groupBy("f.metric", "f.labels")
        .agg(F.sum("n").alias("sum_n"), F.min("min_ts").alias("m"))
        .select(
            "metric", "labels",
            F.when(
                F.col("metric") == "dlq_oldest_unresolved_age_seconds",
                ref_now - F.col("m"),
            ).otherwise(F.col("sum_n")).cast("long").alias("value"),
        )
    )


O_METRICS_EXPORT = """
WITH facts AS (
  SELECT (['crawl','scrape','api','http','browser'])
           [CAST(event_id % 5 AS INT) + 1] AS task_type,
         CASE WHEN event_id % 10 < 7 THEN 'completed' ELSE 'failed' END
           AS status,
         (['network_error','timeout','server_error','rate_limit',
           'parse_error','auth_error'])
           [CAST(event_id % 6 AS INT) + 1] AS error_category,
         CASE WHEN event_id % 2 = 0 THEN 'crawl_jobs' ELSE 'scrape_jobs' END
           AS queue_name,
         event_id % 7 = 0 AS resolved,
         ts
  FROM events
)
SELECT 'crawl_tasks_total' AS metric, 'task_type=' || task_type AS labels,
       CAST(count(*) AS BIGINT) AS value
FROM facts GROUP BY 2
UNION ALL
SELECT 'crawl_tasks_completed_total',
       'task_type=' || task_type || ',status=' || status,
       CAST(count(*) AS BIGINT)
FROM facts GROUP BY 2
UNION ALL
SELECT 'crawl_tasks_failed_total',
       'task_type=' || task_type || ',error_category=' || error_category,
       CAST(count(*) AS BIGINT)
FROM facts WHERE status = 'failed' GROUP BY 2
UNION ALL
SELECT 'queue_messages_processed_total', 'queue_name=' || queue_name,
       CAST(count(*) AS BIGINT)
FROM facts GROUP BY 2
UNION ALL
SELECT 'dlq_entries_unresolved', '', CAST(count(*) AS BIGINT)
FROM facts WHERE status = 'failed' AND NOT resolved
UNION ALL
SELECT 'dlq_entries_by_category', 'error_category=' || error_category,
       CAST(count(*) AS BIGINT)
FROM facts WHERE status = 'failed' AND NOT resolved GROUP BY 2
UNION ALL
SELECT 'dlq_oldest_unresolved_age_seconds', '',
       CAST(epoch(TIMESTAMP '2024-02-01 00:00:00') AS BIGINT)
         - CAST(floor(epoch(min(ts))) AS BIGINT)
FROM facts WHERE status = 'failed' AND NOT resolved
"""


def q_retry_failure_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetFailureRateByCategory + CountRetryAttemptsByCategory
    (sql/queries/retry_history.sql:60-80): per-category failure count,
    distinct-job breadth, and mean backoff over a TIME WINDOW — the window
    bounds derive from the data (middle 80% of the observed span) so both
    sides compute them identically. The window predicate is the part that
    matters at scale: on a time-partitioned retry_history table it prunes
    partitions before the single map-side-combinable aggregate; the
    distinct-job count is the only shuffle-expanding term (count_distinct
    -> partial sets per mapper)."""
    ev = _events(spark, sf_dir)
    hist = ev.select(
        (F.col("event_id") % 500).alias("job_id"),
        _pick(_CATEGORIES, F.col("event_id") % 6 + 1).alias("error_category"),
        ((F.col("event_id") % 9 + 1) * (F.col("event_id") % 4 + 1))
        .cast("long")
        .alias("retry_delay_seconds"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("attempted_ms"),
    )
    span = hist.agg(
        F.min("attempted_ms").alias("lo"), F.max("attempted_ms").alias("hi")
    ).first()
    if span["lo"] is None:  # empty input: empty window, empty result
        start = end = 0
    else:
        # parenthesize the floor-div exactly like the oracle: 9*((hi-lo)//10),
        # NOT (9*(hi-lo))//10 — the two differ by up to 8 ms on the end bound
        start = span["lo"] + (span["hi"] - span["lo"]) // 10
        end = span["lo"] + 9 * ((span["hi"] - span["lo"]) // 10)
    return (
        hist.filter(
            (F.col("attempted_ms") >= F.lit(start))
            & (F.col("attempted_ms") < F.lit(end))
        )
        .groupBy("error_category")
        .agg(
            F.count("*").alias("failure_count"),
            F.count_distinct("job_id").alias("unique_jobs"),
            F.round(F.avg("retry_delay_seconds"), 6).alias("avg_delay_seconds"),
        )
    )


O_RETRY_FAILURE_RATES = """
WITH hist AS (
  SELECT event_id % 500 AS job_id,
         (['network_error','timeout','server_error','rate_limit','parse_error','auth_error'])
           [CAST(event_id % 6 AS INT) + 1] AS error_category,
         CAST((event_id % 9 + 1) * (event_id % 4 + 1) AS BIGINT)
           AS retry_delay_seconds,
         epoch_ms(ts) AS attempted_ms
  FROM events
),
win AS (
  SELECT min(attempted_ms) + (max(attempted_ms) - min(attempted_ms)) // 10
           AS start_ms,
         min(attempted_ms) + 9 * ((max(attempted_ms) - min(attempted_ms)) // 10)
           AS end_ms
  FROM hist
)
SELECT error_category,
       count(*) AS failure_count,
       CAST(count(DISTINCT job_id) AS BIGINT) AS unique_jobs,
       round(avg(retry_delay_seconds), 6) AS avg_delay_seconds
FROM hist, win
WHERE attempted_ms >= start_ms AND attempted_ms < end_ms
GROUP BY error_category
"""


def q_log_trace_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListLogsByTraceID (sql/queries/crawl_log.sql): all log rows sharing
    one trace id, ordered by creation — distributed-tracing lookup over the
    append-only log table. Scale shape: trace_id equality is a pushed-down
    parquet predicate (PushedFilters on a dictionary-encoded column); no
    shuffle at all — the ORDER BY is a driver-side concern at trace
    cardinality (tens of rows)."""
    ev = _events(spark, sf_dir)
    logs = ev.select(
        F.col("event_id").alias("log_id"),
        (F.col("event_id") % 500).alias("job_id"),
        (F.col("user_id") % 25).cast("int").alias("website_id"),
        F.concat(F.lit("step_"), (F.col("event_id") % 8).cast("string")).alias(
            "step_name"
        ),
        _pick(_LEVELS, F.col("event_id") % 10 + 1).alias("log_level"),
        F.concat(F.lit("trace-"), (F.col("event_id") % 311).cast("string")).alias(
            "trace_id"
        ),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("created_ms"),
    )
    return logs.filter(F.col("trace_id") == "trace-7").orderBy(
        "created_ms", "log_id"
    )


O_LOG_TRACE_SCAN = """
SELECT event_id AS log_id,
       event_id % 500 AS job_id,
       CAST(user_id % 25 AS INT) AS website_id,
       'step_' || (event_id % 8) AS step_name,
       (['DEBUG','DEBUG','INFO','INFO','INFO','INFO','WARNING','ERROR','ERROR','CRITICAL'])
         [CAST(event_id % 10 AS INT) + 1] AS log_level,
       'trace-' || (event_id % 311) AS trace_id,
       epoch_ms(ts) AS created_ms
FROM events
WHERE event_id % 311 = 7
ORDER BY created_ms, log_id
"""


QUERIES = {
    "metrics_export": q_metrics_export,
    "retry_failure_rates": q_retry_failure_rates,
    "log_trace_scan": q_log_trace_scan,
    "website_statistics": q_website_statistics,
    "log_level_stats": q_log_level_stats,
    "dlq_stats_category": q_dlq_stats_category,
    "config_history_versions": q_config_history_versions,
}

ORACLES = {
    "metrics_export": O_METRICS_EXPORT,
    "retry_failure_rates": O_RETRY_FAILURE_RATES,
    "log_trace_scan": O_LOG_TRACE_SCAN,
    "website_statistics": O_WEBSITE_STATISTICS,
    "log_level_stats": O_LOG_LEVEL_STATS,
    "dlq_stats_category": O_DLQ_STATS_CATEGORY,
    "config_history_versions": O_CONFIG_HISTORY_VERSIONS,
}
