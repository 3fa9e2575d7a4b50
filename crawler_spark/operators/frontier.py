"""Frontier scheduling operators (S1-S6): rank, budget, salting.

The reference drains one Redis ZSET a job at a time; here a whole round is
ONE window over the frontier partitioned by host — the politeness budget
becomes a rank predicate, so scheduling 10^8 pending URLs is a single
shuffle on host (salted when hot) instead of 10^8 queue pops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.frontier_exprs import priority_score_col


def with_priority_score(df: DataFrame, priority: str = "priority", scheduled_at: str = "scheduled_at") -> DataFrame:
    return df.withColumn("priority_score", priority_score_col(F.col(priority), F.col(scheduled_at)))


def due_filter(df: DataFrame, round_start, not_before: str = "not_before") -> DataFrame:
    """R6: retry-scheduler poll as a plain predicate (free in batch model)."""
    return df.filter(F.col(not_before).isNull() | (F.col(not_before) <= F.lit(round_start)))


def per_host_budget_selection(
    frontier: DataFrame,
    budgets: DataFrame,
    host: str = "host",
    score: str = "priority_score",
    budget_col: str = "budget",
    tiebreak: str = "url_hash",
) -> DataFrame:
    """S3+S5: within each host, take the `budget` lowest-score rows.

    `budgets` is a small per-host dim (host, budget) — broadcast, no extra
    shuffle beyond the rank's hash partitioning on host. The deterministic
    tiebreak column makes crawl order reproducible under any parallelism.
    """
    w = Window.partitionBy(host).orderBy(F.col(score).asc(), F.col(tiebreak).asc())
    return (
        frontier.join(F.broadcast(budgets), host, "left")
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= F.coalesce(F.col(budget_col), F.lit(0)))
        .withColumn("fetch_order", F.col("__rank"))
        .drop("__rank", budget_col)
    )


def politeness_budgets(
    seeds: DataFrame,
    round_seconds: float,
    host: str = "host",
    rps_col: str = "rate_limit_rps",
    crawl_delay_col: str | None = "crawl_delay_s",
    burst: int = 10,
) -> DataFrame:
    """Token-bucket budget as data (local_rate_limiter.py:67-104 semantics in
    aggregate): a host may fetch floor(effective_rate * round_seconds) + burst
    headroom in a round, where robots crawl-delay lowers the effective rate
    to min(rps, 1/crawl_delay)."""
    eff = F.col(rps_col)
    if crawl_delay_col is not None:
        eff = F.when(
            F.col(crawl_delay_col).isNotNull() & (F.col(crawl_delay_col) > 0),
            F.least(F.col(rps_col), 1.0 / F.col(crawl_delay_col)),
        ).otherwise(F.col(rps_col))
    # F.min, not max: with several seed rows per host the BINDING (most
    # restrictive) rate governs — max would let one row lacking its
    # crawl_delay erase the robots delay for the whole host. coalesce:
    # F.least skips nulls, so an all-null rate (unknown limit) would
    # otherwise inherit the 10^6 cap instead of the conservative
    # burst-only trickle.
    return seeds.groupBy(host).agg(
        F.least(
            F.coalesce(
                F.floor(F.min(eff) * round_seconds), F.lit(0)
            ) + burst,
            F.lit(10**6),
        ).cast("long").alias("budget")
    )


def hot_host_salt(
    frontier: DataFrame, host: str = "host", hot_threshold: int = 10_000, n_salts: int = 16
) -> DataFrame:
    """Skew handling: hosts whose pending count exceeds the threshold spread
    across n_salts fetch sub-groups (politeness budget is split per salt by
    the caller); cold hosts keep a single group. Counting is one agg; the
    salt assignment is a broadcast join back."""
    counts = frontier.groupBy(host).agg(F.count("*").alias("__pending"))
    return (
        frontier.join(F.broadcast(counts), host)
        .withColumn(
            "host_salt",
            F.when(
                F.col("__pending") > hot_threshold,
                F.pmod(F.xxhash64(F.col("url_hash")), F.lit(n_salts)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("__pending")
    )


def salted_budget_selection(
    frontier: DataFrame,
    budgets: DataFrame,
    host: str = "host",
    score: str = "priority_score",
    budget_col: str = "budget",
    tiebreak: str = "url_hash",
    hot_threshold: int = 10_000,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe variant of per_host_budget_selection (SURVEY.md §4.3 #2).

    Hot hosts (pending > hot_threshold) are spread over n_salts sub-groups so
    no single task sorts one giant host partition; the HOST-level politeness
    budget is split across salts (floor division, remainder to the lowest
    salt indexes) so the aggregate never exceeds the host budget. Cold hosts
    keep salt 0 and their exact budget — identical to the unsalted plan.

    The rank shuffle is on (host, host_salt): a host with 10^8 pending URLs
    costs n_salts parallel sorts of 10^8/n_salts rows instead of one serial
    sort — the difference between a straggler task and a balanced stage.
    """
    # hotness comes straight from the counts aggregate — deriving it with a
    # max() window over partitionBy(host) would funnel the entire hot host
    # into ONE WindowExec task, reinstating the exact straggler (plus an
    # extra host exchange) the salting exists to prevent
    counts = frontier.groupBy(host).agg(F.count("*").alias("__pending"))
    salted = (
        frontier.join(F.broadcast(counts), host)
        .withColumn("__is_hot", F.col("__pending") > hot_threshold)
        .withColumn(
            "host_salt",
            F.when(
                F.col("__is_hot"),
                F.pmod(F.xxhash64(F.col("url_hash")), F.lit(n_salts)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("__pending")
    )
    # per-(host,salt) budget: floor(budget/n_salts) + 1 for the first
    # (budget % n_salts) salts; cold hosts (salt always 0) keep budget intact
    joined = salted.join(F.broadcast(budgets), host, "left")
    per_salt = F.when(
        ~F.col("__is_hot"), F.col(budget_col)
    ).otherwise(
        F.floor(F.col(budget_col) / n_salts)
        + F.when(F.col("host_salt") < F.col(budget_col) % n_salts, 1).otherwise(0)
    )
    w = Window.partitionBy(host, "host_salt").orderBy(
        F.col(score).asc(), F.col(tiebreak).asc()
    )
    return (
        joined.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= F.coalesce(per_salt, F.lit(0)))
        .drop("__rank", "__is_hot", budget_col)
    )


def enqueue_idempotent(
    frontier: DataFrame,
    new_rows: DataFrame,
    key: str = "url_hash",
    order_col: str | None = None,
    dedup_batch: bool = True,
) -> DataFrame:
    """S2 (ZADD NX): first-write-wins — new rows that collide with an
    existing frontier key are dropped, existing scores never updated.
    WITHIN-batch collisions also collapse to one row by default (the key
    invariant lives in the operator, not at call sites): the
    lowest-`order_col` row when given — deterministic first-write — else
    an arbitrary row per key. A caller that already key-deduped its batch
    passes dedup_batch=False to skip the redundant exchange."""
    if dedup_batch:
        if order_col is not None:
            w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
            new_rows = (
                new_rows.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            new_rows = new_rows.dropDuplicates([key])
    return frontier.unionByName(
        new_rows.join(frontier.select(key).distinct(), key, "left_anti"),
        allowMissingColumns=True,
    )
