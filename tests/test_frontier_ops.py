"""Frontier primitives not covered elsewhere: idempotent enqueue (S2 ZADD-NX
semantics), due filter (R6), crawl-delay-aware politeness budgets (S5)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import (
    due_filter,
    enqueue_idempotent,
    politeness_budgets,
    with_priority_score,
)


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        ("h1", "a" * 8, 5, 0),
        ("h1", "b" * 8, 3, 2),
        ("h2", "c" * 8, 7, 0),
    ]
    return spark.createDataFrame(
        rows, "host string, url_hash string, priority int, not_before long"
    )


def test_enqueue_first_write_wins(spark, frontier):
    new = spark.createDataFrame(
        [
            ("h1", "a" * 8, 9, 0),   # collides: must NOT update priority
            ("h3", "d" * 8, 1, 0),   # fresh: must append
        ],
        "host string, url_hash string, priority int, not_before long",
    )
    out = enqueue_idempotent(frontier, new)
    assert out.count() == 4
    a_row = out.filter(F.col("url_hash") == "a" * 8).collect()
    assert len(a_row) == 1 and a_row[0].priority == 5  # ZADD NX: score untouched
    assert out.filter(F.col("url_hash") == "d" * 8).count() == 1


def test_due_filter_respects_not_before_and_nulls(spark, frontier):
    with_null = frontier.unionByName(
        spark.createDataFrame(
            [("h4", "e" * 8, 1, None)],
            "host string, url_hash string, priority int, not_before long",
        )
    )
    due = due_filter(with_null, round_start=0)
    got = {r.url_hash for r in due.collect()}
    assert got == {"a" * 8, "c" * 8, "e" * 8}  # not_before=2 held; null is due


def test_politeness_budget_crawl_delay_lowers_rate(spark):
    seeds = spark.createDataFrame(
        [
            ("fast.go.id", 2.0, None),
            ("slow.go.id", 2.0, 5.0),   # crawl-delay 5s -> effective 0.2 rps
            ("zero.go.id", 2.0, 0.0),   # zero delay ignored
        ],
        "host string, rate_limit_rps double, crawl_delay_s double",
    )
    budgets = {r.host: r.budget for r in politeness_budgets(seeds, round_seconds=60).collect()}
    assert budgets["fast.go.id"] == 60 * 2 + 10
    assert budgets["slow.go.id"] == int(60 * 0.2) + 10
    assert budgets["zero.go.id"] == 60 * 2 + 10


def test_priority_score_formula_exact(spark):
    df = spark.createDataFrame(
        [(3, "2024-01-15 00:00:00"), (12, "2024-01-15 00:00:00"), (-2, "2024-01-15 00:00:00")],
        "priority int, scheduled_at string",
    ).withColumn("scheduled_at", F.col("scheduled_at").cast("timestamp"))
    out = {r.priority: r.priority_score for r in with_priority_score(df).collect()}
    epoch_ms = 1705276800000
    assert out[3] == 7 * 10**12 + epoch_ms
    assert out[12] == 0 * 10**12 + epoch_ms   # clamped to 10
    assert out[-2] == 10 * 10**12 + epoch_ms  # clamped to 0
