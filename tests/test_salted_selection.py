"""Skew-safe salted budget selection: aggregate budgets preserved, cold hosts
identical to the unsalted plan, hot hosts spread across salt groups."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import (
    per_host_budget_selection,
    salted_budget_selection,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot host: 5000 pending; cold hosts: 40 each
    hot = spark.range(5000).select(
        F.lit("hot.go.id").alias("host"),
        F.col("id").alias("priority_score"),
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
    )
    cold = spark.range(40 * 3).select(
        F.concat(F.lit("cold"), (F.col("id") % 3).cast("string"), F.lit(".go.id")).alias("host"),
        F.col("id").alias("priority_score"),
        F.sha2((F.col("id") + 10_000_000).cast("string"), 256).alias("url_hash"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def budgets(spark):
    rows = [("hot.go.id", 37)] + [(f"cold{i}.go.id", 10) for i in range(3)]
    return spark.createDataFrame(rows, "host string, budget long")


def test_aggregate_budget_never_exceeded(spark, skewed, budgets):
    sel = salted_budget_selection(
        skewed, budgets, hot_threshold=1000, n_salts=8
    )
    counts = {r.host: r.n for r in sel.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts["hot.go.id"] == 37  # floor-split + remainder fills exactly
    for i in range(3):
        assert counts[f"cold{i}.go.id"] == 10


def test_cold_hosts_identical_to_unsalted(spark, skewed, budgets):
    cold_only = skewed.filter(F.col("host") != "hot.go.id")
    a = salted_budget_selection(cold_only, budgets, hot_threshold=1000, n_salts=8)
    b = per_host_budget_selection(cold_only, budgets)
    assert sorted(r.url_hash for r in a.collect()) == sorted(
        r.url_hash for r in b.collect()
    )


def test_hot_host_spread_over_salts(spark, skewed, budgets):
    sel = salted_budget_selection(skewed, budgets, hot_threshold=1000, n_salts=8)
    salts = sel.filter(F.col("host") == "hot.go.id").select("host_salt").distinct().count()
    assert salts >= 4  # 37 picks across 8 salts -> most salts active


def test_per_salt_budget_split_exact(spark, skewed, budgets):
    sel = salted_budget_selection(skewed, budgets, hot_threshold=1000, n_salts=8)
    per_salt = {
        r.host_salt: r.n
        for r in sel.filter(F.col("host") == "hot.go.id")
        .groupBy("host_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # 37 = 8*4 + 5 -> salts 0-4 get 5, salts 5-7 get 4
    for s, n in per_salt.items():
        assert n == (5 if s < 5 else 4)
