"""Zipf-skew politeness A/B: salted vs unsalted budget selection.

The salted selection's equivalence to the plain per-host rank is gated in
tests (same selected set), but the WIN was never measured. A real frontier
is Zipf-distributed over hosts (a handful of giant portals, a long tail);
the unsalted plan funnels each host into one WindowExec task, so the
hottest host becomes the straggler that sets stage wall time. This builds a
Zipf(alpha) frontier, runs both plans at the same budget, and reports wall
time plus per-task skew from the Spark task metrics.

Usage: python scripts/bench_zipf_salting.py [--urls 4000000] [--alpha 1.1]
       [--hosts 2000] [--cpus 16] [--budget 100] [--trials 2]
Prints one JSON line per plan and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.operators.frontier import (
    per_host_budget_selection,
    salted_budget_selection,
)
from crawler_spark.session import get_spark


def _zipf_frontier(spark, n_urls: int, n_hosts: int, alpha: float, n_parts: int):
    """Zipf(alpha) host assignment via inverse-CDF on a uniform hash: host
    rank r gets mass proportional to 1/r^alpha. The inverse CDF is
    materialized as a broadcast lookup of cumulative boundaries."""
    import numpy as np

    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = 1.0 / ranks**alpha
    cdf = np.cumsum(w) / w.sum()
    bounds = spark.createDataFrame(
        [(int(i) + 1, float(lo), float(hi)) for i, (lo, hi) in enumerate(
            zip(np.concatenate([[0.0], cdf[:-1]]), cdf)
        )],
        "host_rank int, lo double, hi double",
    )
    base = spark.range(0, n_urls, 1, n_parts).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(1 << 30)) / (1 << 30)).alias("u"),
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(10**6))).alias("priority_score"),
    )
    return (
        base.join(
            F.broadcast(bounds),
            (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
        )
        .select(
            F.concat(F.lit("portal"), F.col("host_rank").cast("string"),
                     F.lit(".go.id")).alias("host"),
            "url_hash",
            F.col("priority_score").cast("long"),
        )
    )


def main() -> None:
    def arg(name: str, default):
        if name in sys.argv:
            v = sys.argv[sys.argv.index(name) + 1]
            return type(default)(v)
        return default

    n_urls = arg("--urls", 4_000_000)
    alpha = arg("--alpha", 1.1)
    n_hosts = arg("--hosts", 2000)
    cpus = arg("--cpus", 16)
    budget = arg("--budget", 100)
    trials = arg("--trials", 2)
    spark = get_spark(
        "bench-zipf-salting", cpus=cpus, shuffle_partitions=cpus * 4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    frontier = _zipf_frontier(spark, n_urls, n_hosts, alpha, cpus * 4).cache()
    n = frontier.count()
    top = frontier.groupBy("host").count().orderBy(F.desc("count")).limit(3)
    hot = [(r["host"], r["count"]) for r in top.collect()]
    budgets = spark.createDataFrame(
        [(f"portal{r}.go.id", budget) for r in range(1, n_hosts + 1)],
        "host string, budget long",
    )

    sc = spark.sparkContext
    results = {}
    for mode in ("unsalted", "salted"):
        if mode == "unsalted":
            plan = per_host_budget_selection(
                frontier, budgets, tiebreak="url_hash"
            )
        else:
            plan = salted_budget_selection(
                frontier, budgets, tiebreak="url_hash",
                hot_threshold=10_000, n_salts=16,
            )
        best = None
        n_sel = None
        for _ in range(trials):
            t0 = time.time()
            n_sel = plan.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        results[mode] = {"wall_sec": round(best, 2), "n_selected": n_sel}
        print(json.dumps({"mode": mode, "n_frontier": n, "hot_hosts": hot,
                          **results[mode]}), flush=True)
    assert results["salted"]["n_selected"] == results["unsalted"]["n_selected"], \
        "salted selection changed the selected count — equivalence broken"
    print(json.dumps({
        "summary": "zipf salting A/B",
        "alpha": alpha,
        "speedup": round(
            results["unsalted"]["wall_sec"] / results["salted"]["wall_sec"], 2
        ),
    }))


if __name__ == "__main__":
    main()
