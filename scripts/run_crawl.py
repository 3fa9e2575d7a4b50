"""spark-submit entry point for the frontier engine (north-rule packaging).

Usage (what a cluster deployment runs; works identically on local[N]):

    python scripts/package.py                       # -> dist/crawler_spark.zip
    spark-submit --master local[32] \
        --py-files dist/crawler_spark.zip \
        scripts/run_crawl.py --store /tmp/crawl_store --budget 8 --rounds 12

On a real cluster only --master changes; the engine's partitioning (host-hash
shards, salting) and snapshot commits are executor-count-agnostic. Resumes
automatically if --store already holds a manifest.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="snapshot store root")
    ap.add_argument("--budget", type=int, default=8, help="per-host budget/round")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--hosts", type=int, default=4, help="fixture corpus size")
    ap.add_argument(
        "--audited", action="store_true",
        help="commit every round write-audit-publish behind the standard "
        "gates (duplicate-rate circuit breaker, append-only monotonicity, "
        "span-sample parse equality); a vetoed round rolls back and stops",
    )
    ap.add_argument(
        "--max-dup-rate", type=float, default=0.9,
        help="duplicate-rate veto threshold for --audited",
    )
    ap.add_argument(
        "--expire-keep", type=int, default=0,
        help="after the run, expire snapshots to the last N rounds "
        "(0 = keep all) and remove crash-orphaned dirs older than an hour",
    )
    ap.add_argument(
        "--ttl-rounds", type=int, default=0,
        help="windowed URL-seen membership in rounds (0 = permanent)",
    )
    ap.add_argument(
        "--trap-max-urls", type=int, default=0,
        help="crawl-trap cutoff: max enqueued URLs per (host, path "
        "template) before new candidates of that template are dropped "
        "(0 = off)",
    )
    ap.add_argument(
        "--breaker", default="",
        help="per-host error circuit breaker as 'threshold,min_attempts,"
        "cooldown_rounds' (e.g. '0.5,5,3'; empty = off)",
    )
    ap.add_argument(
        "--conditional-recrawl", action="store_true",
        help="ETag/304 semantics on TTL re-crawls (requires --ttl-rounds): "
        "unchanged bodies skip parse + page write, stored links recirculate",
    )
    args = ap.parse_args()
    breaker = None
    if args.breaker:
        thr, min_att, cooldown = args.breaker.split(",")
        breaker = (float(thr), int(min_att), int(cooldown))

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lexi-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from crawler_spark.engine.corpus import (
        CorpusSpec,
        build_corpus,
        robots_map,
        seed_urls,
        website_configs,
    )
    from crawler_spark.engine.superstep import CrawlEngine

    spec = CorpusSpec(n_hosts=args.hosts)
    eng = CrawlEngine(
        spark, args.store, build_corpus(spec), robots_map(spec),
        per_host_budget=args.budget,
        selector_configs=website_configs(spec),
        ttl_rounds=args.ttl_rounds or None,
        trap_max_urls=args.trap_max_urls or None,
        breaker=breaker,
        conditional_recrawl=args.conditional_recrawl,
    )
    gate = None
    if args.audited:
        from crawler_spark.engine.audits import (
            all_of,
            duplicate_rate_gate,
            monotonic_tables_gate,
            span_sample_gate,
        )

        gate = all_of(
            monotonic_tables_gate(),
            duplicate_rate_gate(args.max_dup_rate),
            span_sample_gate(),
        )
    seeds = None if eng.store.manifest()["rounds"] else seed_urls(spec)
    rounds = eng.run(seeds=seeds, max_rounds=args.rounds, audit_gate=gate)
    maintenance = None
    if args.expire_keep > 0:
        maintenance = {
            "expire": eng.store.expire_snapshots(keep_last=args.expire_keep),
            "orphans": eng.store.remove_orphans(),
        }
    print(json.dumps({"rounds": rounds, "maintenance": maintenance}, default=int))
    spark.stop()


if __name__ == "__main__":
    main()
