"""A/B the adaptive re-crawl cadence: conditional-only vs adaptive fetch
economy on one corpus over N rounds.

Both runs share the fixture corpus (static pages, so every revisit observes
'unchanged' — the regime that dominates a web-scale crawl, where archives
outnumber live dockets). Conditional mode already makes an unchanged
re-fetch skip parse+merge; adaptive mode (`adaptive_ttl`) additionally
backs the VISIT cadence off (interval 2n+1 rounds after n unchanged
observations), so the measured deltas are fetches + fetch_log rows +
pacing wall — the costs that at 10^10 URLs are the crawl's budget itself.

Usage: python scripts/bench_adaptive.py [rounds] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.engine.corpus import CorpusSpec, build_corpus, robots_map, seed_urls
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.session import get_spark


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spec = CorpusSpec(n_hosts=4, listing_pages=4, details_per_page=5,
                      hosts_with_robots=0)
    corpus, robots, seeds = build_corpus(spec), robots_map(spec), seed_urls(spec)
    spark = get_spark("bench_adaptive", cpus=cpus, shuffle_partitions=16)

    out = {}
    for mode, kw in [
        ("conditional", dict(conditional_recrawl=True)),
        ("adaptive", dict(conditional_recrawl=True, adaptive_ttl=8)),
    ]:
        root = tempfile.mkdtemp(prefix=f"bench_adapt_{mode}_")
        eng = CrawlEngine(spark, root, corpus, robots, per_host_budget=4,
                          ttl_rounds=2, **kw)
        t0 = time.time()
        metrics = eng.run(seeds=seeds, max_rounds=rounds)
        wall = round(time.time() - t0, 2)
        n_fetched = sum(m.get("n_fetched", 0) for m in metrics)
        n_nm = sum(m.get("n_not_modified", 0) for m in metrics)
        n_def = sum(m.get("n_adaptive_deferred", 0) for m in metrics)
        out[mode] = {
            "rounds": len(metrics), "wall_sec": wall,
            "fetches": n_fetched, "not_modified_304": n_nm,
            "adaptive_deferred": n_def,
            "fetch_log_rows": eng.store.table_rows("fetch_log"),
        }
    c, a = out["conditional"], out["adaptive"]
    out["fetch_reduction"] = round(1 - a["fetches"] / max(1, c["fetches"]), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
