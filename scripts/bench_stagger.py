"""Staggered-compaction flatness: max round wall time ~= median.

Before r04, every REBUILD_EVERY-th round folded ALL table chains plus the
whole filter store — an O(store) spike while neighbouring rounds wrote
O(delta). Staggering folds at most one table chain and one shard cohort per
round, so maintenance cost is spread: the claim to verify is that the
slowest round of a long crawl is close to the median round, instead of
REBUILD_EVERY-periodic spikes. This times every full round (superstep +
commit, driver wall) over a fixture crawl and prints per-round walls plus
the max/median ratio.

Usage: python scripts/bench_stagger.py [rounds]   (default 32)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    robots_map,
    seed_urls,
)
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.session import get_spark


def main() -> None:
    max_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spec = CorpusSpec(
        n_hosts=24,
        listing_pages=max_rounds + 4,
        details_per_page=6,
        hosts_with_robots=6,
    )
    spark = get_spark("bench-stagger", cpus=16, shuffle_partitions=16)
    with tempfile.TemporaryDirectory() as root:
        eng = CrawlEngine(
            spark, root, build_corpus(spec), robots_map(spec),
            per_host_budget=4,
        )
        eng.init_frontier(seed_urls(spec))

        def dir_bytes(d):
            if not d or not os.path.isdir(d):
                return 0
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d)
                for f in fs
            )

        walls = []
        for rnd in range(max_rounds):
            t0 = time.time()
            m = eng.run_round(rnd)
            dt = time.time() - t0
            if m.get("done"):
                break
            if not m.get("n_fetched"):
                continue
            entry = next(
                r for r in eng.store.manifest()["rounds"]
                if r["round"] == rnd
            )
            written = sum(
                dir_bytes(t["path"]) for t in entry["tables"].values()
            )
            written += dir_bytes(entry.get("blob_dir"))
            written += dir_bytes(eng.store.blob_fold_dir_for(rnd))
            folded = sorted(
                t for t, info in entry["tables"].items()
                if info["mode"] == "full"
            )
            walls.append({
                "round": rnd, "wall_s": round(dt, 2),
                "n_fetched": m["n_fetched"],
                "written_bytes": written,
                "folded_tables": folded,
            })
        for w in walls:
            print(json.dumps(w), flush=True)
        # skip the first two rounds (JVM/codegen warm-up, tiny frontier)
        steady = walls[2:]
        if steady:
            ws = [w["wall_s"] for w in steady]
            bs = [w["written_bytes"] for w in steady]
            print(json.dumps({
                "summary": "staggered compaction flatness",
                "rounds_measured": len(steady),
                "median_wall_s": round(statistics.median(ws), 2),
                "max_wall_s": round(max(ws), 2),
                "max_over_median_wall": round(
                    max(ws) / statistics.median(ws), 2
                ),
                "median_written_bytes": int(statistics.median(bs)),
                "max_written_bytes": max(bs),
                "max_over_median_bytes": round(
                    max(bs) / statistics.median(bs), 2
                ),
            }))


if __name__ == "__main__":
    main()
