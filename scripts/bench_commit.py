"""Measure per-round snapshot-commit cost as the crawl ages.

The delta-based SnapshotStore claims per-round IO is O(delta), not
O(|table|): an active round writes only the round's new rows for the
append-only tables (seen/pages/fetch_log/dlq/retry_history) and a full
snapshot only for the small frontier. If that holds, commit wall time at
round 10 matches round 2 at equal delta size even though the accumulated
tables are ~5x larger. This script times every `commit_round` call over a
fixture crawl large enough to stay active past round 10 and prints one
JSON line per round: commit seconds, per-table delta rows, and the
accumulated live-table size — the evidence row for BENCH/BASELINE.md.

Usage: python scripts/bench_commit.py [rounds]
"""

from __future__ import annotations

import json
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
from crawler_spark.engine.snapshots import SnapshotStore
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.session import get_spark


def main() -> None:
    max_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    # a listing chain deeper than max_rounds keeps every round active
    # (new pages discovered each round) with a steady per-round delta
    spec = CorpusSpec(
        n_hosts=24,
        listing_pages=max_rounds + 4,
        details_per_page=6,
        hosts_with_robots=6,
    )
    spark = get_spark("bench-commit", cpus=16, shuffle_partitions=16)

    timings: list[dict] = []
    orig = SnapshotStore.commit_round

    def timed(self, round_no, tables, **kw):
        t0 = time.time()
        entry = orig(self, round_no, tables, **kw)
        timings.append(
            {
                "round": round_no,
                "commit_s": round(time.time() - t0, 3),
                "modes": {n: t["mode"] for n, t in entry["tables"].items()},
                "rows": {n: t["rows"] for n, t in entry["tables"].items()},
            }
        )
        return entry

    SnapshotStore.commit_round = timed
    try:
        with tempfile.TemporaryDirectory() as root:
            eng = CrawlEngine(
                spark,
                root,
                build_corpus(spec),
                robots_map(spec),
                per_host_budget=4,
            )
            eng.run(seeds=seed_urls(spec), max_rounds=max_rounds)
            live = eng.store.table_rows("seen")
    finally:
        SnapshotStore.commit_round = orig

    active = [
        t
        for t in timings
        if t["round"] >= 0 and t["modes"].get("seen") == "delta"
    ]
    for t in timings:
        print(json.dumps(t))
    if len(active) >= 2:
        first, last = active[0], active[-1]
        print(
            json.dumps(
                {
                    "summary": "delta-commit flatness",
                    "first_active_round": first["round"],
                    "first_commit_s": first["commit_s"],
                    "first_seen_delta_rows": first["rows"].get("seen"),
                    "last_active_round": last["round"],
                    "last_commit_s": last["commit_s"],
                    "last_seen_delta_rows": last["rows"].get("seen"),
                    "seen_live_rows_at_end": live,
                }
            )
        )


if __name__ == "__main__":
    main()
