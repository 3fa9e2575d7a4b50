"""Measure per-round filter-blob IO as the crawl ages.

The merge-on-read blob chain claims per-round blob WRITE bytes are
O(round delta), not O(|filter store|): a permanent-membership round appends
one small delta dir (this round's fresh keys) instead of rewriting every
shard's full bloom/cuckoo/exact files. If that holds, a late round's blob
bytes match an early round's at equal delta size even though the
accumulated store is many times larger — and the compaction round is the
only one whose write scales with the corpus. This script runs a fixture
crawl and prints one JSON line per blob-writing round: dir bytes, exact-
layer pairs (16 B/key, floor-free — the honest delta measure), chain
length, and mode.

TTL mode (`--ttl N`): the round-4 claim — TTL retirement appends an
immutable adds+tombstones delta element (O(fresh + expiring cohort) bytes)
instead of the old in-place full-shard rewrite (O(active window) bytes every
round). The per-round `written_bytes` line must stay flat as the window
ages; `tomb_pairs` tracks the expiring cohort (16 B/key, floor-free).

Usage: python scripts/bench_blob_chain.py [rounds] [--ttl N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.engine.corpus import (
    CorpusSpec,
    build_corpus,
    robots_map,
    seed_urls,
)
from crawler_spark.engine.superstep import CrawlEngine
from crawler_spark.session import get_spark


def _dir_stats(d: str) -> tuple[int, int, int]:
    total = pairs = tombs = 0
    for f in os.listdir(d):
        sz = os.path.getsize(os.path.join(d, f))
        total += sz
        if f.startswith("exact-"):
            pairs += (sz - 12) // 16
        elif f.startswith("tomb-"):
            tombs += (sz - 12) // 16
    return total, pairs, tombs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_rounds = int(args[0]) if args else 12
    ttl = None
    if "--ttl" in sys.argv:
        ttl = int(sys.argv[sys.argv.index("--ttl") + 1])
    spec = CorpusSpec(
        n_hosts=24,
        listing_pages=max_rounds + 4,
        details_per_page=6,
        hosts_with_robots=6,
    )
    spark = get_spark("bench-blob-chain", cpus=16, shuffle_partitions=16)
    with tempfile.TemporaryDirectory() as root:
        eng = CrawlEngine(
            spark, root, build_corpus(spec), robots_map(spec),
            per_host_budget=4, ttl_rounds=ttl,
        )
        eng.run(seeds=seed_urls(spec), max_rounds=max_rounds)
        rounds = eng.store.manifest()["rounds"]
        store_bytes = 0
        for r in rounds:
            bd = r.get("blob_dir")
            chain = r.get("blob_chain") or ([bd] if bd else [])
            if not bd:
                continue
            total, pairs, tombs = _dir_stats(bd)
            fold_dir = eng.store.blob_fold_dir_for(r["round"])
            fold_bytes = (
                _dir_stats(fold_dir)[0] if os.path.isdir(fold_dir) else 0
            )
            store_bytes = sum(_dir_stats(d)[0] for d in chain)
            print(json.dumps({
                "round": r["round"],
                "mode": "base" if len(chain) == 1 else "delta",
                "written_bytes": total,
                "fold_bytes": fold_bytes,  # staggered 1/REBUILD_EVERY cohort
                "exact_pairs_written": pairs,
                "tomb_pairs_written": tombs,
                "chain_len": len(chain),
                "store_bytes": store_bytes,
                "write_amplification": round(total / max(store_bytes, 1), 3),
            }))
        deltas = [
            r for r in rounds
            if r.get("blob_dir") and len(r.get("blob_chain") or []) > 1
        ]
        if deltas:
            first, last = deltas[0], deltas[-1]
            fb = _dir_stats(first["blob_dir"])
            lb = _dir_stats(last["blob_dir"])
            print(json.dumps({
                "summary": "blob-chain flatness",
                "ttl_rounds": ttl,
                "first_delta_round": first["round"],
                "first_written_bytes": fb[0],
                "first_pairs": fb[1],
                "last_delta_round": last["round"],
                "last_written_bytes": lb[0],
                "last_pairs": lb[1],
                "final_store_bytes": store_bytes,
            }))


if __name__ == "__main__":
    main()
