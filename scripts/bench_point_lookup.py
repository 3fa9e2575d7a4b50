"""Measure per-file bloom-index pruning for point lookups on an aged chain.

Build two identical stores whose pages table accumulated `n_rounds` delta
commits of `rows_per_round` rows each, keyed by sha256 url_hash — the column
is uniformly distributed AND exceeds the manifest bounds cap, so min/max
pruning is structurally blind here (every file must be read). One store
commits with file_index={'pages': ['url_hash']}, the other without. Then
time GetPageByURLHash-style lookups (k random committed keys) both ways and
report walls + file-open accounting. The gap is the btree-vs-seqscan gap of
the reference's ix_crawled_page_url_hash, paid in files instead of pages.

Usage: python scripts/bench_point_lookup.py [n_rounds] [rows_per_round] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.engine.snapshots import SnapshotStore
from crawler_spark.session import get_spark


def build(spark, root: str, n_rounds: int, rows: int, index: bool) -> SnapshotStore:
    store = SnapshotStore(root)
    fi = {"pages": ["url_hash"]} if index else None
    for rnd in range(n_rounds):
        df = spark.range(rows, numPartitions=8).select(
            F.sha2(F.concat(F.lit(rnd), F.lit("-"), F.col("id")), 256)
            .alias("url_hash"),
            F.lit(rnd).cast("int").alias("fetched_round"),
            F.concat(F.lit("h"), (F.col("id") % 64).cast("string"))
            .alias("host"),
        )
        kw = {"row_hints": {"pages": rows}, "file_index": fi}
        if rnd == 0:
            store.commit_round(rnd, {"pages": df}, **kw)
        else:
            store.commit_round(rnd, {}, delta_tables={"pages": df}, **kw)
    return store


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("bench_point_lookup", cpus=cpus, shuffle_partitions=32)

    base = tempfile.mkdtemp(prefix="ptlookup_bench_")
    indexed = build(spark, os.path.join(base, "idx"), n_rounds, rows, True)
    plain = build(spark, os.path.join(base, "plain"), n_rounds, rows, False)

    # deterministic committed keys spread over the chain's age
    import hashlib

    keys = [
        hashlib.sha256(f"{rnd}-{rid}".encode()).hexdigest()
        for rnd, rid in [(1, 7), (n_rounds // 2, 11), (n_rounds - 2, 3)]
    ]

    def lookup(store: SnapshotStore, h: str) -> int:
        pred = [("url_hash", "==", h)]
        return (
            store.read(spark, "pages", prune=pred)
            .filter(F.col("url_hash") == h)
            .count()
        )

    walls: dict[str, list[float]] = {"indexed": [], "plain": []}
    for _ in range(2):  # interleaved min-of-2 (co-tenant noise method)
        for name, store in (("indexed", indexed), ("plain", plain)):
            t0 = time.monotonic()
            got = sum(lookup(store, h) for h in keys)
            walls[name].append(time.monotonic() - t0)
            assert got == len(keys), (name, got)

    io_idx = indexed.prune_stats("pages", [("url_hash", "==", keys[0])])
    io_plain = plain.prune_stats("pages", [("url_hash", "==", keys[0])])
    print(json.dumps({
        "metric": "3-key url_hash point lookups on an aged pages chain",
        "n_rounds": n_rounds,
        "rows_per_round": rows,
        "cpus": cpus,
        "indexed_sec": round(min(walls["indexed"]), 3),
        "plain_sec": round(min(walls["plain"]), 3),
        "speedup": round(min(walls["plain"]) / min(walls["indexed"]), 2),
        "files_kept_indexed": io_idx["files_kept"],
        "files_kept_plain": io_plain["files_kept"],
        "files_total": io_idx["files_total"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
