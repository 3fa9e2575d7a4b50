"""Measure manifest min/max file pruning on an aged append-only chain.

Build a store whose fetch_log accumulated `n_rounds` delta commits of
`rows_per_round` rows each (the shape of an old crawl between compactions),
then time a 4-round range scan two ways: the pruned read (manifest bounds
skip every out-of-range file before Spark sees a path) vs the full chain
read with the same residual filter (Spark still row-group-skips via parquet
footers, but must list/open every file's footer). Prints one JSON line with
min-of-2 walls per mode and the file-skip accounting. The gap widens with
chain age: pruned cost is O(range files), full cost is O(chain files).

Usage: python scripts/bench_file_pruning.py [n_rounds] [rows_per_round] [cpus]
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


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rows_per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("bench_file_pruning", cpus=cpus, shuffle_partitions=32)

    tmp = tempfile.mkdtemp(prefix="prune_bench_")
    store = SnapshotStore(tmp)
    for rnd in range(n_rounds):
        df = (
            spark.range(rows_per_round, numPartitions=8)
            .select(
                F.concat(F.lit("h"), (F.col("id") % 256).cast("string"),
                         F.lit(".example")).alias("host"),
                F.sha2(F.concat(F.lit(rnd), F.col("id")), 256).alias("url_hash"),
                F.lit(rnd).cast("int").alias("fetched_round"),
                F.lit(200).cast("int").alias("status_code"),
            )
        )
        kw = {"row_hints": {"fetch_log": rows_per_round}}
        if rnd == 0:
            store.commit_round(rnd, {"fetch_log": df}, **kw)
        else:
            store.commit_round(rnd, {}, delta_tables={"fetch_log": df}, **kw)

    lo, hi = n_rounds - 4, n_rounds - 1
    pred = [("fetched_round", ">=", lo), ("fetched_round", "<=", hi)]
    flt = F.col("fetched_round").between(lo, hi)

    def run_pruned() -> int:
        return store.read(spark, "fetch_log", prune=pred).filter(flt).count()

    def run_full() -> int:
        return store.read(spark, "fetch_log").filter(flt).count()

    walls: dict[str, list[float]] = {"pruned": [], "full": []}
    counts = set()
    for _ in range(2):  # interleaved min-of-2 (co-tenant noise method)
        for name, fn in (("pruned", run_pruned), ("full", run_full)):
            t0 = time.monotonic()
            counts.add(fn())
            walls[name].append(time.monotonic() - t0)
    assert len(counts) == 1, f"mode results diverge: {counts}"

    io = store.prune_stats("fetch_log", pred)
    print(json.dumps({
        "metric": "fetch_log 4-round range scan on an aged delta chain",
        "n_rounds": n_rounds,
        "rows_per_round": rows_per_round,
        "cpus": cpus,
        "rows_matched": counts.pop(),
        "pruned_sec": round(min(walls["pruned"]), 3),
        "full_sec": round(min(walls["full"]), 3),
        "speedup": round(min(walls["full"]) / min(walls["pruned"]), 2),
        "files_kept": io["files_kept"],
        "files_total": io["files_total"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
