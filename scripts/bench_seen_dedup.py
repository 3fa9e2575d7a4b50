"""A/B the seen-dedup pipeline: exact anti-join vs shard-local exact files.

The r03-final change makes the probe task the exact arbiter, deleting the
per-round anti-join whose shuffle volume scales with |seen|. This measures
both modes on the same synthetic corpus (default 5M-key seen table, 500k
candidates at ~50% dup rate, 64 shards) and prints one JSON line with
min-of-2 walls per mode. The absolute ratio grows with |seen|/|candidates|
— the production regime is 10^10/10^6, far steeper than what fits here.

Usage: python scripts/bench_seen_dedup.py [n_seen] [n_cands] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.operators.seenset import (
    seen_filter_pipeline_files,
    update_seen_shards,
)
from crawler_spark.session import get_spark


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_cands = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_shards = 64
    spark = get_spark("bench_seen_dedup", cpus=cpus, shuffle_partitions=64)

    def synth(n, start=0):
        return spark.range(start, start + n, 1, 64).select(
            F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"),
                     F.lit(".go.id")).alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        )

    seen = synth(n_seen)
    # candidates: half dups (ids inside the seen range), half fresh
    cands = synth(n_cands, start=n_seen - n_cands // 2)

    blob_dir = os.path.join(tempfile.mkdtemp(prefix="seen_ab_"), "blobs")
    t0 = time.time()
    update_seen_shards(
        seen, blob_dir=None, n_shards=n_shards, out_dir=blob_dir, with_exact=True
    ).collect()
    t_build = time.time() - t0

    walls = {}
    for mode, kw in (("anti_join", {}), ("exact_files", {"exact_files": True})):
        best = None
        for _ in range(2):
            t0 = time.time()
            out = seen_filter_pipeline_files(
                cands, seen, blob_dir, n_shards=n_shards, seen_unique=True, **kw
            )
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        walls[mode] = round(best, 2)
    n_fresh = seen_filter_pipeline_files(
        cands, seen, blob_dir, n_shards=n_shards, seen_unique=True,
        exact_files=True,
    ).count()
    assert n_fresh == n_cands // 2, n_fresh  # both modes agree by gate; sanity
    print(json.dumps({
        "n_seen": n_seen, "n_cands": n_cands, "cpus": cpus,
        "shard_build_s": round(t_build, 2),
        "wall_s": walls,
        "speedup_exact_files": round(walls["anti_join"] / walls["exact_files"], 2),
        "n_fresh": n_fresh,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
