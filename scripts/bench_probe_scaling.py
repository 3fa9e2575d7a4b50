"""Probe cost vs standing-layer size: is the seen probe flat in |seen|?

The r03 seen-probe A/B ran at |seen|/|candidates| = 10:1; production is
>= 10^4:1. The claim to verify: per-candidate probe cost is O(log |seen|)
(bloom probe + searchsorted on the shard's exact pair file), i.e. ~FLAT as
the standing layer grows by orders of magnitude — it was asserted from the
algorithm, never measured. This builds filter layers at growing key counts
(default 10^5 .. 10^8; cap with --max-keys if disk-bound), probes the SAME
fixed candidate set (half members, half misses) against each, and reports
microseconds per candidate per layer size.

Usage: python scripts/bench_probe_scaling.py [--max-keys 100000000]
       [--candidates 1000000] [--cpus 16]
Prints one JSON line per layer size plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.operators.seenset import probe_seen_files, update_seen_shards
from crawler_spark.session import get_spark

N_SHARDS = 64


def _keys(spark, lo: int, hi: int, n_parts: int):
    """Deterministic (host, url_hash) rows for key ids [lo, hi)."""
    return spark.range(lo, hi, 1, n_parts).select(
        F.concat(
            F.lit("h"), (F.col("id") % 1000).cast("string"), F.lit(".go.id")
        ).alias("host"),
        F.sha2(F.concat(F.lit("key-"), F.col("id").cast("string")), 256).alias(
            "url_hash"
        ),
    )


def main() -> None:
    def arg(name: str, default: int) -> int:
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    max_keys = arg("--max-keys", 100_000_000)
    n_cands = arg("--candidates", 1_000_000)
    cpus = arg("--cpus", 16)
    sizes = [s for s in (10**5, 10**6, 10**7, 10**8) if s <= max_keys]
    spark = get_spark("bench-probe-scaling", cpus=cpus, shuffle_partitions=N_SHARDS)

    # fixed candidates: half members (ids scattered over [0, size) at probe
    # time via modulo), half misses (ids >= any layer size)
    half = n_cands // 2
    root = tempfile.mkdtemp(prefix="probe_scaling_")
    results = []
    try:
        for size in sizes:
            out_dir = os.path.join(root, f"layer-{size}")
            t0 = time.time()
            update_seen_shards(
                _keys(spark, 0, size, max(cpus * 4, 16)), blob_dir=None,
                n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                with_cuckoo=False,
            ).collect()
            build_s = time.time() - t0
            layer_bytes = sum(
                os.path.getsize(os.path.join(out_dir, f))
                for f in os.listdir(out_dir)
            )
            members = spark.range(0, half, 1, cpus).select(
                (F.col("id") * 2654435761 % size).alias("kid")
            )
            misses = spark.range(0, n_cands - half, 1, cpus).select(
                (F.lit(10**9) + F.col("id")).alias("kid")
            )
            cands = members.unionByName(misses).select(
                F.concat(
                    F.lit("h"), (F.col("kid") % 1000).cast("string"),
                    F.lit(".go.id"),
                ).alias("host"),
                F.sha2(
                    F.concat(F.lit("key-"), F.col("kid").cast("string")), 256
                ).alias("url_hash"),
            )
            best = None
            n_hits = None
            for _ in range(2):
                t0 = time.time()
                n_hits = (
                    probe_seen_files(
                        cands, out_dir, n_shards=N_SHARDS, layer="bloom",
                        exact=True,
                    )
                    .filter(F.col("maybe_seen"))
                    .count()
                )
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            # every member id is < size, so all `half` member rows must hit
            # (modulo collisions dedup to fewer distinct ids — count those)
            res = {
                "layer_keys": size,
                "layer_bytes": layer_bytes,
                "build_sec": round(build_s, 1),
                "candidates": n_cands,
                "probe_wall_sec": round(best, 3),
                "us_per_candidate": round(best / n_cands * 1e6, 3),
                "hits": n_hits,
            }
            print(json.dumps(res), flush=True)
            results.append(res)
            shutil.rmtree(out_dir)  # reclaim before the next (bigger) layer
        if len(results) >= 2:
            first, last = results[0], results[-1]
            print(json.dumps({
                "summary": "probe flatness vs layer size",
                "size_ratio": last["layer_keys"] // first["layer_keys"],
                "cost_ratio": round(
                    last["us_per_candidate"] / first["us_per_candidate"], 3
                ),
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
