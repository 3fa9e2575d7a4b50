"""Read-amplification of the merge-on-read blob chain at probe time.

Chains make per-round blob WRITES O(delta) (scripts/bench_blob_chain.py),
but a probe now ORs membership across up to REBUILD_EVERY elements — the
classic LSM/merge-on-read trade. Two facts bound the read cost:

- HIT rows resolve early (a key lives in exactly one element; once an
  element claims it, later elements are skipped for that row), so hits pay
  the cost of the element they live in, not the chain.
- MISS rows probe every element's bloom — the worst case — but each delta
  bloom is sized to its round's fresh keys (KBs at fixture scale, ~MBs in
  production), executor-cached after first touch, and the per-element
  numpy probe is vectorized over the still-unresolved subset only.

This measures the same candidate set (half seen, half fresh = worst-case
miss mix) against chain prefixes of growing length, same base store, and
prints one JSON line: wall per chain length + the marginal cost per extra
element. The compaction cadence (REBUILD_EVERY, default 8) is the knob the
numbers justify.

Usage: python scripts/bench_chain_probe.py [n_base] [n_delta] [n_cands] [cpus]
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
    probe_seen_files,
    update_seen_shards,
)
from crawler_spark.session import get_spark

MAX_CHAIN = 16
N_SHARDS = 64


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_cands = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    spark = get_spark("bench_chain_probe", cpus=cpus, shuffle_partitions=64)

    def synth(lo, hi):
        return spark.range(lo, hi, 1, 64).select(
            F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"),
                     F.lit(".go.id")).alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        )

    root = tempfile.mkdtemp(prefix="chain_probe_")
    dirs = []
    t0 = time.time()
    update_seen_shards(
        synth(0, n_base), blob_dir=None, n_shards=N_SHARDS,
        out_dir=os.path.join(root, "base"), with_exact=True,
    ).collect()
    dirs.append(os.path.join(root, "base"))
    t_base = time.time() - t0
    t0 = time.time()
    for i in range(MAX_CHAIN - 1):
        lo = n_base + i * n_delta
        d = os.path.join(root, f"delta-{i}")
        update_seen_shards(
            synth(lo, lo + n_delta), blob_dir=None, n_shards=N_SHARDS,
            out_dir=d, with_exact=True, delta_build=True,
        ).collect()
        dirs.append(d)
    t_deltas = time.time() - t0

    # candidates: half misses (beyond every element), half hits spread
    # uniformly over the full key range (base + deltas) so early-resolve
    # depth mirrors a real crawl's mostly-old-keys mix
    total_keys = n_base + (MAX_CHAIN - 1) * n_delta
    hits = (
        spark.range(0, n_cands // 2, 1, 64)
        .select(((F.col("id") * 2_654_435_761) % total_keys).alias("id"))
    )
    misses = spark.range(total_keys, total_keys + n_cands // 2, 1, 64)
    cands = hits.unionByName(misses).select(
        F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"),
                 F.lit(".go.id")).alias("host"),
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
    )

    walls = {}
    for k in (1, 2, 4, 8, MAX_CHAIN):
        best = None
        for _ in range(2):
            t0 = time.time()
            probe_seen_files(
                cands, dirs[:k], n_shards=N_SHARDS, exact=True
            ).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        walls[k] = round(best, 2)
    marginal_ms = (walls[MAX_CHAIN] - walls[1]) / (MAX_CHAIN - 1) * 1000
    print(json.dumps({
        "n_base": n_base, "n_delta": n_delta, "n_cands": n_cands,
        "cpus": cpus, "n_shards": N_SHARDS,
        "base_build_s": round(t_base, 2),
        "delta_builds_s": round(t_deltas, 2),
        "probe_wall_s_by_chain_len": walls,
        "marginal_s_per_element": round(marginal_ms / 1000, 3),
        "read_amp_16_over_1": round(walls[MAX_CHAIN] / walls[1], 2),
        "cands_per_s_chain16": int(n_cands / walls[MAX_CHAIN]),
    }))


if __name__ == "__main__":
    main()
