"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., "rows": {...}, "throughput_rows_per_s": ...}

Each query is forced end-to-end with the noop sink (no collect, no pruning of
the measured columns). Run `python bench.py --scaling` for the local[8] vs
local[32] two-parallelism scaling report (written to BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "url_normalize_hash",
    "url_seen_antijoin",
    "priority_frontier",
    "politeness_pacing",
    "retry_routing",
    "pagination_expand",
    "exact_dup_marking",
    "simhash_fingerprint",
    "simhash_near_dup",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_profile",
    "doc_fingerprint",
    "span_extract",
    "multimodal_decode",
]


def run_bench(cpus: int, sf_dir: str, names: list[str] | None = None) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    spark = get_spark(f"bench_{cpus}", cpus=cpus)
    queries = entrymod.queries()
    names = names or [n for n in HEADLINE if n in queries]

    # JVM/codegen warm-up (not timed)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    per_query: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)
        rows[name] = df.count()
    spark.stop()
    total = round(sum(per_query.values()), 3)
    out_rows = sum(rows.values())
    return {
        "metric": "headline crawl+dedup+similarity query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir,
        "cpus": cpus,
        "rows_out": out_rows,
        "throughput_rows_per_s": round(out_rows / total, 1) if total else None,
    }


def main() -> None:
    if "--scaling" in sys.argv:
        # north-rule scaling evidence: same job, N vs 4N cores
        res8 = run_bench(8, SF_DIR)
        res32 = run_bench(32, SF_DIR)
        speedup = res8["value"] / res32["value"] if res32["value"] else 0.0
        efficiency = speedup / (32 / 8)
        report = {
            "local8_sec": res8["value"],
            "local32_sec": res32["value"],
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3),
            "per_query_8": res8["queries"],
            "per_query_32": res32["queries"],
            "sf": SF_DIR,
        }
        print(json.dumps(report))
        return
    print(json.dumps(run_bench(CPUS, SF_DIR)))


if __name__ == "__main__":
    main()
