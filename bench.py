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
    "ann_ivf_topk",
    "text_profile",
    "doc_fingerprint",
    "span_extract",
    "multimodal_decode",
    # r02 additions
    "selector_extract",
    "xpath_extract",
    "content_normalize",
    "page_upsert",
    "scrape_batch",
    "error_classify",
    "backoff_jitter",
    "crawl_executor",
    # r03 additions
    "duplicate_groups_provenance",
    "multimodal_decode_bmp",
    "multimodal_decode_wav",
    "retry_history",
    "seed_outcomes",
    "duplicate_components",
    "api_executor",
    "http_executor",
    "ann_ivf_train",
    "request_retry",
    "website_statistics",
    "simhash_incremental",
    "minhash_incremental",
    "seen_probe_exact",
    # r03 late additions
    "depth_priority_frontier",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "metrics_export",
    # r03 curation ops
    "decontaminate",
    "gopher_quality",
    "stratified_split",
    "curation_pipeline",
    "line_dedup",
    "line_dedup_incremental",
    "pii_scrub",
    # r03 frontier-hygiene ops
    "crawl_traps",
    "host_circuit_breaker",
    "sitemap_expand",
    "conditional_recrawl",
    # r03-final: real PNG codec, registrable-domain politeness grouping,
    # adaptive re-crawl scheduling
    "multimodal_decode_png",
    "multimodal_decode_gif",
    "warc_ingest",
    "politeness_domain_group",
    "recrawl_schedule",
    # r04 additions: real baseline JFIF codec
    "multimodal_decode_jpg",
    # r05 additions: real box resample, MP4 metadata, JSON-LD extraction
    "multimodal_resample",
    "multimodal_video_meta",
    "jsonld_extract",
    "multimodal_audio_meta",
    # substring_dedup(+incremental) are registry+oracle entries but NOT
    # headline: the window explode is ~9 s at sf0.1 by construction (the
    # full Lee-et-al pass is a batch curation job, not a per-round query)
]


def run_bench(cpus: int, sf_dir: str, names: list[str] | None = None) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    spark = get_spark(f"bench_{cpus}", cpus=cpus)
    queries = entrymod.queries()
    names = names or [n for n in HEADLINE if n in queries]

    # JVM/codegen + python-worker-pool warm-up (not timed): forking the
    # per-core Arrow UDF workers costs ~5 s once per session and would
    # otherwise be billed entirely to the first UDF query
    from pyspark.sql import functions as F

    from crawler_spark.functions.url_udfs import normalize_url_udf

    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(0, 20000, 1, cpus).select(
        normalize_url_udf(F.concat(F.lit("https://w.go.id/p?a="), F.col("id").cast("string")))
    ).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        # min of 2 executions: the sandbox is co-tenant-noisy (steal time),
        # single-shot timings vary up to 3x — min is the standard shared-host
        # de-noising and still includes all real work (nothing is cached
        # between runs; noop sink, no persist)
        best = None
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        per_query[name] = round(best, 3)
        rows[name] = df.count()
    spark.stop()
    total = round(sum(per_query.values()), 3)
    out_rows = sum(rows.values())
    return {
        "metric": "headline crawl+dedup+similarity query suite wall time",
        "value": total,
        "unit": "sec",
        "timing": "min of 2 runs per query (noop sink, no caching)",
        "queries": per_query,
        "sf": sf_dir,
        "cpus": cpus,
        "rows_out": out_rows,
        "throughput_rows_per_s": round(out_rows / total, 1) if total else None,
    }


def run_scaling_workload(cpus: int, n_urls: int, mode: str = "round") -> dict:
    """North-rule metric at one parallelism level.

    mode="parse": URLs normalized+hashed/sec — the map-only hot path
    (vectorized pandas-UDF canonicalization + JVM sha256), zero shuffles.
    This is the stage that dominates a real crawl round and the cleanest
    core-scaling signal.

    mode="round": the full frontier round — normalize+hash, then within-batch
    first-wins dedup + seen exclusion folded into ONE map-side-combinable
    aggregation (the r02 production plan: the UDF evaluates once and the
    anti-join shuffle disappears), then per-host priority rank + budget
    (two shuffles + one sort on top of the parse stage; r01 ran three
    shuffles + two sorts and re-ran the UDF for the seen side).

    Both parallelism levels run the IDENTICAL plan: fixed 128 partitions
    (generated directly by range(numPartitions) — no repartition shuffle),
    AQE coalescing off (it would shrink post-shuffle stages to ~12 partitions
    at this data size, capping both configs at the same parallelism).
    """
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.functions.url_udfs import normalize_url_udf, url_hash
    from crawler_spark.session import get_spark

    n_parts = 128
    spark = get_spark(
        f"scaling_{cpus}", cpus=cpus, shuffle_partitions=n_parts,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    base = spark.range(0, n_urls, 1, n_parts).select(
        F.col("id"),
        F.concat(
            F.lit("HTTPS://Portal"), (F.col("id") % 2000).cast("string"),
            F.lit(".GO.ID/putusan/"), (F.col("id") % 500000).cast("string"),
            F.lit("?utm_source=feed&ref=x&page="), (F.col("id") % 9 + 1).cast("string"),
            F.lit("&b="), (F.col("id") % 13).cast("string"), F.lit("&a=1#frag"),
        ).alias("url"),
        F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"), F.lit(".go.id")).alias("host"),
        (F.col("id") % 11).cast("int").alias("priority"),
    )
    if mode not in ("span", "curation"):
        # warm-up (codegen + python worker pool), not timed. span has its own
        # parse warm-up below; curation is all-JVM codegen with a noop
        # warm-up of its own plan — running the pandas-UDF pool spin-up for
        # those modes is pure wasted wall-clock.
        base.withColumn("n", normalize_url_udf(F.col("url"))).limit(50000).count()

    if mode == "span":
        # interleaved-payload parse stage (the north rule's span-sequence
        # half): synthetic page -> full parse_page_udf (DOM walk + C2
        # normalize + sha + simhash) -> span count. Map-only like "parse"
        # but Python-kernel-bound (~ms/page), so it runs at a smaller n.
        from crawler_spark.functions.parse_udfs import parse_page_udf

        pages = base.select(
            "id",
            F.concat(
                F.lit("<html><head><title>Putusan "),
                F.col("id").cast("string"),
                F.lit('</title></head><body><div class="content"><h1>Perkara '),
                F.col("id").cast("string"),
                F.lit("</h1><p>Menimbang bahwa dalam perkara nomor "),
                (F.col("id") % 997).cast("string"),
                F.lit(" telah diperiksa dan diadili dengan seksama.</p><p>"),
                F.lit("Mengingat ketentuan pasal "),
                (F.col("id") % 50).cast("string"),
                F.lit(' sebagaimana dimaksud.</p><a href="/files/'),
                F.col("id").cast("string"),
                F.lit('.pdf" class="download">Salinan PDF</a><img src="/img/'),
                (F.col("id") % 100).cast("string"),
                F.lit('.jpg"></div></body></html>'),
            ).alias("html"),
        )
        pages.limit(2000).select(parse_page_udf("html")).write.format(
            "noop"
        ).mode("overwrite").save()  # warm-up, not timed
        t0 = time.time()
        pages.select(
            "id", F.size(parse_page_udf(F.col("html")).getField("spans")).alias("n")
        ).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.stop()
        return {
            "cpus": cpus, "n_urls": n_urls, "wall_sec": round(wall, 2),
            "urls_per_sec": round(n_urls / wall, 1),
        }

    if mode == "curation":
        # training-data curation stage (the decontaminate shape): shingle ->
        # 60-bit hash -> broadcast eval-set overlap -> per-doc combinable
        # agg. All-JVM codegen (split / transform / md5 / array lambdas) —
        # a third stage class next to the pandas-UDF-bound parse and the
        # exchange-bound probe.
        from crawler_spark.functions.text import (
            md5_60bit_col as _h,
            word_shingles_col,
        )

        vocab = F.array(*[F.lit(f"kata{i}") for i in range(30)])
        docs = spark.range(0, n_urls, 1, n_parts).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.element_at(
                        vocab, ((F.col("id") * 7 + i * i) % 30 + 1).cast("int")
                    ),
                ),
            ).alias("text"),
        )
        sh = docs.select(
            "doc_id", word_shingles_col(F.col("text"), 4).alias("sh")
        )

        bench = (
            sh.filter(F.col("doc_id") % 97 == 0)
            .select(F.explode("sh").alias("s"))
            .select(_h(F.col("s")).alias("sh_h"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        corpus = (
            sh.filter(F.col("doc_id") % 97 != 0)
            .select(
                "doc_id",
                F.size("sh").alias("n_shingles"),
                F.explode_outer("sh").alias("s"),
            )
            .select("doc_id", "n_shingles", _h(F.col("s")).alias("sh_h"))
        )
        overlap = (
            corpus.join(F.broadcast(bench), "sh_h", "left")
            .groupBy("doc_id", "n_shingles")
            .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        )
        # warm-up (codegen compile + broadcast build), not timed
        overlap.limit(2000).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        overlap.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.stop()
        return {
            "cpus": cpus, "n_urls": n_urls, "wall_sec": round(wall, 2),
            "urls_per_sec": round(n_urls / wall, 1),
        }

    if mode == "ttlround":
        # the FULL TTL-mode engine round loop (r05 ask: scaling evidence
        # with TTL merge-on-read seen/pages, the expiry floor, staggered
        # compaction, and the file-level pages fold all ON). Fixture web,
        # fixed round count; throughput = fetched pages/s over the loop.
        # Caveat recorded with the number: a superstep round carries ~20
        # fixed driver actions (commit, manifest, metrics) that do not
        # shrink with cores, so this row UNDERSTATES plan scalability at
        # fixture scale — read it as "no regression", not as the ceiling.
        import tempfile

        from crawler_spark.engine.corpus import (
            CorpusSpec, build_corpus, robots_map, seed_urls,
        )
        from crawler_spark.engine.superstep import CrawlEngine

        spec = CorpusSpec(
            n_hosts=64, listing_pages=8, details_per_page=8,
            hosts_with_robots=8,
        )
        n_rounds = 8
        with tempfile.TemporaryDirectory() as root:
            eng = CrawlEngine(
                spark, root, build_corpus(spec), robots_map(spec),
                per_host_budget=4, ttl_rounds=3,
            )
            eng.init_frontier(seed_urls(spec))
            for rnd in (0, 1):  # warm-up rounds (codegen + worker pool)
                eng.run_round(rnd)
            t0 = time.time()
            fetched = 0
            for rnd in range(2, 2 + n_rounds):
                m = eng.run_round(rnd)
                fetched += m.get("n_fetched", 0) or 0
            wall = time.time() - t0
        spark.stop()
        return {
            "cpus": cpus, "n_urls": fetched, "wall_sec": round(wall, 2),
            "urls_per_sec": round(fetched / wall, 1),
            "note": "8 TTL rounds, fixed driver overhead included",
        }

    if mode == "probe":
        # the r03-final dedup arbiter at two parallelism levels: candidates
        # repartition on shard, each task probes its shard's bloom + exact
        # pair file (executor-cached) — zero corpus-side exchange. Shard
        # files are built once OUTSIDE the timed region (they are the
        # standing state a round inherits, not per-round work).
        import tempfile

        from crawler_spark.operators.seenset import (
            seen_filter_pipeline_files,
            update_seen_shards,
        )

        n_seen = n_urls
        seen = spark.range(0, n_seen, 1, n_parts).select(
            F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"),
                     F.lit(".go.id")).alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        )
        blob_dir = os.environ.get("SPARK_GRAFT_PROBE_BLOBS")
        if not blob_dir or not os.path.isdir(blob_dir):
            blob_dir = tempfile.mkdtemp(prefix="probe_blobs_")
            update_seen_shards(
                seen, blob_dir=None, n_shards=64, out_dir=blob_dir,
                with_exact=True,
            ).collect()
            os.environ["SPARK_GRAFT_PROBE_BLOBS"] = blob_dir
        cands = spark.range(n_seen // 2, n_seen // 2 + n_seen, 1, n_parts).select(
            F.concat(F.lit("portal"), (F.col("id") % 2000).cast("string"),
                     F.lit(".go.id")).alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        )  # 50% dups
        t0 = time.time()
        seen_filter_pipeline_files(
            cands, seen, blob_dir, n_shards=64, seen_unique=True,
            exact_files=True,
        ).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.stop()
        return {
            "cpus": cpus, "n_urls": n_urls, "wall_sec": round(wall, 2),
            "urls_per_sec": round(n_urls / wall, 1),
        }

    t0 = time.time()
    normed = base.withColumn("url_norm", normalize_url_udf(F.col("url"))).withColumn(
        "url_hash", url_hash("url_norm")
    )
    if mode == "parse":
        out = normed.select("url_hash")
    else:
        # first-wins dedup + seen exclusion in one aggregation (id % 5 == 0
        # rows simulate previously-crawled URLs, as in the engine's query).
        # As in the engine (superstep.py cands dedup), the shuffle key is
        # the 32-byte binary digest, not the 64-char hex string — measured
        # ~8% off the round wall at local[32], and 32 B/row off the wire on
        # a real cluster.
        fresh = (
            normed.groupBy(F.unhex("url_hash").alias("url_key"))
            .agg(
                F.min("id").alias("id"),
                F.max((F.col("id") % 5 == 0).cast("int")).alias("seen_flag"),
                # attributes must come from the min-id winner row (F.first is
                # an arbitrary row per group -> nondeterministic rank input)
                F.min_by("host", "id").alias("host"),
                F.min_by("priority", "id").alias("priority"),
            )
            .filter(F.col("seen_flag") == 0)
        )
        w = Window.partitionBy("host").orderBy(
            F.col("priority").desc(), F.col("url_key").asc()
        )
        out = fresh.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 500)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_urls": n_urls,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(n_urls / wall, 1),
    }


def _kernel_work(n: int) -> float:
    """Calibration work unit: the normalize kernel, no Spark (module-level
    for multiprocessing pickling)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from crawler_spark.kernels.urlnorm import normalize_url

    for i in range(n):
        normalize_url(
            f"HTTPS://Portal{i % 2000}.GO.ID/putusan/{i % 500000}"
            f"?utm_source=feed&ref=x&page={i % 9 + 1}&b={i % 13}&a=1#frag"
        )
    return 0.0


def main() -> None:
    if "--calibrate" in sys.argv or "--scaling" in sys.argv:
        # Hardware calibration: the SAME normalize kernel under plain
        # multiprocessing (zero Spark). Whatever 8->32 ratio THIS achieves is
        # the ceiling the VM allows (co-tenancy/overcommit); Spark numbers
        # are reported raw and normalized against it.
        import multiprocessing as mp

        # the N-vs-4N pair is configurable (SPARK_GRAFT_SCALE_N, default 8 ->
        # 8 vs 32): the north rule fixes the RATIO at 4x, not the absolute
        # size, and on this shared box the smaller pair (4 vs 16) saturates
        # the single memory bus less, separating plan scalability from
        # host-contention effects
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
        n_hi = 4 * n_lo
        calib = {}
        for procs in (n_lo, n_hi):
            per = 60000
            t0 = time.time()
            with mp.get_context("fork").Pool(procs) as pool:
                pool.map(_kernel_work, [per] * procs)
            calib[procs] = round(procs * per / (time.time() - t0), 1)
        cpu_ceiling = round((calib[n_hi] / calib[n_lo]) / 4.0, 3)
        if "--calibrate" in sys.argv and "--scaling" not in sys.argv:
            print(json.dumps({"raw_urls_per_sec": calib, "cpu_scaling_ceiling": cpu_ceiling}))
            return

    if "--scaling" in sys.argv:
        # north-rule scaling evidence: same job, N vs 4N cores on one input.
        # (No real cluster in this sandbox: two parallelism levels stand in
        # for the two cluster sizes, as the driver brief specifies.) The box
        # is co-tenant-noisy (nonzero steal time), so trials are interleaved
        # and the minimum wall per config is reported — min-of-k is the
        # standard de-noising for shared-host benchmarks.
        n_urls = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "8000000"))
        trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
        report: dict = {}
        n_pages = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "240000"))
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "600000"))
        for mode, label in (
            ("parse", "parse_throughput"),
            ("round", "frontier_round"),
            ("span", "span_parse_throughput"),
            ("probe", "seen_probe_dedup"),
            ("curation", "curation_decontaminate"),
            ("ttlround", "ttl_engine_round_loop"),
        ):
            best: dict[int, dict] = {}
            for _ in range(trials):
                for cpus in (n_lo, n_hi):
                    n_in = {"span": n_pages, "curation": n_docs}.get(mode, n_urls)
                    r = run_scaling_workload(cpus, n_in, mode)
                    if cpus not in best or r["wall_sec"] < best[cpus]["wall_sec"]:
                        best[cpus] = r
            speedup = best[n_lo]["wall_sec"] / best[n_hi]["wall_sec"]
            eff = speedup / 4.0
            report[label] = {
                f"local{n_lo}": best[n_lo],
                f"local{n_hi}": best[n_hi],
                "speedup_n_to_4n": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "efficiency_vs_cpu_ceiling": round(eff / cpu_ceiling, 3),
            }
        report["cpu_calibration"] = {
            "raw_urls_per_sec": calib,
            "cpu_scaling_ceiling": cpu_ceiling,
            "note": "plain multiprocessing on the same kernel; the VM's real 8->32 headroom",
        }
        print(json.dumps(report))
        return
    print(json.dumps(run_bench(CPUS, SF_DIR)))


if __name__ == "__main__":
    main()
