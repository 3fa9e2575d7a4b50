"""Plan-shape gates: pushdown, pruning, broadcast, shuffle counts.

These pin the physical properties that matter at 100 TB; a regression here
is a cluster incident even when results stay correct.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.audit import (
    count_occurrences,
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_id") > 500)
        .filter(F.col("event_type") == "view")
        .select("event_id", "ts")
    )
    pf = " ".join(pushed_filters(df))
    assert "event_id" in pf and "event_type" in pf, pf


def test_column_pruning_two_column_projection(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    cols = read_schema_columns(df)
    assert cols == {"event_id", "user_id"}, cols


def test_budget_selection_broadcasts_dim_and_single_shuffle(spark, docs):
    from crawler_spark.operators.frontier import per_host_budget_selection

    frontier = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string")).alias("host"),
        F.col("doc_id").alias("priority_score"),
        F.sha2(F.col("text"), 256).alias("url_hash"),
    )
    budgets = spark.createDataFrame(
        [(f"h{i}", 5) for i in range(20)], "host string, budget long"
    )
    sel = per_host_budget_selection(frontier, budgets, tiebreak="url_hash")
    assert has_broadcast_join(sel)
    # one hash shuffle for the window on host; the broadcast join adds none
    assert count_shuffles(sel) == 1


def test_window_dedup_is_single_shuffle(spark, docs):
    from crawler_spark.operators.dedup import first_by_order

    df = docs.select(F.sha2(F.col("text"), 256).alias("k"), "doc_id")
    assert count_shuffles(first_by_order(df, "k", ["doc_id"])) == 1


def test_exact_dup_marking_reuses_partitioning(spark, docs):
    """The canonical-election window and the duplicate-marking both partition
    by content hash — must cost ONE shuffle, not two."""
    from crawler_spark.operators.dedup import mark_exact_duplicates

    pages = docs.select(
        F.col("doc_id").alias("page_id"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.col("doc_id").alias("crawled_at"),
    )
    assert count_shuffles(mark_exact_duplicates(pages)) == 1


def test_simhash_banded_join_shuffle_budget(spark, docs):
    from crawler_spark.operators.dedup import simhash_near_dup_join

    df = docs.select(
        F.col("doc_id").alias("id"),
        F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("fp"),
    )
    plan = simhash_near_dup_join(df, id_col="id", fp_col="fp")
    # self-equi-join on (band_idx, band): 2 shuffles for the join sides
    # + 1 for the pair dedup — NOT a cartesian product
    from crawler_spark.plans.audit import count_occurrences

    assert count_occurrences(plan, "CartesianProduct") == 0
    assert count_shuffles(plan) <= 3


def test_simhash_incremental_probe_no_cartesian(spark, docs):
    """The delta probe must stay an equi-join on (band_idx, band) — the
    corpus side is only ever touched through its band index, never crossed."""
    from crawler_spark.operators.dedup import simhash_incremental_near_dup

    fp = (
        F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10)
        .cast("long")
    )
    corpus = docs.select(F.col("doc_id").alias("id"), fp.alias("fp"))
    delta = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"), fp.bitwiseXOR(F.lit(1)).alias("fp")
    )
    plan = simhash_incremental_near_dup(corpus, delta, id_col="id", fp_col="fp")
    from crawler_spark.plans.audit import count_occurrences

    assert count_occurrences(plan, "CartesianProduct") == 0
    # probe join (2 sides) + within-delta join reuses the delta exchange
    # + pair dedup: bounded, never O(|corpus|^2)
    assert count_shuffles(plan) <= 6


def test_expressions_stay_in_codegen(spark, docs):
    from crawler_spark.functions.text import quality_score_col, token_count_ws_col

    df = docs.select(
        token_count_ws_col(F.col("text")).alias("a"),
        quality_score_col(F.col("text")).alias("b"),
    )
    assert whole_stage_codegen_spans(df) >= 1
    # and no python UDF in this plan
    from crawler_spark.plans.audit import formatted_plan

    assert "BatchEvalPython" not in formatted_plan(df)
    assert "ArrowEvalPython" not in formatted_plan(df)


def test_seen_antijoin_no_extra_exchange_on_probe_side(spark, docs):
    from crawler_spark.operators.dedup import seen_anti_join

    cand = docs.select(F.sha2(F.col("text"), 256).alias("url_hash"), "doc_id")
    seen = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.sha2(F.col("text"), 256).alias("url_hash")
    )
    plan = seen_anti_join(cand, seen)
    # anti-join compiles to broadcast (small side) or sorted shuffle join;
    # either way no cartesian and bounded shuffles
    from crawler_spark.plans.audit import count_occurrences

    assert count_occurrences(plan, "CartesianProduct") == 0
    assert count_shuffles(plan) <= 3


def test_merge_latest_wins_single_shuffle(spark, docs):
    from crawler_spark.operators.merge import merge_latest_wins

    existing = docs.select("doc_id", F.lit("v1").alias("title"),
                           F.lit(1).alias("rnd"))
    incoming = docs.filter(F.col("doc_id") < 50).select(
        "doc_id", F.lit("v2").alias("title"), F.lit(2).alias("rnd")
    )
    plan = merge_latest_wins(existing, incoming, keys=["doc_id"], order_col="rnd")
    assert count_shuffles(plan) == 1, "MERGE must be one hash shuffle on the key"


def test_probe_seen_files_single_shuffle_no_cartesian(spark, docs, tmp_path):
    from crawler_spark.operators.seenset import probe_seen_files, update_seen_shards

    seen = docs.select(F.lit("h.go.id").alias("host"),
                       F.sha2(F.col("doc_id").cast("string"), 256).alias("url_hash"))
    d = str(tmp_path / "blobs")
    update_seen_shards(seen, blob_dir=None, n_shards=4, out_dir=d).collect()
    plan = probe_seen_files(seen, d, n_shards=4)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(plan) == 1, "probe = one repartition on shard"
    assert "Cartesian" not in s


def test_selector_udf_pipelines_with_scan(spark, docs):
    from crawler_spark.functions.selector_udfs import extract_with_selectors

    df = docs.select("doc_id", F.concat(F.lit("<h1>"), F.col("doc_id").cast("string"),
                                        F.lit("</h1>")).alias("html"))
    plan = extract_with_selectors(df, "html", {"t": "h1"})
    assert count_shuffles(plan) == 0, "selector extraction is a pure map"


def test_crawl_executor_no_cartesian_product(spark):
    from crawler_spark.queries_crawl import q_crawl_executor

    plan = q_crawl_executor(spark, SF)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s


@pytest.mark.parametrize("qname,max_exchanges", [
    ("api_executor", 1), ("http_executor", 1), ("config_merge", 1),
    ("data_attr_extract", 1),
    # three config variants = three fixture re-reads, each with its own
    # round-robin spread; the union itself adds no exchange
    ("browser_executor", 3),
])
def test_request_and_kernel_batch_maps_are_shuffle_free(spark, qname,
                                                        max_exchanges):
    """The step-executor batch maps and the kernel-replay queries are pure
    per-row maps: no hash/range exchange anywhere (at 10^10 URLs a keyed
    shuffle here would be the bottleneck). The only allowed exchanges are the
    fixture reader's round-robin repartitions that spread the single
    test-parquet file across cores — data-independent, not key shuffles."""
    import __spark_entry__ as entrymod

    plan = entrymod.queries()[qname](spark, SF)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(plan) <= max_exchanges, qname
    assert "hashpartitioning" not in s.lower(), qname
    assert "rangepartitioning" not in s.lower(), qname
    assert "CartesianProduct" not in s


def test_admin_stats_plan_shapes(spark):
    """Reporting surface: the 25-row website dim must arrive by broadcast
    (never shuffle a fact table against it), the level/category pivots are
    single map-side-combinable aggregations, and the config-history window +
    rollup reuse ONE hash partitioning on website_id."""
    from crawler_spark import queries_admin as qa

    ws = qa.q_website_statistics(spark, SF)
    s = ws._jdf.queryExecution().executedPlan().toString()
    assert has_broadcast_join(ws)
    assert "CartesianProduct" not in s

    for q in (qa.q_log_level_stats, qa.q_dlq_stats_category):
        plan = q(spark, SF)
        s = plan._jdf.queryExecution().executedPlan().toString()
        # 1 round-robin spread of the single test file + 1 hash exchange
        assert count_shuffles(plan) <= 2, q.__name__
        assert s.lower().count("hashpartitioning") <= 1, q.__name__

    hist = qa.q_config_history_versions(spark, SF)
    s = hist._jdf.queryExecution().executedPlan().toString()
    assert s.lower().count("hashpartitioning(website_id") <= 1, s


def test_retry_failure_rates_window_then_single_agg(spark):
    """The windowed failure-rate analytics must be ONE aggregation over the
    time-filtered scan (plus the distinct-job expansion Spark plans as a
    two-phase agg on the same partitioning) — no join against the window
    bounds (they're literals by the time the main plan builds) and no
    cartesian. At scale the attempted_ms predicate is the partition pruner."""
    from crawler_spark import queries_admin as qa

    df = qa.q_retry_failure_rates(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s
    assert "Join" not in s, s[:1200]  # window bounds folded to literals
    # 1 round-robin spread of the single test file + count_distinct's
    # two-phase agg exchanges on error_category
    assert count_shuffles(df) <= 3


def test_log_trace_scan_no_join_single_filter(spark):
    """Trace lookup = filter + sort, nothing else: no join, no cartesian,
    and exactly one exchange besides the input spread (the ORDER BY's range
    partitioning — trace cardinality is tens of rows, so it's nominal)."""
    from crawler_spark import queries_admin as qa

    df = qa.q_log_trace_scan(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s
    assert "CartesianProduct" not in s
    assert count_shuffles(df) <= 2


def test_metrics_export_single_fact_scan(spark):
    """The Prometheus-scrape query derives SEVEN metric families but must
    scan the fact table exactly once (pre-aggregate -> explode -> fold);
    a union-of-rollups regression re-scans per family, which at 100 TB is
    seven full passes over fetch_log instead of one."""
    from crawler_spark import queries_admin as qa

    df = qa.q_metrics_export(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert s.count("Scan parquet") == 1, s[:1500]
    # one spread + cube shuffle + label-cardinality fold
    assert count_shuffles(df) <= 3
    assert "CartesianProduct" not in s


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set (an eval suite — tiny vs the corpus) must
    reach the corpus explode as a BROADCAST; a shuffled join here would move
    the full exploded corpus (shingles x docs) through an exchange at 100 TB.
    Shuffle budget: 2 fixture spreads + the bench distinct + the per-doc
    overlap agg."""
    from crawler_spark.queries_content import q_decontaminate

    df = q_decontaminate(spark, SF)
    from crawler_spark.plans.audit import count_occurrences

    assert has_broadcast_join(df)
    assert count_occurrences(df, "CartesianProduct") == 0
    assert count_shuffles(df) <= 4


def test_gopher_quality_shuffles_on_doc_id_only(spark):
    """Repetition stats: explode -> (doc_id, bigram) agg -> (doc_id) agg ->
    join back on doc_id. Every exchange hashes on doc_id(+bigram) — one
    output row per doc, so no skew — and there is no cartesian."""
    from crawler_spark.queries_content import q_gopher_quality

    df = q_gopher_quality(spark, SF)
    from crawler_spark.plans.audit import count_occurrences

    assert count_occurrences(df, "CartesianProduct") == 0
    assert count_shuffles(df) <= 5


def test_stratified_split_is_map_only(spark):
    """Split + sample assignment are pure hash functions of the row key:
    the plan must stay MAP-ONLY — the only allowed exchange is the fixture
    loader's explicit single-file spread (at production the multi-file scan
    provides parallelism and even that disappears)."""
    from crawler_spark.queries_content import q_stratified_split

    df = q_stratified_split(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s
    assert count_shuffles(df) <= 1


def test_curation_pipeline_no_cartesian_bounded_shuffles(spark):
    """The materialization composes four curation stages; every join keys on
    doc_id (one row per doc on each side — no fan-out, no skew) and the only
    corpus-wide aggregation is the canonical election on content hash."""
    from crawler_spark.queries_content import q_curation_pipeline

    df = q_curation_pipeline(spark, SF)
    from crawler_spark.plans.audit import count_occurrences

    assert count_occurrences(df, "CartesianProduct") == 0
    assert count_shuffles(df) <= 12


def test_line_dedup_broadcasts_boilerplate_no_second_explode_shuffle(spark):
    """Repeated-line removal: the line -> distinct-doc-count aggregation is
    the only corpus-wide exchange family; the boilerplate set reaches the
    reconstruction as a one-row BROADCAST feeding a map-side array filter —
    the corpus is never re-exploded or re-shuffled to rebuild documents.
    Budget: 2 fixture spreads (two branches of the same scan) + 2 for the
    distinct-count + 1 single-partition collect of the tiny boilerplate
    list."""
    from crawler_spark.queries_content import q_line_dedup

    df = q_line_dedup(spark, SF)
    from crawler_spark.plans.audit import count_occurrences

    assert has_broadcast_join(df)
    assert count_occurrences(df, "CartesianProduct") == 0
    assert count_shuffles(df) <= 5


def test_pii_scrub_is_map_only(spark):
    """PII counting + redaction are pure per-row regex transforms: the plan
    must stay MAP-ONLY (the single allowed exchange is the fixture loader's
    explicit spread, which disappears under a real multi-file scan)."""
    from crawler_spark.queries_content import q_pii_scrub

    df = q_pii_scrub(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s
    assert count_shuffles(df) <= 1


def test_line_dedup_incremental_broadcasts_updated_index(spark):
    """Incremental index maintenance: standing-count + delta-count merge by
    SUM (map-side combinable), the updated above-threshold set broadcasts
    to the delta docs' map-side strip — same reconstruction contract as the
    batch query, one extra count aggregation, no cartesian."""
    from crawler_spark.queries_content import q_line_dedup_incremental

    df = q_line_dedup_incremental(spark, SF)
    from crawler_spark.plans.audit import count_occurrences

    assert has_broadcast_join(df)
    assert count_occurrences(df, "CartesianProduct") == 0
    assert count_shuffles(df) <= 8


def test_jsonld_extract_is_map_only(spark):
    """JSON-LD extraction is a pure map stage: the fixture build + pandas
    UDF + explode must compile to ZERO exchanges (span_extract's cost
    class — embarrassingly parallel over pages)."""
    from crawler_spark.queries_content import q_jsonld_extract

    df = q_jsonld_extract(spark, SF)
    # the one Exchange is _docs' deliberate scan-spreading repartition
    assert count_shuffles(df) <= 1, formatted_plan(df)[:1500]


def test_multimodal_resample_is_map_only(spark):
    """Encode -> decode -> box-resample never shuffles: payloads and pixel
    planes stay inside the task."""
    from crawler_spark.queries_content import q_multimodal_resample

    df = q_multimodal_resample(spark, SF)
    assert count_shuffles(df) <= 1, formatted_plan(df)[:1500]


def test_multimodal_video_meta_is_map_only(spark):
    from crawler_spark.queries_content import q_multimodal_video_meta

    df = q_multimodal_video_meta(spark, SF)
    assert count_shuffles(df) <= 1, formatted_plan(df)[:1500]


def test_substring_dedup_shuffle_budget(spark):
    """The window-dedup pass: one hash-count aggregation (map-side
    combinable), one co-partitioned join-back, one per-doc rollup, one
    zero-window left join — the Exchange count must stay within that
    budget (an accidental repartition or a non-combinable agg breaks it),
    and the count aggregation must be partial (map-side combine)."""
    from crawler_spark.queries_content import q_substring_dedup

    df = q_substring_dedup(spark, SF)
    n = count_shuffles(df)
    # +1 for _docs' scan-spreading repartition
    assert n <= 6, f"{n} exchanges: {formatted_plan(df)[:2000]}"
    assert count_occurrences(df, r"partial_count") > 0, (
        "hash-count aggregation lost its map-side combine"
    )
