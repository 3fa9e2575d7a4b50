"""The frontier superstep loop (SURVEY.md §3.1 re-architecture, §7 M2/M3/M6).

One round == the reference's seed_url_crawler.crawl inner loop
(`seed_url_crawler.py:303-540`) turned into a declarative batch plan:

    frontier snapshot
      -> due filter (R6: not_before <= round)                 [predicate]
      -> robots filter (north rule; no reference analogue)    [pandas UDF]
      -> priority score (S1) + per-host budget (S3+S5)        [window rank]
      -> paced fetch vs fixture corpus (S5 pacing + P3 stops) [applyInPandas]
      -> parse (X1-X7, C1-C3: spans/links/sha/simhash)        [pandas UDF]
      -> link extract + absolutize + normalize (U8, U1-U3)    [UDF + exprs]
      -> within-round dedup (U5/U7) + seen-set dedup (U6:
         bloom prefilter -> exact anti-join)                  [window + join]
      -> retry routing (R1-R5: retry / dlq / drop)            [CASE exprs]
      -> snapshot commit: frontier/seen/pages/dlq + metrics   [atomic]

Scheduling invariants (shared verbatim with engine/simulator.py — the
scheduler-equivalence gate):
  * priority_score = (10 - priority) * 10^12 + scheduled_ms,
    scheduled_ms = round the URL entered the frontier (monotonic);
  * within a host+round, fetch order = ascending (priority_score, url_hash);
  * a URL enters `seen` the moment it is enqueued (reference inserts dedup
    keys at extraction time: url_extractor.py:240-279);
  * retryable failures re-enter the frontier with attempt+1 and
    not_before = round + attempt (data recirculation, R4);
  * candidates outside the crawl scope regex are dropped at extraction.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.engine.snapshots import FRONTIER_ROW_KEY, SnapshotStore
from crawler_spark.functions.frontier_exprs import classify_http_col, is_retryable_col
from crawler_spark.functions.robots_udfs import robots_eval_udfs
from crawler_spark.functions.parse_udfs import parse_page_udf
from crawler_spark.functions.url_udfs import (
    canonical_host_udf,
    normalize_url_udf,
    resolve_relative_udf,
    url_hash,
)
from crawler_spark.operators.dedup import first_by_order
from crawler_spark.operators.frontier import per_host_budget_selection
from crawler_spark.operators.seenset import (
    seen_filter_pipeline_files,
    trim_blob_chain,
    update_seen_shards,
)
from crawler_spark.sources.fetch import fetch_against_corpus

# reference score = (10 - priority) * 10^12 + time: HIGHER priority value ==
# fetched first (priority_queue.py:89-155). Listings outrank details so the
# frontier keeps expanding before drain.
PRIORITY_LISTING = 7
PRIORITY_DETAIL = 5
MAX_ATTEMPTS = 3
SCOPE_RE = r"/putusan"  # crawl scope (the reference's detail_urls selector role)
N_SHARDS = 8
REBUILD_EVERY = 8  # full shard rebuild cadence (bloom compaction)

FRONTIER_SCHEMA = (
    "url_norm string, url_hash string, host string, path string, seed_id string,"
    " priority int, scheduled_ms long, attempt int, not_before long, depth int"
)

# fetch_log column contract — shared with the streaming tail
# (streaming/crawl_stream.py reads _logfeed files with THIS schema; a
# drifted copy there would read renamed columns as silent nulls)
FETCH_LOG_SCHEMA = (
    "url_hash string, url_norm string, host string, status_code int,"
    " fetched_round int, fetch_order int"
)

# FRONTIER_ROW_KEY (full row identity: scheduled_ms is the enqueue-round
# marker and attempt increments per retry lineage, so no two live-or-ever-
# deleted frontier rows can collide on all four) lives in snapshots.py —
# it is the store's equality-delete key AND the selection anti-join key,
# re-exported here for the engine's callers.


class CrawlEngine:
    """Drives supersteps over a SnapshotStore; resumable at any round."""

    REBUILD_EVERY = REBUILD_EVERY  # overridable per instance in tests

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        corpus: dict[str, tuple[int, str, str | None]],
        robots_by_host: dict[str, str],
        per_host_budget: int = 8,
        user_agent: str = "lexi-spark",
        ttl_rounds: int | None = None,
        selector_configs: dict[str, dict] | None = None,
        hot_host_threshold: int | None = None,
        n_salts: int = 4,
        log_feed: bool = False,
        max_depth: int | None = None,
        domain_priority: dict[str, int] | None = None,
        file_index: dict[str, list[str]] | None = None,
        breaker: tuple[float, int, int] | None = None,
        trap_max_urls: int | None = None,
        conditional_recrawl: bool = False,
        adaptive_ttl: int | None = None,
        domain_politeness: bool = False,
        jsonld_extract: bool = False,
    ):
        """ttl_rounds: windowed URL-seen membership (the reference's 24 h
        Redis TTL, redis_cache.py:55-75 + settings.py:72-75, in round units):
        a URL is 'seen' only if enqueued within the last ttl_rounds rounds;
        older entries expire and the URL becomes crawlable again. None ==
        permanent membership.

        selector_configs: per-host {field: selector} website configs (the
        reference's website.config JSONB, its core user-facing surface) —
        executed per fetched page (X1/X2/X3/X5 engine) into the pages
        table's extracted_json column, the crawled_page.extracted_content
        analogue.

        hot_host_threshold: when set, hosts with more than this many due
        URLs select through the SALTED rank (north-rule skew handling): the
        per-host sort spreads over n_salts sub-groups with the politeness
        budget split across salts, trading exact within-host priority order
        for stragglerless stages. The set of fetched URLs over a drained
        crawl is unchanged (gated by tests/test_salted_engine.py); None (the
        default) keeps the exact-order plan the simulator equivalence gate
        pins.

        max_depth: hop-count crawl horizon (north rule's DEPTH-priority
        frontier; the reference bounds expansion by max_pages per seed —
        pagination.py service:50-143 — hop depth is the graph-crawl
        generalization): every frontier row carries `depth` (seeds = 0,
        links from a depth-d page enter at d+1); candidates that would
        exceed max_depth are dropped AT EXTRACTION, before the seen set —
        so a shorter path discovered later can still enqueue the URL.

        domain_priority: per-host priority override 0-10 (the reference's
        per-website crawl_job.priority, current_schema.sql:172 — every job
        for a website inherits its configured priority): hosts in the map
        score with the override for listings AND details, others keep the
        type-based defaults. Feeds the same S1 score, so high-priority
        domains drain first within every host's budget window.

        file_index: per-table columns to build per-file bloom sidecars for
        at commit time ({"pages": ["url_hash"], ...}) — the distributed
        analogue of the reference's point-lookup btrees
        (ix_crawled_page_url_hash, current_schema.sql:1441-1444): min/max
        bounds cannot prune uniformly-distributed hash keys, blooms can.
        page_lookup() exploits it; off by default (adds one column read
        per committed file at commit time).

        breaker: per-host error circuit breaker (beyond-reference — the
        reference retries per REQUEST only, retry_policy.py/R1-R5, so a host
        melting down keeps receiving its full politeness budget) as
        (err_threshold, min_attempts, cooldown_rounds): a host whose 5xx
        rate in any of the previous `cooldown_rounds` rounds reached
        `err_threshold` over at least `min_attempts` fetches gets budget 0
        this round — its due rows stay in the frontier untouched (the open
        state); when the window slides past the trip (no attempts happen
        while open, so the window empties) the host re-enters at full
        budget (the half-open probe: one more bad round re-trips it). The
        trip stats come from a fetched_round-pruned fetch_log range read
        (O(window) files on an aged chain), one tiny agg per round.

        trap_max_urls: crawl-trap cutoff (beyond-reference): a standing
        `url_templates` table counts enqueued URLs per (host, path template
        with digit runs collapsed to {N}); once a template's cumulative
        count exceeds the cap, NEW candidates matching it are dropped at
        extraction — after within-round dedup, BEFORE the seen probe — so a
        calendar/facet family stops growing the frontier while every other
        template on the host keeps crawling. Flags snapshot at round START
        (commits <= round-1); counts commit as O(delta) appends with the
        round. The flags side is O(#flagged templates), broadcast.

        conditional_recrawl: ETag semantics on the TTL re-crawl path
        (RFC 9110 §8.8.3/§13.1.2 — beyond-reference; the reference
        re-persists unconditionally): a re-fetched page whose body matches
        the STORED page (strong validator: byte equality, compared as
        sha256 of the raw body) is a 304 — it stays in crawl order and the
        fetch_log, but SKIPS the parse UDF, link re-extraction, and the
        latest-wins page MERGE, so per-round parse CPU and page-table write
        amplification follow the CHANGE rate, not the visit rate (the
        dominant re-crawl economy at 100 TB). On real Iceberg the stored
        validator is its own tiny column; here it derives from raw_html at
        join time. Meaningful only with ttl_rounds (permanent membership
        never re-fetches).

        adaptive_ttl: adaptive re-crawl CADENCE on top of conditional_recrawl
        (which it requires — the 304/modified signal is the change
        observation), as the max deferral in rounds. A standing
        `change_stats` table accumulates one (obs, changed) row per
        re-fetch (O(delta) appends, read-time SUM, compaction-folded like
        url_templates); a re-discovered candidate whose integer interval
        `min(adaptive_ttl, max(1, (2n+1) div (2X+1)))` — the rounds-domain
        surrogate of the Cho & Garcia-Molina estimator 1/lambda, exact
        integer arithmetic so engine==simulator equivalence is ULP-free —
        has not elapsed since its last observation is DROPPED at extraction
        (after within-round dedup, before the seen probe, exactly like the
        trap cutoff), so it is never seen-marked and re-enters via a later
        hub recirculation once due. Static pages back off toward
        adaptive_ttl while churning pages keep the ttl_rounds cadence;
        fetch volume follows the change rate the way conditional_recrawl
        makes parse/write volume follow it. The stats join keys on
        url_hash; at scale change_stats is bucketed by url_hash
        (operators/bucketing.py) so only the O(delta) candidate side
        shuffles."""
        self.spark = spark
        self.store = SnapshotStore(store_root)
        self.corpus = corpus
        self.robots = robots_by_host
        self.budget = per_host_budget
        self.user_agent = user_agent
        self.ttl_rounds = ttl_rounds
        if ttl_rounds is not None:
            # TTL re-crawls REPLACE page rows (Q1 latest-wins MERGE); with
            # the read policy registered, pages commit O(new pages) deltas
            # and every reader resolves one latest row per key — the same
            # merge-on-read treatment the frontier got, ending the last
            # corpus-sized per-round table rewrite in TTL mode. Precedence
            # matches merge_latest_wins (fetched_round desc, fetch_order
            # desc; cross-round ties impossible — a round's delta only
            # carries its own fetched_round).
            self.store.set_read_policy(
                "pages", ["host", "url_hash"], ["fetched_round", "fetch_order"]
            )
        self.selector_configs = selector_configs or {}
        self.hot_host_threshold = hot_host_threshold
        self.n_salts = n_salts
        self.max_depth = max_depth
        self.domain_priority = dict(domain_priority or {})
        self.file_index = dict(file_index or {})
        # pages always carries a per-file url_hash bloom sidecar: it is
        # what lets the rotation fold rewrite only files holding superseded
        # versions (plan_file_fold) and point lookups open only admitted
        # files — Iceberg's write.metadata bloom properties, default-on
        self.file_index.setdefault("pages", ["url_hash"])
        self.breaker = breaker
        self.trap_max_urls = trap_max_urls
        if conditional_recrawl and ttl_rounds is None:
            # permanent membership never re-fetches, so the flag would be a
            # silent no-op — surface the misconfiguration instead
            raise ValueError(
                "conditional_recrawl requires ttl_rounds (permanent seen"
                " membership never re-fetches, so there is nothing to"
                " conditionally re-crawl)"
            )
        self.conditional_recrawl = conditional_recrawl
        if adaptive_ttl is not None and not conditional_recrawl:
            raise ValueError(
                "adaptive_ttl requires conditional_recrawl — the 304/"
                "modified outcome of the conditional re-fetch IS the change"
                " observation the estimator feeds on"
            )
        if adaptive_ttl is not None and adaptive_ttl < 1:
            raise ValueError("adaptive_ttl must be >= 1 round")
        self.adaptive_ttl = adaptive_ttl
        self.domain_politeness = domain_politeness
        # JSON-LD structured-data extraction alongside the selector map:
        # every fetched page's <script type="application/ld+json"> blocks
        # flattened (kernels/jsonld.py) into the pages table's jsonld_json
        # column (same JSON-string shape as extracted_json)
        self.jsonld_extract = jsonld_extract
        # log_feed: additionally append each round's fetch_log rows to an
        # append-only feed directory for live tailing via
        # streaming.crawl_stream.tail_fetch_log (the reference's WebSocket
        # log streaming, log_publisher.py, as a file-feed channel). Off by
        # default — it duplicates fetch_log write IO by design (log shipping
        # is a second channel, not the table).
        self.log_feed = log_feed

    # ------------------------------------------------------------- bootstrap

    def _priority_expr(self, host_col: F.Column, default_col: F.Column) -> F.Column:
        """Per-host domain_priority override as a literal-map lookup (the
        broadcast-join degenerate case — the website dim is tiny); hosts
        outside the map keep the type-based default."""
        if not self.domain_priority:
            return default_col
        pairs: list[F.Column] = []
        for h, p in sorted(self.domain_priority.items()):
            pairs.extend([F.lit(h), F.lit(int(p))])
        return F.coalesce(
            F.element_at(F.create_map(*pairs), host_col), default_col
        ).cast("int")

    @staticmethod
    def _evolve_frontier(df: DataFrame) -> DataFrame:
        """Iceberg-style add-column schema evolution: frontier snapshots
        committed before the depth column existed read back with depth=0
        (seed depth), so a pre-upgrade store resumes instead of failing
        column resolution. Two shapes: a chain entirely pre-upgrade has no
        depth column at all; a MIXED chain (old base + new deltas) reads it
        via mergeSchema with nulls on the old files — coalesce those to the
        default."""
        if "depth" not in df.columns:
            return df.withColumn("depth", F.lit(0).cast("int"))
        return df.withColumn(
            "depth", F.coalesce(F.col("depth"), F.lit(0)).cast("int")
        )

    def _read_frontier(self, spark: SparkSession) -> DataFrame:
        """Resolved (merge-on-read) frontier with the engine's schema
        evolution applied. The resolution itself (adds ANTI-JOIN the
        broadcast equality-delete keys, Iceberg v2 delete files) lives in
        SnapshotStore.read — every reader gets live rows, not just the
        engine; this wrapper only adds the depth-column default."""
        return self._evolve_frontier(self.store.read(spark, "frontier"))

    def init_frontier(self, seeds: list[str]) -> None:
        """Round -1 commit: seeds enter frontier AND seen (enqueue == seen)."""
        rows = []
        for u in seeds:
            from crawler_spark.kernels.urlnorm import canonical_host, normalize_url
            import hashlib

            norm = normalize_url(u)
            h = hashlib.sha256(norm.encode()).hexdigest()
            host = canonical_host(norm)
            path = norm.split(host, 1)[1] if host in norm else "/"
            rows.append((norm, h, host, path or "/", f"listing:{host}",
                         self.domain_priority.get(host, PRIORITY_LISTING),
                         0, 0, 0, 0))
        frontier = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        seen = frontier.select(
            "host", "url_hash", F.lit(-1).cast("int").alias("seen_round")
        )
        # fresh bloom+cuckoo shards, written task-side into the store
        out_dir = self.store.blob_dir_for(-1)
        update_seen_shards(
            seen, blob_dir=None, n_shards=N_SHARDS, out_dir=out_dir,
            with_exact=True, full_markers=True,
        ).collect()  # tiny (shard, n_items) stat rows only
        self.store.commit_round(
            -1,
            {"frontier": frontier, "frontier_dels": self._empty_frontier_dels(),
             "seen": seen,
             "pages": self._empty_pages(), "dlq": self._empty_dlq(),
             "fetch_log": self._empty_fetch_log(),
             "retry_history": self._empty_retry_history()},
            metrics={"phase": "init", "n_seeds": len(rows)},
            blob_dir=out_dir, blob_chain=[out_dir],
            file_index=self.file_index,
            row_hints={"frontier": len(rows), "frontier_dels": 0,
                       "seen": len(rows), "pages": 0,
                       "dlq": 0, "fetch_log": 0, "retry_history": 0},
        )

    def enqueue_seeds(
        self,
        urls: DataFrame,
        url_col: str = "url",
        priority_col: str | None = None,
    ) -> dict[str, Any]:
        """Mid-crawl seed ingestion (the streaming entry point — the
        reference accepts new jobs while workers crawl, worker.py consuming
        NATS continuously): a DataFrame of raw seed URLs joins the frontier
        at the next round boundary, fully distributed — normalize + hash +
        host derivation run as the same UDFs/exprs the round plan uses, and
        the enqueue==seen invariant holds (already-seen URLs are dropped;
        fresh ones enter frontier AND seen atomically in one enqueue-only
        commit, with incremental shard maintenance).

        priority_col: optional per-row S1 priority (0-10, HIGHER = crawled
        first, the reference's scale) replacing the PRIORITY_LISTING
        default — the sitemap ingestion path maps protocol <priority>
        through it. Duplicate raw URLs keep the MAX (most important) value
        deterministically; domain_priority host overrides still win,
        mirroring the reference's website-level priority precedence.

        On a fresh store this doubles as distributed init (round -1)."""
        spark = self.spark
        fresh_store = not self.store.manifest()["rounds"]
        round_no = -1 if fresh_store else self.store.latest_round() + 1
        cols = [normalize_url_udf(F.col(url_col)).alias("url_norm")]
        if priority_col is not None:
            cols.append(F.col(priority_col).cast("int").alias("__prio"))
        norm = urls.select(*cols).filter(F.col("url_norm").isNotNull())
        if priority_col is not None:
            norm = norm.groupBy("url_norm").agg(F.max("__prio").alias("__prio"))
        else:
            norm = norm.dropDuplicates(["url_norm"])
        norm = norm.withColumn("url_hash", url_hash("url_norm")).withColumn(
            "host", canonical_host_udf(F.col("url_norm"))
        )
        default_prio = (
            F.coalesce(F.col("__prio"), F.lit(PRIORITY_LISTING))
            if priority_col is not None
            else F.lit(PRIORITY_LISTING)
        )
        batch = norm.select(
            "url_norm", "url_hash", "host",
            F.concat(
                F.lit("/"),
                F.regexp_extract("url_norm", r"^https?://[^/]+/(.*)$", 1),
            ).alias("path"),
            F.concat(F.lit("listing:"), F.col("host")).alias("seed_id"),
            self._priority_expr(
                F.col("host"), default_prio
            ).alias("priority"),
            F.lit(max(round_no, 0)).cast("long").alias("scheduled_ms"),
            F.lit(0).alias("attempt"),
            F.lit(max(round_no, 0)).cast("long").alias("not_before"),
            F.lit(0).cast("int").alias("depth"),
        )
        # crawl-trap cutoff applies to EVERY ingestion path (a sitemap
        # advertising a 10^6-URL calendar family must not bypass the cap
        # that extraction candidates honor); enqueued fresh URLs also FEED
        # the standing counts below, so sitemap-sourced families trip the
        # flag for later extraction rounds too
        tmpl_expr = F.regexp_replace(F.col("path"), "[0-9]+", "{N}")
        if self.trap_max_urls is not None and not fresh_store:
            tmpl_tbl = self.store.read(spark, "url_templates")
            if tmpl_tbl is not None:
                trap_flags = (
                    tmpl_tbl.groupBy("host", "path_template")
                    .agg(F.sum("n").alias("n_urls"))
                    .filter(F.col("n_urls") > self.trap_max_urls)
                    .select("host", "path_template")
                )
                batch = (
                    batch.withColumn("path_template", tmpl_expr)
                    .join(F.broadcast(trap_flags),
                          ["host", "path_template"], "left_anti")
                    .drop("path_template")
                )
        seen = self.store.read(spark, "seen") if not fresh_store else None
        enq_chain = None if fresh_store else self.store.latest_blob_chain()
        if seen is None:
            deduped = batch
        elif self.ttl_rounds is None and enq_chain is not None:
            # permanent membership: the shard exact files ARE the full seen
            # set (no deletes ever), so the batch dedups shard-locally —
            # no per-enqueue shuffle of the seen table
            deduped = seen_filter_pipeline_files(
                batch, seen, enq_chain, n_shards=N_SHARDS,
                seen_unique=True, exact_files=True,
            )
        else:
            # TTL mode keeps the table join: enqueue semantics are
            # "ever seen" (any cohort, expired or not), which the
            # window-tracking exact files deliberately do not retain
            deduped = batch.join(seen.select("url_hash"), "url_hash", "left_anti")
        fresh = deduped.select(*[f.name for f in batch.schema.fields]).cache()
        n_fresh = fresh.count()
        # an enqueue commit advances the round counter, so in TTL mode it
        # also OWNS its round's cuckoo retirement — each round retires
        # exactly its expiring cohort (seen_round == round - ttl), the same
        # cadence as _run_round; a commit that skipped its cohort would
        # leave those keys in the filter until the next full rebuild
        ttl_deletes = (
            seen.filter(
                F.col("seen_round") == round_no - self.ttl_rounds
            ).select("host", "url_hash")
            if self.ttl_rounds is not None and seen is not None
            else None
        )
        if not fresh_store and n_fresh == 0 and (
            ttl_deletes is None or ttl_deletes.limit(1).count() == 0
        ):
            # nothing new, nothing expiring: metrics-only commit (no table
            # or blob IO; reads keep resolving to the previous chain)
            entry = self.store.commit_round(
                round_no, {}, metrics={"phase": "enqueue", "n_enqueued": 0}
            )
            fresh.unpersist()
            return entry["metrics"]
        seen_delta = fresh.select(
            "host", "url_hash", F.lit(round_no).cast("int").alias("seen_round")
        )
        out_dir = self.store.blob_dir_for(round_no)
        # same compaction contract as _run_round: fresh store / expired
        # blobs / over-long chain force a full rebuild; otherwise BOTH
        # modes append an O(batch) immutable delta dir (TTL deltas carry
        # the expiring cohort as tombstone pair files)
        rebuild = (
            enq_chain is None
            or len(enq_chain) >= 3 * self.REBUILD_EVERY
        )
        if rebuild:
            # fresh store OR expired blobs: authoritative rebuild from the
            # full post-enqueue membership (same guard as _run_round; under
            # TTL, from the window the NEXT round's probe will use)
            base = seen.unionByName(seen_delta) if seen is not None else seen_delta
            if self.ttl_rounds is not None:
                base = base.filter(
                    F.col("seen_round") >= round_no + 1 - self.ttl_rounds
                )
            update_seen_shards(
                base.select("host", "url_hash"), blob_dir=None,
                n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                full_markers=True,
            ).collect()
            blob_chain = [out_dir]
        elif self.ttl_rounds is not None:
            # TTL merge-on-read: fresh keys become a delta element, the
            # expiring cohort its tombstone pair files — O(batch + cohort)
            # bytes, never O(window) (the old path rewrote every shard's
            # full filter in place each commit)
            update_seen_shards(
                fresh.select("host", "url_hash"), blob_dir=None,
                deletes=ttl_deletes, n_shards=N_SHARDS, out_dir=out_dir,
                with_exact=True, delta_build=True,
            ).collect()
            blob_chain = trim_blob_chain(enq_chain + [out_dir], N_SHARDS)
        else:
            # n_fresh > 0 here: permanent-mode n_fresh == 0 with no TTL
            # deletes already took the metrics-only early return above
            update_seen_shards(
                fresh.select("host", "url_hash"), blob_dir=None,
                n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                delta_build=True,
            ).collect()
            blob_chain = trim_blob_chain(enq_chain + [out_dir], N_SHARDS)
        if not fresh_store and n_fresh == 0:
            # TTL retirement only: blob-dir commit with no table writes
            entry = self.store.commit_round(
                round_no, {}, metrics={"phase": "enqueue", "n_enqueued": 0},
                blob_dir=out_dir, blob_chain=blob_chain,
            )
            fresh.unpersist()
            return entry["metrics"]
        metrics = {"phase": "enqueue", "n_enqueued": n_fresh}
        full: dict[str, DataFrame] = {}
        delta: dict[str, DataFrame] = {}
        if fresh_store:
            full = {
                "frontier": fresh,
                "frontier_dels": self._empty_frontier_dels(),
                "seen": seen_delta,
                "pages": self._empty_pages(), "dlq": self._empty_dlq(),
                "fetch_log": self._empty_fetch_log(),
                "retry_history": self._empty_retry_history(),
            }
            hints = {"frontier": n_fresh, "frontier_dels": 0,
                     "seen": n_fresh, "pages": 0,
                     "dlq": 0, "fetch_log": 0, "retry_history": 0}
        elif self.store.chain_length("frontier") >= self.REBUILD_EVERY:
            # chain-length backstop: an enqueue-heavy workload (streaming
            # foreachBatch between crawls) would otherwise grow the delta
            # chain without bound — _run_round's compaction cadence never
            # fires if no active round lands. Resolve and rewrite full
            # (rewrite_data_files), exactly like a compaction round.
            prev_rows = self.store.table_rows_many(["frontier", "seen"])
            resolved = self._read_frontier(spark)
            full = {
                "frontier": resolved.unionByName(fresh),
                # frontier_dels auto-reset by commit_round's full-snapshot
                # invariant
                "seen": (
                    seen.unionByName(seen_delta)
                    if seen is not None
                    else seen_delta
                ),
            }
            hints = {
                "frontier": prev_rows["frontier"] + n_fresh,
                "seen": prev_rows["seen"] + n_fresh,
            }
        else:
            # merge-on-read: an enqueue is a pure ADD delta — no frontier
            # rewrite, no delete keys; per-enqueue IO is O(batch)
            delta = {"frontier": fresh, "seen": seen_delta}
            hints = {"frontier": n_fresh, "seen": n_fresh}
        if self.trap_max_urls is not None and n_fresh > 0:
            # enqueued URLs count into the standing template table exactly
            # like extraction-discovered ones
            tmpl_delta = (
                fresh.withColumn("path_template", tmpl_expr)
                .groupBy("host", "path_template")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .withColumn("round", F.lit(round_no).cast("int"))
            )
            if self.store.table_path("url_templates") is None:
                full["url_templates"] = tmpl_delta
            else:
                delta["url_templates"] = tmpl_delta
            hints["url_templates"] = max(1, n_fresh // 64)
        entry = self.store.commit_round(
            round_no, full, metrics=metrics, blob_dir=out_dir,
            blob_chain=blob_chain, delta_tables=delta, row_hints=hints,
            file_index=self.file_index,
        )
        fresh.unpersist()
        return entry["metrics"]

    def add_seeds(self, seeds: list[str]) -> dict[str, Any]:
        """List convenience wrapper over enqueue_seeds."""
        return self.enqueue_seeds(
            self.spark.createDataFrame([(s,) for s in seeds], "url string")
        )

    def discover_sitemaps(self) -> dict[str, list[str]]:
        """`Sitemap:` URLs declared by each host's robots.txt (RFC 9309
        §2.3 global lines, kernels/sitemap.py) — the discovery half of the
        ingestion loop: the caller fetches these documents and feeds them to
        enqueue_sitemaps. Driver-side dict comprehension: the robots map is
        the same tiny per-host config the round plan broadcasts."""
        from crawler_spark.kernels.sitemap import sitemap_urls

        return {
            h: urls
            for h, txt in self.robots.items()
            if (urls := sitemap_urls(txt))
        }

    def enqueue_sitemaps(
        self, sitemap_docs: DataFrame, xml_col: str = "xml"
    ) -> tuple[dict[str, Any], DataFrame]:
        """Sitemap ingestion into the frontier (beyond-reference; seed
        discovery there is config-only, seed_url_crawler.py:303+): a
        DataFrame of fetched sitemap documents parses distributed
        (kernels/sitemap.py via one Arrow UDF + explode), page entries
        enqueue through the standard enqueue_seeds path — protocol
        <priority> mapped onto the S1 scale (1.0 -> 10, crawled first:
        HIGHER S1 priority drains first, the reference's convention), the
        enqueue==seen invariant and O(batch) commit economics inherited
        wholesale — and <sitemapindex> children come back as a DataFrame of
        (sitemap_url, lastmod) for the CALLER to fetch and feed into the
        next enqueue_sitemaps call: index fan-out is recirculation across
        calls, one level per call, exactly like pagination expansion —
        never in-process recursion.

        Returns (enqueue metrics + n_sitemap_children, child sitemaps)."""
        from crawler_spark.functions.sitemap_udfs import parse_sitemap_udf

        entries = sitemap_docs.select(
            F.explode(parse_sitemap_udf(F.col(xml_col))).alias("e")
        ).select(
            F.col("e.kind").alias("kind"),
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
            F.col("e.priority").alias("priority"),
        ).cache()
        pages = entries.filter(F.col("kind") == "url").select(
            F.col("loc").alias("url"),
            # sitemap_priority_to_frontier as a JVM expr: protocol 1.0 ->
            # S1 10 (crawled first). No .5 ties on the clamped 0.0-1.0
            # range; pinned vs the kernel in tests/test_sitemap.py
            F.round(F.col("priority") * 10, 0).cast("int")
            .alias("sm_priority"),
        )
        # materialize the (small — index entries only) children on the
        # driver and hand back a fresh local DataFrame: no cached RDD leaks
        # across the caller's recirculation loop, and the returned frame
        # stays valid after `entries` is unpersisted
        child_rows = (
            entries.filter(F.col("kind") == "sitemap")
            .select(F.col("loc").alias("sitemap_url"), "lastmod")
            .collect()
        )
        children = self.spark.createDataFrame(
            [(r["sitemap_url"], r["lastmod"]) for r in child_rows],
            "sitemap_url string, lastmod string",
        )
        metrics = self.enqueue_seeds(pages, url_col="url",
                                     priority_col="sm_priority")
        metrics["n_sitemap_children"] = len(child_rows)
        entries.unpersist()
        return metrics, children

    def _empty_pages(self) -> DataFrame:
        # raw_html is the blob-store parity column (the reference writes the
        # raw page to GCS tasks/{task}/{url_hash}.html, storage.py:56-71;
        # here the blob IS a column of the snapshot table)
        schema = (
            "url_hash string, url_norm string, host string, title string,"
            " spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
            " content_sha256 string, simhash long, status_code int,"
            " fetched_round int, fetch_order int, raw_html string,"
            " extracted_json string"
        )
        if self.jsonld_extract:
            schema += ", jsonld_json string"
        if self.conditional_recrawl:
            # stored validator + link set for the 304 path
            schema += (
                ", etag string, links array<struct<href:string,"
                "anchor:string,preview:string,pos:int>>"
            )
        return self.spark.createDataFrame([], schema)

    def _empty_frontier_dels(self) -> DataFrame:
        from crawler_spark.engine.snapshots import FRONTIER_DELS_SCHEMA

        return self.spark.createDataFrame([], FRONTIER_DELS_SCHEMA)

    def _empty_dlq(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "url_norm string, host string, error_category string, attempt int,"
            " failed_round int"
        )

    def _empty_fetch_log(self) -> DataFrame:
        # append-only crawl log (Q8 analogue, crawl_log in the reference):
        # EVERY fetch attempt, success or not. The pages table is latest-wins
        # merged (Q1), so re-crawls replace rows there — the order invariant
        # lives here.
        return self.spark.createDataFrame([], FETCH_LOG_SCHEMA)

    def _empty_retry_history(self) -> DataFrame:
        # R5 per-attempt audit (retry_history, current_schema.sql:523-534 +
        # job_retry_handler.record_retry_attempt, job_retry_handler.py:162-208):
        # one row per failure ROUTING DECISION. The reference persists only
        # the retry branch in retry_history (DLQ rows land in
        # dead_letter_queue); here the `action` column unifies all three
        # routes so "why did this URL take 3 tries" is one range scan.
        return self.spark.createDataFrame(
            [], "url_hash string, url_norm string, host string,"
            " attempt_number int, error_category string, action string,"
            " retry_delay_rounds long, not_before long, decided_round int"
        )

    # ------------------------------------------------------------- one round

    _staging_branch: str | None = None  # set only by run_round_audited

    def run_round(self, round_no: int) -> dict[str, Any]:
        self._in_round = True
        try:
            return self._run_round(round_no)
        finally:
            self._in_round = False

    def run_round_audited(self, round_no: int, gate) -> dict[str, Any]:
        """Write-audit-publish (Iceberg WAP / `spark.wap.branch`): the round
        runs normally but commits to the 'audit' STAGING branch — invisible
        to every reader. `gate(engine, round_no) -> bool` then inspects the
        staged state via store.read_staged (e.g. duplicate-rate threshold,
        span-parse sampling, row-count sanity): pass => publish_branch (one
        atomic manifest flip, the data files are already in place); fail =>
        drop_branch (dirs reclaimed, the store byte-identical to the
        pre-round state, so the round re-runs after the fix). The validation
        pattern the reference runs as per-batch persistence checks
        (result_persistence.py) expressed as an Iceberg commit workflow."""
        import os

        # The commit_round(branch=...) guard fires too late for the blob
        # shards: _run_round writes update_seen_shards output to
        # blob_dir_for(round_no) — keyed by round number only — BEFORE the
        # staged commit, so an audited re-run of a committed round would
        # clobber the committed round's filter state in place even though
        # the commit itself is refused. Refuse before any IO happens.
        if round_no <= self.store.latest_round():
            raise ValueError(
                f"cannot run round {round_no} audited: it is already"
                " committed — an audited re-run would overwrite its blob"
                " shard dirs in place before any gate could veto it"
            )
        self._reconcile_staged_feeds()
        self._staging_branch = "audit"
        try:
            metrics = self.run_round(round_no)
        finally:
            self._staging_branch = None
        published = bool(gate(self, round_no))
        staged_feed = os.path.join(
            self.store.root, "_logfeed_staging", f"feed-{round_no:05d}"
        )
        if published:
            self.store.publish_branch("audit")
            self._promote_staged_feed(staged_feed, round_no)
        else:
            self.store.drop_branch("audit")
            if os.path.isdir(staged_feed):
                import shutil

                shutil.rmtree(staged_feed)
        return {**metrics, "published": published}

    def _promote_staged_feed(self, staged_feed: str, round_no: int) -> None:
        """Move a published round's staged log feed into the consumer's
        `_logfeed/feed-*` glob. Idempotent: no staged dir, no work."""
        import os

        if not os.path.isdir(staged_feed):
            return
        final_feed = os.path.join(
            self.store.root, "_logfeed", f"feed-{round_no:05d}"
        )
        os.makedirs(os.path.dirname(final_feed), exist_ok=True)
        if not os.path.isdir(final_feed):
            os.replace(staged_feed, final_feed)
        else:  # a normal (non-audited) run already fed this round
            import shutil

            shutil.rmtree(staged_feed)

    def _reconcile_staged_feeds(self) -> None:
        """Crash recovery for the staged log feed (run at audited-round
        start): publish_branch and the feed promotion are two steps, so a
        crash in between leaves `_logfeed_staging/feed-K` orphaned for a
        COMMITTED round K — finish the promotion (K <= latest_round, the
        manifest flip already happened). A staged feed for an UNCOMMITTED
        round is the residue of a vetoed/aborted attempt (drop_branch flips
        the manifest before any cleanup) — delete it so a later drained
        re-run of the same round can never publish stale fetch events."""
        import os
        import shutil

        staging = os.path.join(self.store.root, "_logfeed_staging")
        if not os.path.isdir(staging):
            return
        latest = self.store.latest_round()
        for name in sorted(os.listdir(staging)):
            path = os.path.join(staging, name)
            if not (name.startswith("feed-") and os.path.isdir(path)):
                continue
            try:
                k = int(name[5:])
            except ValueError:
                continue
            if k <= latest:
                self._promote_staged_feed(path, k)
            else:
                shutil.rmtree(path)

    def _run_round(self, round_no: int) -> dict[str, Any]:
        spark = self.spark
        frontier = self._read_frontier(spark)
        seen = self.store.read(spark, "seen")
        pages = self.store.read(spark, "pages")
        dlq = self.store.read(spark, "dlq")
        fetch_log = self.store.read(spark, "fetch_log")

        due = frontier.filter(F.col("not_before") <= round_no)
        held = frontier.filter(F.col("not_before") > round_no)
        if due.isEmpty():  # driver action 1 (limit-1 scan, not a count)
            # drained only when nothing is held for a later round either.
            # No table changed — commit metrics only (zero data IO); reads
            # keep resolving every table to its last-written snapshot/chain.
            # EXCEPT: this commit still advances the round counter, so under
            # TTL it owns its round's cohort retirement — with exact_files
            # the final dedup arbiter, a skipped delete round would suppress
            # TTL re-crawls for that cohort until the next full rebuild
            # (pre-exact-layer the window-filtered anti-join corrected it).
            blob_kw: dict[str, Any] = {}
            if self.ttl_rounds is not None:
                idle_dels = seen.filter(
                    F.col("seen_round") == round_no - self.ttl_rounds
                ).select("host", "url_hash")
                prev = self.store.latest_blob_chain()
                if prev is not None and idle_dels.limit(1).count() > 0:
                    out_dir = self.store.blob_dir_for(round_no)
                    if len(prev) >= 3 * self.REBUILD_EVERY:
                        # chain-length backstop: an idle streak can append
                        # one tombstone delta per populated cohort; fold to
                        # a fresh base once the fan-in bound is hit (same
                        # contract as the active-round backstop)
                        update_seen_shards(
                            seen.filter(
                                F.col("seen_round")
                                >= round_no + 1 - self.ttl_rounds
                            ).select("host", "url_hash"),
                            blob_dir=None, n_shards=N_SHARDS,
                            out_dir=out_dir, with_exact=True,
                            full_markers=True,
                        ).collect()
                        blob_kw["blob_chain"] = [out_dir]
                    else:
                        # tombstone-only delta element (no adds): O(cohort)
                        # bytes appended to the chain, no filter rewritten
                        update_seen_shards(
                            idle_dels.limit(0), blob_dir=None,
                            deletes=idle_dels, n_shards=N_SHARDS,
                            out_dir=out_dir, with_exact=True,
                            delta_build=True,
                        ).collect()
                        blob_kw["blob_chain"] = trim_blob_chain(
                            prev + [out_dir], N_SHARDS
                        )
                    blob_kw["blob_dir"] = out_dir
            entry = self.store.commit_round(
                round_no, {},
                metrics={"n_due": 0, "done": frontier.isEmpty()},
                branch=self._staging_branch,
                **blob_kw,
            )
            return entry["metrics"]

        # robots gate (path-level) — excluded rows leave the frontier for good
        allowed_udf, delay_udf = robots_eval_udfs(self.robots, self.user_agent)
        flagged = due.withColumn(
            "robots_ok", allowed_udf(F.col("host"), F.col("path"))
        ).cache()
        allowed = flagged.filter(F.col("robots_ok")).drop("robots_ok")

        # S1 score on integral round-granularity time + crawl-delay-aware budget
        scored = allowed.withColumn(
            "priority_score",
            (F.lit(10) - F.greatest(F.lit(0), F.least(F.lit(10), F.col("priority"))))
            .cast("long") * F.lit(10**12) + F.col("scheduled_ms"),
        ).withColumn("crawl_delay_s", delay_udf(F.col("host")))
        budgets = (
            scored.groupBy("host")
            .agg(F.max("crawl_delay_s").alias("cd"))
            .withColumn(
                "budget",
                F.when(
                    F.col("cd").isNotNull() & (F.col("cd") > 0),
                    F.least(F.lit(self.budget),
                            F.floor(F.lit(float(self.budget)) / F.col("cd"))),
                ).otherwise(F.lit(self.budget)).cast("long"),
            )
            .select("host", "budget")
        )
        # per-host circuit breaker: tripped hosts leave the budgets dim, so
        # the selection's left join coalesces their budget to 0 — their due
        # rows flow untouched into not_selected (still in the frontier next
        # round). Window stats read O(cooldown) pruned fetch_log files.
        suppressed_dim: DataFrame | None = None
        with_rd: DataFrame | None = None
        if self.breaker is not None and round_no > 0:
            thr, min_att, cooldown = self.breaker
            wlog = self.fetch_log_range(
                max(0, round_no - cooldown), round_no - 1
            )
            tripped = (
                wlog.groupBy("host", "fetched_round")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("status_code") >= 500).cast("long")).alias("e"),
                )
                .filter(
                    (F.col("n") >= min_att)
                    & (F.col("e").cast("double") / F.col("n") >= thr)
                )
                .select("host")
                .distinct()
            )
            # hosts tripped AND due this round — the metric the simulator
            # equivalence gate checks per round
            suppressed_dim = budgets.join(
                F.broadcast(tripped), "host", "left_semi"
            ).cache()
            budgets = budgets.join(F.broadcast(tripped), "host", "left_anti")
        if self.domain_politeness:
            from crawler_spark.functions.frontier_exprs import registered_domain_col

            # organization grouping: split the org budget across its live
            # hosts (budgets dim is post-breaker, O(hosts) rows — the
            # group-count join is a broadcast of O(#organizations))
            with_rd = budgets.withColumn(
                "__rd", registered_domain_col(F.col("host"))
            ).cache()  # read twice: the org-count agg and the join left side
            counts = with_rd.groupBy("__rd").agg(
                F.count(F.lit(1)).alias("__nh")
            )
            budgets = (
                with_rd.join(F.broadcast(counts), "__rd")
                .withColumn(
                    "budget",
                    F.least(
                        F.col("budget"),
                        F.greatest(
                            F.lit(1).cast("long"),
                            F.expr(
                                f"CAST({self.budget} AS BIGINT) DIV __nh"
                            ),
                        ),
                    ),
                )
                .drop("__rd", "__nh")
            )
        if self.hot_host_threshold is not None:
            from crawler_spark.operators.frontier import salted_budget_selection

            # fetch pacing needs a per-host 1-based fetch_order; after the
            # salted selection the surviving set is <= budget rows per host,
            # so this rank window is tiny (post-selection, not over the
            # frontier)
            w_sel = Window.partitionBy("host").orderBy(
                F.col("priority_score").asc(), F.col("url_hash").asc()
            )
            selected = (
                salted_budget_selection(
                    scored, budgets, tiebreak="url_hash",
                    hot_threshold=self.hot_host_threshold, n_salts=self.n_salts,
                )
                .drop("host_salt")
                .withColumn("fetch_order", F.row_number().over(w_sel))
                .cache()
            )
        else:
            selected = per_host_budget_selection(
                scored, budgets, tiebreak="url_hash"
            ).cache()
        # row-IDENTITY anti-join, not url_hash: under TTL expiry a retry row
        # and a re-discovered fresh row for the same URL legitimately coexist
        # (the reference would hold two jobs too — the Redis dedup key
        # expired and NATS's 5-min dedup window is long past, nats_queue.py
        # :100); selecting one must not consume the other. (url_hash,
        # attempt, scheduled_ms, not_before) is a full row identity: no two
        # frontier rows can share all four. Same single shuffle as before —
        # the join key still hashes on url_hash first. FRONTIER_ROW_KEY is
        # shared with the store's equality-delete key by construction.
        not_selected = scored.join(
            selected.select(*FRONTIER_ROW_KEY), FRONTIER_ROW_KEY, "left_anti"
        ).select(*[f.name for f in frontier.schema.fields])

        # paced fetch with stateful per-chain stop detection
        batch = selected.withColumn("rps", F.lit(2.0)).withColumn("burst", F.lit(3))
        fetched = fetch_against_corpus(batch, self.corpus).cache()

        ok = fetched.filter(F.col("status_code") == 200)
        # conditional re-crawl (ETag/304): bodies identical to the stored
        # page skip parse + merge entirely; only changed/new bodies go on.
        # The join keys on (host, url_hash) — the pages MERGE key, bucketable
        # — and compares strong validators (sha256 of the raw body).
        not_modified: DataFrame | None = None
        obs_delta: DataFrame | None = None
        if self.conditional_recrawl and self.ttl_rounds is not None:
            from crawler_spark.functions.parse_udfs import LINK_TYPE

            # the validator is a STORED column (etag, written with the page
            # — Iceberg's tiny-column economics: the join dim is a column
            # read, never a full-corpus re-hash); pre-upgrade rows without
            # it fall back to hashing raw_html for exactly those rows, and
            # rows without stored links recirculate nothing until their
            # first post-upgrade re-write
            pcols = pages.columns
            etag_col = (
                F.coalesce(F.col("etag"), F.sha2(F.col("raw_html"), 256))
                if "etag" in pcols
                else F.sha2(F.col("raw_html"), 256)
            )
            links_col = (
                F.col("links") if "links" in pcols
                else F.lit(None).cast(LINK_TYPE)
            )
            stored = pages.select(
                "host", "url_hash",
                etag_col.alias("__stored_etag"),
                links_col.alias("__stored_links"),
            )
            okj = ok.join(stored, ["host", "url_hash"], "left")
            fresh_etag = F.sha2(F.col("content"), 256)
            not_modified = okj.filter(
                F.col("__stored_etag").isNotNull()
                & (F.col("__stored_etag") == fresh_etag)
            ).cache()
            ok = okj.filter(
                F.col("__stored_etag").isNull()
                | (F.col("__stored_etag") != fresh_etag)
            ).drop("__stored_etag", "__stored_links")
            if self.adaptive_ttl is not None:
                # one change OBSERVATION per re-fetch (stored page existed):
                # the per-round delta of the standing change_stats table.
                # First fetches observe nothing — the estimator needs a
                # revisit. Recomputing okj here re-reads only the pages
                # validator column (fetched is cached), the same tiny-column
                # economics as the conditional join itself.
                obs_delta = okj.filter(
                    F.col("__stored_etag").isNotNull()
                ).select(
                    "url_hash",
                    F.lit(1).cast("long").alias("obs"),
                    (F.col("__stored_etag") != fresh_etag)
                    .cast("long").alias("changed"),
                    F.lit(round_no).cast("int").alias("round"),
                ).cache()  # consumed twice: metric count + commit write
        parsed = ok.withColumn(
            "p", parse_page_udf(F.col("content"))
        ).select(
            "url_hash", "url_norm", "host", "seed_id", "fetch_order", "content",
            "depth",
            "p.title", "p.spans", "p.links", "p.content_sha256", "p.simhash",
        ).cache()

        # X5 website-config extraction (the reference runs the per-website
        # {field: selector} map on every fetched page): heterogeneous per-
        # host schemas -> extracted_content JSON string, like crawled_page
        if self.selector_configs:
            from crawler_spark.functions.selector_udfs import extract_json_by_host

            with_extract = extract_json_by_host(
                parsed, "content", "host", self.selector_configs
            )
        else:
            with_extract = parsed.withColumn(
                "extracted_json", F.lit(None).cast("string")
            )
        page_cols = [
            "url_hash", "url_norm", "host", "title", "spans", "content_sha256",
            "simhash", F.lit(200).alias("status_code"),
            F.lit(round_no).alias("fetched_round"),
            F.col("fetch_order").cast("int"),
            F.col("content").alias("raw_html"),
            "extracted_json",
        ]
        if self.jsonld_extract:
            from crawler_spark.functions.selector_udfs import extract_jsonld

            with_extract = extract_jsonld(with_extract, "content", out_col="__ld")
            with_extract = with_extract.withColumn(
                "jsonld_json",
                F.when(F.size("__ld") > 0, F.to_json("__ld")),
            ).drop("__ld")
            page_cols += ["jsonld_json"]
        if self.conditional_recrawl:
            # persist the strong validator + link set WITH the page: the next
            # re-crawl's 304 check is a column read, and its link
            # recirculation needs no re-parse
            page_cols += [
                F.sha2(F.col("content"), 256).alias("etag"),
                F.col("links").alias("links"),
            ]
        new_pages = with_extract.select(*page_cols)

        # ---- link extraction -> absolutize -> normalize -> scope -> dedup
        links = parsed.select(
            "url_norm", "host", "depth",
            F.explode_outer("links").alias("l"),
        ).select(
            F.col("url_norm").alias("base"), F.col("host").alias("src_host"),
            (F.col("depth") + 1).cast("int").alias("cand_depth"),
            F.col("l.href").alias("href"), F.col("l.pos").alias("pos"),
        ).filter(F.col("href").isNotNull())
        if not_modified is not None:
            # 304 pages recirculate their STORED link set (body unchanged ⇒
            # links unchanged), so conditional mode keeps the exact crawl
            # dynamics of unconditional mode — TTL re-discovery through
            # unchanged hub pages never starves — while still skipping the
            # parse UDF and the page write
            nm_links = not_modified.select(
                "url_norm", "host", "depth",
                F.explode_outer("__stored_links").alias("l"),
            ).select(
                F.col("url_norm").alias("base"),
                F.col("host").alias("src_host"),
                (F.col("depth") + 1).cast("int").alias("cand_depth"),
                F.col("l.href").alias("href"), F.col("l.pos").alias("pos"),
            ).filter(F.col("href").isNotNull())
            links = links.unionByName(nm_links)
        if self.max_depth is not None:
            # depth horizon: over-depth candidates are dropped BEFORE the
            # seen set, so a shorter path found later may still enqueue them
            links = links.filter(F.col("cand_depth") <= self.max_depth)
        cands = (
            links.withColumn("abs_url", resolve_relative_udf(F.col("href"), F.col("base")))
            .withColumn("cand_norm", normalize_url_udf(F.col("abs_url")))
            .filter(F.col("cand_norm").rlike(SCOPE_RE))
            .withColumn("cand_hash", url_hash("cand_norm"))
            .withColumn("cand_host", canonical_host_udf(F.col("cand_norm")))
        )
        # the dedup shuffle carries the 32-byte binary digest instead of the
        # 64-char hex string (hex re-derived map-side after the shuffle):
        # 32 fewer bytes per candidate through shuffle write+read and
        # cheaper key compares in the window sort — at 10^8 candidates/round
        # that is multiple GB off the wire per round
        cands = (
            first_by_order(
                cands.select(
                    F.col("cand_norm").alias("url_norm"),
                    F.unhex(F.col("cand_hash")).alias("url_key"),
                    F.col("cand_host").alias("host"),
                    F.col("cand_depth").alias("depth"),
                    "pos",
                ),
                # min depth wins (a URL reachable two ways this round enters
                # at its SHORTEST path — the BFS invariant the depth horizon
                # needs); pos breaks ties, and rows tied on (depth, pos) are
                # identical in every remaining column
                "url_key", ["depth", "pos"],
            )
            .withColumn("url_hash", F.lower(F.hex("url_key")))
            .drop("url_key")
        )
        # crawl-trap cutoff: candidates whose (host, digit-collapsed path
        # template) is over the standing cap are dropped here — after the
        # within-round dedup, BEFORE the seen probe (trapped families never
        # reach the filter store). Flags are the round-START table state.
        trap_flags: DataFrame | None = None
        if self.trap_max_urls is not None:
            cands = cands.withColumn(
                "path_template",
                F.regexp_replace(
                    F.concat(
                        F.lit("/"),
                        F.regexp_extract(
                            "url_norm", r"^https?://[^/]+/(.*)$", 1
                        ),
                    ),
                    "[0-9]+",
                    "{N}",
                ),
            )
            tmpl = self.store.read(spark, "url_templates")
            if tmpl is not None:
                trap_flags = (
                    tmpl.groupBy("host", "path_template")
                    .agg(F.sum("n").alias("n_urls"))
                    .filter(F.col("n_urls") > self.trap_max_urls)
                    .select("host", "path_template")
                    .cache()
                )
                cands = cands.join(
                    F.broadcast(trap_flags), ["host", "path_template"],
                    "left_anti",
                )
        # adaptive re-crawl deferral: candidates whose change-rate interval
        # has not elapsed since their last observation are dropped here —
        # after within-round dedup, BEFORE the seen probe (same slot as the
        # trap cutoff) — so they are never seen-marked and re-enter via a
        # later hub recirculation once due. Stats are the round-START table
        # state (commits <= round-1), summed at read time over the delta
        # chain. Integer arithmetic only: (2n+1) div (2X+1) is the
        # rounds-domain 1/lambda surrogate, ULP-free vs the simulator.
        adaptive_dropped: DataFrame | None = None
        if self.adaptive_ttl is not None:
            cs = self.store.read(spark, "change_stats")
            if cs is not None:
                stats = cs.groupBy("url_hash").agg(
                    F.sum("obs").alias("__n_obs"),
                    F.sum("changed").alias("__n_changed"),
                    F.max("round").alias("__last_obs_round"),
                )
                interval = F.least(
                    F.lit(self.adaptive_ttl).cast("long"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        # SQL DIV == Python // for the non-negative operands
                        # here — true integer division, no double rounding
                        F.expr(
                            "(2 * __n_obs + 1) DIV (2 * __n_changed + 1)"
                        ),
                    ),
                )
                joined = cands.join(stats, "url_hash", "left").cache()
                not_due = F.col("__last_obs_round").isNotNull() & (
                    F.lit(round_no + 1)
                    < F.col("__last_obs_round") + interval
                )
                # one cache on the joined frame: the deferral metric and the
                # kept branch both read it — without it the whole candidate
                # dedup/trap/stats pipeline would materialize twice a round
                adaptive_dropped = joined.filter(not_due)
                cands = joined.filter(~not_due).drop(
                    "__n_obs", "__n_changed", "__last_obs_round"
                )
        cands = cands.cache()
        # two-layer seen dedup with the FILE-backed shard probe: candidates
        # shuffle once on shard, each task loads only its own shard's blob
        # from the store — no blobs on the driver or in the UDF closure.
        # TTL mode probes the cuckoo layer (maintained with deletes, so the
        # filter reflects the active window exactly); permanent mode probes
        # the cheaper bloom layer. FPs never lose URLs: filter hits are
        # verified IN-TASK against the shard's exact-<s> pair file
        # (exact_files mode) — the shard files track the active window on
        # the per-round delete cadence, so the per-round anti-join shuffle
        # against the full seen table (the last O(|corpus|) exchange in the
        # round plan) is gone; `seen_active` only feeds the no-filters
        # bootstrap path.
        prev_chain = self.store.latest_blob_chain()
        seen_active = (
            seen.filter(F.col("seen_round") >= round_no - self.ttl_rounds)
            if self.ttl_rounds is not None
            else seen
        )
        fresh = seen_filter_pipeline_files(
            cands, seen_active, prev_chain, n_shards=N_SHARDS,
            layer="cuckoo" if self.ttl_rounds is not None else "bloom",
            seen_unique=True,  # one row per hash by construction
            exact_files=True,
        ).cache()

        is_listing = F.col("url_norm").rlike(r"\?page=")
        new_frontier = fresh.select(
            "url_norm", "url_hash", "host",
            F.concat(F.lit("/"), F.regexp_extract("url_norm", r"^https?://[^/]+/(.*)$", 1)).alias("path"),
            F.when(is_listing, F.concat(F.lit("listing:"), F.col("host")))
            .otherwise(F.concat(F.lit("detail:"), F.col("url_hash"))).alias("seed_id"),
            self._priority_expr(
                F.col("host"),
                F.when(is_listing, F.lit(PRIORITY_LISTING)).otherwise(F.lit(PRIORITY_DETAIL)),
            ).alias("priority"),
            F.lit(round_no + 1).cast("long").alias("scheduled_ms"),
            F.lit(0).alias("attempt"),
            F.lit(round_no + 1).cast("long").alias("not_before"),
            F.col("depth"),
        )

        # ---- retry routing (R4/R5)
        failures = fetched.filter(
            F.col("status_code").isNotNull() & (F.col("status_code") != 200)
        ).withColumn("error_category", classify_http_col(F.col("status_code")))
        retryable = failures.filter(
            is_retryable_col(F.col("error_category")) & (F.col("attempt") + 1 < MAX_ATTEMPTS)
        )
        # R3 Retry-After override: the server's value (in rounds) wins over
        # the attempt-based backoff (retry_policy.py:519-748 precedence)
        backoff_rounds = F.coalesce(
            F.expr("try_cast(retry_after AS long)"), (F.col("attempt") + 1).cast("long")
        )
        retries = retryable.select(
            "url_norm", "url_hash", "host", "path", "seed_id", "priority",
            "scheduled_ms",
            (F.col("attempt") + 1).cast("int").alias("attempt"),
            (F.lit(round_no) + backoff_rounds).cast("long").alias("not_before"),
            "depth",
        )
        to_dlq = failures.filter(
            is_retryable_col(F.col("error_category")) & (F.col("attempt") + 1 >= MAX_ATTEMPTS)
        ).select(
            "url_norm", "host", "error_category",
            (F.col("attempt") + 1).cast("int").alias("attempt"),
            F.lit(round_no).alias("failed_round"),
        )
        # R5 audit: one retry_history row per routing decision — the
        # reference's record_retry_attempt (job_retry_handler.py:162-208)
        # as a projection of the SAME failure set the routing above consumes,
        # so history(action='retry') == recirculated attempts by construction.
        retryable_now = is_retryable_col(F.col("error_category")) & (
            F.col("attempt") + 1 < MAX_ATTEMPTS
        )
        exhausted = is_retryable_col(F.col("error_category")) & (
            F.col("attempt") + 1 >= MAX_ATTEMPTS
        )
        new_history = failures.select(
            "url_hash", "url_norm", "host",
            (F.col("attempt") + 1).cast("int").alias("attempt_number"),
            "error_category",
            F.when(retryable_now, "retry")
            .when(exhausted, "dlq")
            .otherwise("drop").alias("action"),
            F.when(retryable_now, backoff_rounds)
            .otherwise(F.lit(0)).cast("long").alias("retry_delay_rounds"),
            F.when(retryable_now, F.lit(round_no) + backoff_rounds)
            .cast("long").alias("not_before"),
            F.lit(round_no).alias("decided_round"),
        )

        next_frontier = (
            held.unionByName(not_selected)
            .unionByName(retries)
            .unionByName(new_frontier)
        )
        seen_delta = fresh.select(
            "host", "url_hash", F.lit(round_no).cast("int").alias("seen_round")
        )
        next_seen = seen.unionByName(seen_delta)
        if self.ttl_rounds is not None:
            # compact: drop entries expired beyond any future window (Iceberg
            # row-level delete in production; keeps the table bounded)
            next_seen = next_seen.filter(
                F.col("seen_round") >= round_no - self.ttl_rounds
            )
        # Q1 latest-crawl-wins MERGE (crawled_page.sql:1-37): a TTL re-crawl
        # REPLACES the old page row instead of duplicating it; the append-only
        # fetch_log below keeps every attempt for the order invariant.
        # Without TTL a URL can never be re-fetched (permanent seen set), so
        # new page keys are provably fresh and a plain append suffices — the
        # MERGE's O(|pages|) shuffle is only paid when re-crawls exist (on
        # Iceberg, MERGE INTO touches matched files only either way).
        if self.ttl_rounds is not None:
            from crawler_spark.operators.merge import merge_latest_wins

            # fetch_order tiebreak: a retry row and a re-discovered row for
            # one URL can both be fetched in ONE round (same fetched_round);
            # the later fetch in round order wins deterministically
            next_pages = merge_latest_wins(
                pages, new_pages, keys=["host", "url_hash"],
                order_col="fetched_round", tiebreak_cols=["fetch_order"],
            )
        else:
            next_pages = pages.unionByName(new_pages)
        log_delta = fetched.filter(F.col("status_code").isNotNull()).select(
            "url_hash", "url_norm", "host",
            F.col("status_code").cast("int"),
            F.lit(round_no).alias("fetched_round"),
            F.col("fetch_order").cast("int"),
        )

        # driver action 2: EVERY per-round metric in ONE job — a cross join
        # of one-row aggregates over the cached stage outputs (r01 ran 8+
        # separate count() jobs here; round fixed cost is the engine's unit
        # economics, see BENCH/BASELINE.md)
        stats = (
            flagged.agg(
                F.count("*").alias("n_due"),
                F.sum(F.when(~F.col("robots_ok"), 1).otherwise(0)).alias("n_rx"),
            )
            .crossJoin(selected.agg(F.count("*").alias("n_selected")))
            .crossJoin(
                fetched.agg(
                    F.count(F.when(F.col("status_code").isNotNull(), 1)).alias("n_fetched"),
                    F.count(F.when(F.col("status_code") == 200, 1)).alias("n_ok"),
                    F.count(
                        F.when(F.col("stopped") & F.col("status_code").isNull(), 1)
                    ).alias("n_chain_stopped"),
                )
            )
            .crossJoin(cands.agg(F.count("*").alias("n_cands")))
            .crossJoin(fresh.agg(F.count("*").alias("n_new_urls")))
            .crossJoin(retries.agg(F.count("*").alias("n_retry")))
            .crossJoin(to_dlq.agg(F.count("*").alias("n_dlq")))
            .crossJoin(
                suppressed_dim.agg(F.count("*").alias("n_breaker_hosts"))
                if suppressed_dim is not None
                else spark.range(1).select(F.lit(0).alias("n_breaker_hosts"))
            )
            .crossJoin(
                trap_flags.agg(F.count("*").alias("n_trap_templates"))
                if trap_flags is not None
                else spark.range(1).select(F.lit(0).alias("n_trap_templates"))
            )
            .crossJoin(
                not_modified.agg(F.count("*").alias("n_not_modified"))
                if not_modified is not None
                else spark.range(1).select(F.lit(0).alias("n_not_modified"))
            )
            .crossJoin(
                adaptive_dropped.agg(
                    F.count("*").alias("n_adaptive_deferred")
                )
                if adaptive_dropped is not None
                else spark.range(1).select(
                    F.lit(0).alias("n_adaptive_deferred")
                )
            )
            .crossJoin(
                obs_delta.agg(F.count("*").alias("n_revisits"))
                if obs_delta is not None
                else spark.range(1).select(F.lit(0).alias("n_revisits"))
            )
        ).first()
        metrics = {
            "n_due": int(stats["n_due"]),
            "n_robots_excluded": int(stats["n_rx"] or 0),
            "n_selected": int(stats["n_selected"]),
            "n_fetched": int(stats["n_fetched"]),
            "n_ok": int(stats["n_ok"]),
            "n_chain_stopped": int(stats["n_chain_stopped"]),
            "n_new_urls": int(stats["n_new_urls"]),
            "n_dup_dropped": int(stats["n_cands"]) - int(stats["n_new_urls"]),
            "n_retry": int(stats["n_retry"]),
            "n_dlq": int(stats["n_dlq"]),
        }
        if self.breaker is not None:
            metrics["n_breaker_hosts"] = int(stats["n_breaker_hosts"])
        if self.trap_max_urls is not None:
            metrics["n_trap_templates"] = int(stats["n_trap_templates"])
        if not_modified is not None:
            metrics["n_not_modified"] = int(stats["n_not_modified"])
        if self.adaptive_ttl is not None:
            metrics["n_adaptive_deferred"] = int(stats["n_adaptive_deferred"])
            metrics["n_revisits"] = int(stats["n_revisits"])
        # Iceberg-style commit: append-only tables write ONLY this round's
        # delta (fast-append), the frontier commits merge-on-read (adds
        # delta + equality-delete keys), and TTL-mode pages commit
        # merge-on-read too (version-append deltas + the latest-wins read
        # policy) — per-round IO is O(delta) regardless of crawl age for
        # EVERY corpus-sized table, INCLUDING TTL-mode seen: row expiry is
        # an advancing manifest floor on seen_round (drop-partition
        # analogue), so the table commits only the round's fresh cohort and
        # aged cohorts are reclaimed at the rotation fold.
        #
        # STAGGERED compaction (rewrite_data_files spread over rounds):
        # folding every chain on the modulo round made that round's wall
        # time O(store) while its neighbours wrote O(delta). Instead each
        # round folds at most ONE table chain (the longest; chains <= 1
        # have nothing to fold) and ONE cohort of filter shards
        # (least-recently-folded, tracked by `full-<s>` markers in the
        # chain elements), so per-round maintenance is O(store /
        # REBUILD_EVERY) and max-round wall ~= median. The chain-length
        # backstop is unchanged in spirit: any table chain reaching
        # REBUILD_EVERY folds THIS round regardless of rotation (quiet
        # rounds can starve a slot; the bound holds on the chain itself).
        rotation = ["frontier", "pages", "fetch_log", "dlq", "retry_history"]
        # seen rotates in BOTH modes now: TTL expiry is an advancing
        # manifest-level floor (Iceberg's drop-partition analogue for a
        # table partitioned by seen_round — O(1) metadata per round, reads
        # partition-pruned to the window), so TTL rounds commit O(delta)
        # seen deltas and the fold slot is when aged round-partitions
        # physically leave disk
        rotation.insert(1, "seen")
        if (
            self.trap_max_urls is not None
            and self.store.table_path("url_templates") is not None
        ):
            rotation.append("url_templates")
        if (
            self.adaptive_ttl is not None
            and self.store.table_path("change_stats") is not None
        ):
            rotation.append("change_stats")
        chain_lens = {t: self.store.chain_length(t) for t in rotation}
        # the forced-fold bound must exceed the rotation length or the
        # one-per-round cadence can't keep up and every table hits the
        # backstop in the same round — the exact mass-fold spike staggering
        # removes. In steady state chains cycle 1..len(rotation) and at
        # most one table per round touches the bound.
        fold_bound = max(self.REBUILD_EVERY, len(rotation) + 1)
        fold_tables = {
            t for t, n in chain_lens.items() if n >= fold_bound
        }
        if not fold_tables:
            longest = max(rotation, key=lambda t: chain_lens[t])
            if chain_lens[longest] > 1:
                fold_tables = {longest}
        # driver action 3: shard maintenance. BOTH modes append a DELTA blob
        # dir holding only this round's fresh keys (merge-on-read chain,
        # newest-first probe walk) — per-round blob IO is O(delta), not
        # O(|filter store|). TTL deltas additionally carry the expiring
        # cohort as immutable `tomb-<s>` tombstone pair files (probe
        # resolves a tombstoned key definitely-unseen), so TTL's per-round
        # write is O(fresh + cohort), never O(active window). Alongside the
        # delta, the round writes a FOLD element rebuilding one shard
        # cohort (1/REBUILD_EVERY of the store) from the seen table with
        # authoritative `full-<s>` markers; trim_blob_chain drops elements
        # older than full marker coverage, so the chain stays bounded —
        # steady state is 2*REBUILD_EVERY elements (one fold + one delta
        # per round, trimmed at cohort coverage); the full-rebuild
        # backstop sits ABOVE that (3*REBUILD_EVERY) so it only fires for
        # genuinely starved chains (enqueue-only streaks), never on the
        # steady-state cadence — no periodic O(store) blob round.
        # prev_chain None with a non-empty seen table (e.g. an external
        # actor expired every blob dir) forces the one remaining full
        # rebuild: building from this round's fresh keys alone and
        # committing them as authoritative would break the seen-set
        # invariant. An over-long chain (folds starved by enqueue-only
        # rounds) is the other full-rebuild backstop.
        out_dir = self.store.blob_dir_for(round_no)
        if prev_chain is None or len(prev_chain) >= 3 * self.REBUILD_EVERY:
            base = (
                next_seen.filter(
                    F.col("seen_round") >= round_no + 1 - self.ttl_rounds
                )
                if self.ttl_rounds is not None
                else next_seen
            )
            update_seen_shards(
                base.select("host", "url_hash"), blob_dir=None,
                n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                full_markers=True,
            ).collect()
            blob_chain = [out_dir]
        else:
            from crawler_spark.operators.seenset import with_shard_and_key

            # (a) the staggered cohort fold: full membership of the
            # least-recently-folded cohort, as of round START (this round's
            # fresh keys stay in the newer delta element)
            cohort = self._next_fold_cohort(prev_chain)
            fold_dir = self.store.blob_fold_dir_for(round_no)
            fold_src = (
                seen.filter(
                    F.col("seen_round") >= round_no + 1 - self.ttl_rounds
                )
                if self.ttl_rounds is not None
                else seen
            )
            fold_src = (
                with_shard_and_key(fold_src, n_shards=N_SHARDS)
                .filter(F.col("shard").isin(cohort))
                .select("host", "url_hash")
            )
            update_seen_shards(
                fold_src, blob_dir=None, n_shards=N_SHARDS,
                out_dir=fold_dir, with_exact=True, delta_build=True,
                full_markers=True, shards=cohort,
            ).collect()
            chain = prev_chain + [fold_dir]
            # (b) the round's delta element (fresh keys + TTL tombstones)
            if self.ttl_rounds is not None:
                deletes = seen.filter(
                    F.col("seen_round") == round_no - self.ttl_rounds
                ).select("host", "url_hash")
                has_dels = deletes.limit(1).count() > 0
                if metrics["n_new_urls"] == 0 and not has_dels:
                    out_dir = None
                else:
                    update_seen_shards(
                        fresh.select("host", "url_hash"), blob_dir=None,
                        deletes=deletes if has_dels else None,
                        n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                        delta_build=True,
                    ).collect()
                    chain = chain + [out_dir]
            elif metrics["n_new_urls"] == 0:
                # nothing fresh: an empty delta would grow the chain (and
                # the probe fan-in) without adding any membership
                out_dir = None
            else:
                update_seen_shards(
                    fresh.select("host", "url_hash"), blob_dir=None,
                    n_shards=N_SHARDS, out_dir=out_dir, with_exact=True,
                    delta_build=True,
                ).collect()
                chain = chain + [out_dir]
            blob_chain = trim_blob_chain(chain, N_SHARDS)
        full: dict[str, DataFrame] = {}
        delta: dict[str, DataFrame] = {}
        if "frontier" in fold_tables:
            # resolve the merge-on-read chains to one full snapshot + empty
            # delete set (rewrite_data_files + delete-file compaction)
            full["frontier"] = next_frontier
            full["frontier_dels"] = self._empty_frontier_dels()
        else:
            # merge-on-read commit: adds = this round's retries + fresh URLs;
            # equality-delete keys = the rows this round CONSUMED (selected
            # for fetch, or robots-excluded for good). Per-round frontier IO
            # is O(delta) — previously the one remaining full-table rewrite.
            delta["frontier"] = retries.unionByName(new_frontier)
            round_dels = flagged.filter(~F.col("robots_ok")).select(
                *FRONTIER_ROW_KEY
            ).unionByName(selected.select(*FRONTIER_ROW_KEY))
            if self.store.table_path("frontier_dels") is None:
                # first commit after upgrading a pre-merge-on-read store:
                # give the dels chain a full terminal snapshot so chain
                # reads and snapshot expiry have a base to resolve to
                full["frontier_dels"] = round_dels
            else:
                delta["frontier_dels"] = round_dels
        # output-file sizing hints from the metrics already computed above +
        # manifest footer stats — a few-hundred-row delta writes ONE file,
        # not defaultParallelism near-empty ones (file-count growth is what
        # would make chain reads slow as the crawl ages); at production
        # counts the same hints yield genuinely parallel writes
        n_failed = metrics["n_fetched"] - metrics["n_ok"]
        standing = []
        if self.trap_max_urls is not None:
            standing.append("url_templates")
        if self.adaptive_ttl is not None:
            standing.append("change_stats")
        prev_rows = self.store.table_rows_many(
            ["seen", "pages", "dlq", "fetch_log", "retry_history", *standing]
        )  # ONE manifest read for every hint, standing tables included
        hints = {
            "frontier": (
                max(
                    1,
                    metrics["n_due"] - metrics["n_selected"]
                    + metrics["n_retry"] + metrics["n_new_urls"],
                )
                if "frontier" in fold_tables
                else max(1, metrics["n_retry"] + metrics["n_new_urls"])
            ),
            "frontier_dels": (
                1 if "frontier" in fold_tables
                else max(1, metrics["n_selected"] + metrics["n_robots_excluded"])
            ),
            "seen": prev_rows["seen"] + metrics["n_new_urls"],
            "pages": prev_rows["pages"] + metrics["n_ok"],
            "dlq": prev_rows["dlq"] + metrics["n_dlq"],
            "fetch_log": prev_rows["fetch_log"] + metrics["n_fetched"],
            "retry_history": prev_rows["retry_history"] + n_failed,
        }
        if "seen" in fold_tables:
            # the rotation fold (or permanent-mode backstop): under TTL
            # this is the drop-partition moment — next_seen is already
            # window-filtered, so aged cohorts physically leave disk here
            full["seen"] = next_seen
        elif self.ttl_rounds is not None and metrics["n_new_urls"] == 0:
            # nothing fresh: expiry is entirely the floor advance below —
            # an empty delta would grow the chain without adding membership
            pass
        else:
            delta["seen"] = seen_delta
            hints["seen"] = metrics["n_new_urls"]
        base_refs: dict[str, dict[str, Any]] = {}
        if "pages" in fold_tables:
            # FILE-LEVEL fold (rewrite_data_files-with-filter): pages IS
            # the corpus, so a full-table fold is a full-corpus rewrite at
            # 100 TB. plan_file_fold splits the terminal snapshot by the
            # per-file url_hash bloom sidecar probed with the chain
            # deltas' claimed keys: only files that MAY hold a superseded
            # version are rewritten (plus the deltas themselves); the rest
            # fold by reference — fold bytes ∝ superseded-version files,
            # not |pages|, on a corpus where most pages never re-crawl.
            plan = self.store.plan_file_fold(spark, "pages", "url_hash")
            if plan is not None:
                affected = spark.read.option("mergeSchema", "true").parquet(
                    *plan["rewrite_paths"]
                )
                if self.ttl_rounds is not None:
                    from crawler_spark.operators.merge import merge_latest_wins

                    # every version of every claimed key is in the rewrite
                    # set (bloom has no false negatives), so resolving the
                    # affected subset alone is exact
                    full["pages"] = merge_latest_wins(
                        affected, new_pages, keys=["host", "url_hash"],
                        order_col="fetched_round",
                        tiebreak_cols=["fetch_order"],
                    )
                else:
                    full["pages"] = affected.unionByName(
                        new_pages, allowMissingColumns=True
                    )
                base_refs["pages"] = {
                    "files": plan["keep_files"], "unique": True,
                }
                hints["pages"] = max(
                    1, plan["rewrite_rows"] + metrics["n_ok"]
                )
            else:
                # no sidecar / nothing keepable: the plain full fold
                full["pages"] = next_pages
        else:
            # TTL included: re-crawled rows APPEND a newer version; the
            # read policy resolves latest-wins, the rotation fold compacts
            delta["pages"] = new_pages
            hints["pages"] = metrics["n_ok"]
        if "dlq" in fold_tables:
            full["dlq"] = dlq.unionByName(to_dlq)
        else:
            delta["dlq"] = to_dlq
            hints["dlq"] = metrics["n_dlq"]
        if "fetch_log" in fold_tables:
            full["fetch_log"] = fetch_log.unionByName(log_delta)
        else:
            delta["fetch_log"] = log_delta
            hints["fetch_log"] = metrics["n_fetched"]
        if "retry_history" in fold_tables:
            prev_hist = self.store.read(spark, "retry_history")
            full["retry_history"] = (
                prev_hist.unionByName(new_history)
                if prev_hist is not None else new_history
            )
        else:
            delta["retry_history"] = new_history
            hints["retry_history"] = n_failed
        if self.trap_max_urls is not None:
            # standing template counts: one O(#templates-in-delta) append per
            # round; readers SUM per (host, template) across the chain.
            # Compaction folds the chain even on rounds with no fresh URLs —
            # gating the fold on the delta would let quiet compaction slots
            # skip it and the chain grow past REBUILD_EVERY.
            tmpl_delta = (
                fresh.groupBy("host", "path_template")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .withColumn("round", F.lit(round_no).cast("int"))
                if metrics["n_new_urls"] > 0
                else None
            )
            prev_exists = self.store.table_path("url_templates") is not None
            if "url_templates" in fold_tables and prev_exists:
                prev_tmpl = self.store.read(spark, "url_templates")
                merged = (
                    prev_tmpl.unionByName(tmpl_delta)
                    if tmpl_delta is not None
                    else prev_tmpl
                )
                full["url_templates"] = (
                    merged.groupBy("host", "path_template")
                    .agg(F.sum("n").alias("n"))
                    .withColumn("round", F.lit(round_no).cast("int"))
                )
                # the fold rewrites the WHOLE standing table: size its file
                # count from the chain's row total (a quiet compaction slot
                # must not funnel the table through one partition)
                hints["url_templates"] = max(
                    1, prev_rows["url_templates"] + metrics["n_new_urls"] // 64
                )
            elif tmpl_delta is not None:
                if prev_exists:
                    delta["url_templates"] = tmpl_delta
                else:
                    full["url_templates"] = tmpl_delta
                hints["url_templates"] = max(1, metrics["n_new_urls"] // 64)
        if self.adaptive_ttl is not None:
            # change_stats commits like url_templates: O(delta) appends of
            # this round's observations, read-time SUM, compaction folds the
            # chain to one (url_hash, obs, changed, last-round) row set —
            # and folds even on rounds with no revisits, so quiet compaction
            # slots cannot let the chain grow past REBUILD_EVERY
            n_rev = metrics.get("n_revisits", 0)
            cs_delta = obs_delta if n_rev > 0 else None
            prev_cs = self.store.table_path("change_stats") is not None
            if "change_stats" in fold_tables and prev_cs:
                prev_stats = self.store.read(spark, "change_stats")
                merged = (
                    prev_stats.unionByName(cs_delta)
                    if cs_delta is not None
                    else prev_stats
                )
                full["change_stats"] = merged.groupBy("url_hash").agg(
                    F.sum("obs").alias("obs"),
                    F.sum("changed").alias("changed"),
                    F.max("round").cast("int").alias("round"),
                )
                # fold rewrites the whole table: size from chain rows
                hints["change_stats"] = max(
                    1, prev_rows["change_stats"] + n_rev
                )
            elif cs_delta is not None:
                if prev_cs:
                    delta["change_stats"] = cs_delta
                else:
                    full["change_stats"] = cs_delta
                hints["change_stats"] = max(1, n_rev)  # one row per revisit
        if self.log_feed and metrics["n_fetched"] > 0:
            import os

            # Under an audited (WAP) round the feed is part of the staged
            # state: write it OUTSIDE the consumer's `_logfeed/feed-*` glob
            # and let run_round_audited move it in on publish / delete it on
            # veto — otherwise a rolled-back round's fetch events would reach
            # the streaming reader, violating the "indistinguishable from a
            # round that never ran" contract.
            feed_parent = (
                "_logfeed_staging" if self._staging_branch else "_logfeed"
            )
            log_delta.coalesce(
                max(1, min(metrics["n_fetched"] // SnapshotStore.ROWS_PER_FILE + 1, 64))
            ).write.mode("overwrite").parquet(
                os.path.join(self.store.root, feed_parent, f"feed-{round_no:05d}")
            )
        self.store.commit_round(
            round_no, full, metrics=metrics, blob_dir=out_dir,
            blob_chain=blob_chain, delta_tables=delta, row_hints=hints,
            branch=self._staging_branch,
            file_index=self.file_index,
            base_refs=base_refs or None,
            # folds range-cluster pages on the policy key (Iceberg's write
            # sort order): files get tight DISJOINT key ranges, so the NEXT
            # file-level fold's affected set tracks claimed-key locality
            # instead of every file bloom-admitting some claimed key —
            # the sorted-write exchange is paid only at fold cadence
            cluster_by=(
                {"pages": ["host", "url_hash"]} if "pages" in full else None
            ),
            # TTL row expiry = advancing this floor (metadata-only): every
            # read of seen prunes to seen_round >= round - ttl, exactly the
            # window the old per-round full rewrite materialized
            floors=(
                {"seen": ("seen_round", round_no - self.ttl_rounds)}
                if self.ttl_rounds is not None
                else None
            ),
        )
        flagged.unpersist()
        selected.unpersist()
        fetched.unpersist()
        parsed.unpersist()
        cands.unpersist()
        if adaptive_dropped is not None:
            # adaptive_dropped/cands are filters over the cached joined
            # frame; releasing the parent releases both branches
            joined.unpersist()
        if obs_delta is not None:
            obs_delta.unpersist()
        fresh.unpersist()
        if suppressed_dim is not None:
            suppressed_dim.unpersist()
        if with_rd is not None:
            with_rd.unpersist()
        if trap_flags is not None:
            trap_flags.unpersist()
        if not_modified is not None:
            not_modified.unpersist()
        return metrics

    # ------------------------------------------------------------- the loop

    def run(
        self,
        seeds: list[str] | None = None,
        max_rounds: int = 20,
        audit_gate=None,
    ) -> list[dict]:
        """Run (or RESUME — the checkpoint gate) until the frontier drains.

        Cancellation (S8, worker.py:269-283 semantics): the flag is polled
        BETWEEN rounds — the in-flight round commits atomically, nothing is
        half-written, and a later run() resumes from the cancelled point.

        audit_gate: when set, every round commits write-audit-publish
        (run_round_audited). A VETOED round stops the loop — its snapshot
        was rolled back, so continuing would re-crawl the same frontier
        under the next round number; the operator fixes the cause and a
        later run() resumes at the vetoed round."""
        if not self.store.manifest()["rounds"]:
            if seeds is None:
                raise ValueError("fresh store needs seeds")
            self.init_frontier(seeds)
        if self.log_feed:
            # finish/clean any staged feed a crashed audited run left behind,
            # even when THIS run is unaudited
            self._reconcile_staged_feeds()
        start = self.store.latest_round() + 1
        out = []
        for rnd in range(start, start + max_rounds):
            if self.is_cancelled():
                out.append({"round": rnd, "cancelled": True})
                break
            if audit_gate is not None:
                m = self.run_round_audited(rnd, audit_gate)
            else:
                m = self.run_round(rnd)
            out.append({"round": rnd, **m})
            if m.get("published") is False or m.get("done"):
                break
        return out

    # -------------------------------------------------------- cancellation

    @property
    def _cancel_path(self) -> str:
        import os

        return os.path.join(self.store.root, "_CANCEL")

    def request_cancel(self) -> None:
        """S8 cancel flag — a control-table write any process can issue."""
        with open(self._cancel_path, "w") as fh:
            fh.write("cancelled")

    def clear_cancel(self) -> None:
        import os

        if os.path.exists(self._cancel_path):
            os.remove(self._cancel_path)

    def is_cancelled(self) -> bool:
        import os

        return os.path.exists(self._cancel_path)

    # ------------------------------------------------------------ reporting

    _in_round = False  # reporting-path guard flag (set by run_round)

    def _assert_reporting_path(self, name: str) -> None:
        """The reporting methods below COLLECT full tables to the driver —
        test/verification-only paths, sized for fixtures. Calling one inside
        a superstep would smuggle a driver-collect into the hot path; refuse
        loudly instead (pinned by tests/test_plan_audit.py)."""
        if self._in_round:
            raise RuntimeError(
                f"{name}() is a driver-collect reporting path and must never "
                "run inside run_round() — use the snapshot tables instead"
            )

    def _next_fold_cohort(self, chain: list[str]) -> list[int]:
        """The least-recently-folded shard cohort (shards s with s %
        REBUILD_EVERY == c), derived statelessly from the chain's
        `full-<s>` markers: for each cohort, the newest element index that
        marked it; the cohort whose newest marker is oldest folds next.
        Robust to round-number gaps (enqueue/drain rounds consume numbers
        without folding), unlike a round-modulo slot."""
        import os as _os

        k = self.REBUILD_EVERY
        age = {c: -1 for c in range(k)}
        for i, d in enumerate(chain):  # oldest .. newest
            try:
                names = _os.listdir(d)
            except OSError:
                continue
            for f in names:
                if f.startswith("full-"):
                    c = int(f[5:]) % k
                    age[c] = max(age[c], i)
        cohort_id = min(age, key=lambda c: (age[c], c))
        return [s for s in range(N_SHARDS) if s % k == cohort_id]

    def crawl_order(self) -> list[tuple[int, str, int, str]]:
        """(round, host, fetch_order, url_norm) for every successfully
        fetched page — THE order invariant compared against the simulator.
        Reads the append-only fetch_log (the pages table is latest-wins
        merged, so re-crawled rows are replaced there, Q1)."""
        self._assert_reporting_path("crawl_order")
        log = self.store.read(self.spark, "fetch_log")
        rows = (
            log.filter(F.col("status_code") == 200)
            .select("fetched_round", "host", "fetch_order", "url_norm")
            .toLocalIterator()  # streams partitions; no single driver blob
        )
        return sorted((r[0], r[1], r[2], r[3]) for r in rows)

    def seen_set(self) -> set[str]:
        self._assert_reporting_path("seen_set")
        it = self.store.read(self.spark, "seen").select("url_hash").toLocalIterator()
        return {r[0] for r in it}

    def retry_history(self) -> DataFrame:
        """R5 audit table (distributed — no collect): one row per failure
        routing decision across the whole crawl."""
        return self.store.read(self.spark, "retry_history")

    def seed_outcomes(self) -> DataFrame:
        """P5 per-seed outcome classification (seed_url_crawler.py:35-47 +
        862-910): aggregate fetch_log + pages per seed host into the
        reference's CrawlOutcome enum. Distributed aggregation — returns a
        DataFrame (seed_host, outcome, pages_crawled, urls_extracted).

        Mapping (reference branch -> log evidence):
          * seed_url_404      — the seed listing's FIRST fetch returned 404
          * seed_url_error    — first fetch failed with any other status
          * success_no_urls   — pages fetched fine but zero detail pages
          * partial_success   — URLs extracted but some fetches failed
            (reference: "URLs extracted but with warnings")
          * success           — all fetches ok, detail URLs found
        """
        log = self.store.read(self.spark, "fetch_log")
        # first fetch per host = the seed URL itself (fetch_log is append-only
        # and fetch_order is 1-based per host+round). A detail URL appearing
        # in the log AT ALL means it was extracted from a listing — so
        # urls_extracted = distinct non-listing URLs attempted, computable
        # identically by the pure-Python simulator (the equivalence gate).
        w = Window.partitionBy("host").orderBy("fetched_round", "fetch_order")
        ranked = log.withColumn("rk", F.row_number().over(w))
        is_detail = ~F.col("url_norm").rlike(r"\?page=")
        per_host = ranked.groupBy("host").agg(
            F.max(F.when(F.col("rk") == 1, F.col("status_code"))).alias("seed_status"),
            F.count(F.when(F.col("status_code") == 200, 1)).alias("pages_crawled"),
            F.count(F.when(F.col("status_code") != 200, 1)).alias("n_failed"),
            F.count_distinct(
                F.when(is_detail, F.col("url_norm"))
            ).alias("urls_extracted"),
        )
        outcome = (
            F.when(F.col("seed_status") == 404, "seed_url_404")
            .when(F.col("seed_status") != 200, "seed_url_error")
            .when(F.col("urls_extracted") == 0, "success_no_urls")
            .when(F.col("n_failed") > 0, "partial_success")
            .otherwise("success")
        )
        return per_host.select(
            F.col("host").alias("seed_host"),
            outcome.alias("outcome"),
            F.col("pages_crawled").cast("long"),
            F.col("urls_extracted").cast("long"),
        )

    def fetch_log_range(self, lo_round: int, hi_round: int) -> DataFrame:
        """Q8 log range scan against the LIVE store (the reference's
        month-partitioned crawl_log + btree range read,
        current_schema.sql:228-239, redis_cache.py:695-737) — expressed as
        manifest min/max file pruning instead of partition DDL: each round's
        fetch_log delta holds only that round's rows, so the fetched_round
        bounds recorded at commit time are tight per file and the read
        touches O(range) files no matter how old the crawl is (Iceberg's
        partition-pruning economics without a catalog). The residual filter
        stays on top: pruning is advisory, correctness never depends on it."""
        pred = [
            ("fetched_round", ">=", lo_round),
            ("fetched_round", "<=", hi_round),
        ]
        log = self.store.read(self.spark, "fetch_log", prune=pred)
        if log is None:
            raise ValueError(
                "fetch_log_range: store has no fetch_log commits yet"
            )
        return log.filter(
            (F.col("fetched_round") >= lo_round)
            & (F.col("fetched_round") <= hi_round)
        )

    def page_lookup(self, url_hash: str) -> DataFrame:
        """GetPageByURLHash (sql/queries/crawled_page.sql:43, served by the
        btree ix_crawled_page_url_hash, current_schema.sql:1441-1444) as a
        point lookup on the snapshot store: when the engine was built with
        file_index={'pages': ['url_hash']}, the per-file blooms prune the
        chain to O(1) files — min/max bounds can't skip anything for a
        uniformly-distributed hash key, which is exactly why the reference
        needs a btree there. Without the index this degrades to a full-chain
        filter (pruning is always advisory; the real filter stays on top)."""
        pred = [("url_hash", "==", url_hash)]
        pages = self.store.read(self.spark, "pages", prune=pred)
        if pages is None:
            raise ValueError("page_lookup: store has no pages commits yet")
        return pages.filter(F.col("url_hash") == url_hash)
