"""Ready-made audit gates for write-audit-publish rounds.

Each factory returns a `gate(engine, round_no) -> bool` for
`CrawlEngine.run_round_audited`: the gate inspects the STAGED state (the
round as-if-published, via SnapshotStore.read_staged) and decides whether
the round's snapshot becomes visible. These are the data-quality checks the
reference runs inline during persistence (result_persistence.py dedup
marking, seed_url_crawler.py outcome classification) re-expressed as commit
gates — the Iceberg WAP pattern lets them VETO a round instead of merely
logging it.

Gates run driver-side between rounds; each costs one or two small Spark
actions over the round's delta (never a full-table scan at 10^10 — every
filter below prunes to `fetched_round == round_no`, a partition predicate
on a day/round-partitioned Iceberg table).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

Gate = Callable[[object, int], bool]


def duplicate_rate_gate(max_ratio: float) -> Gate:
    """Veto a round whose NEW pages are more than `max_ratio` duplicates by
    content hash — the canary for a crawl stuck in a pagination loop or a
    host serving one error page for every URL (the reference's stop
    detector catches the per-chain case; this is the round-level circuit
    breaker)."""

    def gate(engine, round_no: int) -> bool:
        pages = engine.store.read_staged(engine.spark, "pages")
        if pages is None:
            return True
        row = (
            pages.filter(F.col("fetched_round") == round_no)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("content_sha256").alias("n_distinct"),
            )
            .collect()[0]
        )
        if row["n"] == 0:
            return True
        return 1.0 - row["n_distinct"] / row["n"] <= max_ratio

    return gate


def monotonic_tables_gate() -> Gate:
    """Append-only tables must never shrink across a round: staged row
    counts >= committed row counts for fetch_log/dlq/retry_history, plus
    'seen' on permanent-membership engines. Under TTL (engine.ttl_rounds
    set) 'seen' is windowed and shrinks by design, so it is exempt there —
    a partial 'seen' snapshot on a TTL crawl is NOT caught by this gate.
    Catches a commit that accidentally wrote a FULL snapshot from a partial
    DataFrame (the silent-data-loss failure mode of snapshot stores).
    Manifest metadata only — zero data IO."""

    def gate(engine, round_no: int) -> bool:
        staged = engine.store.staged_entry()
        if staged is None:
            return True
        man_rounds = engine.store.manifest()["rounds"]
        tables = ["seen", "fetch_log", "dlq", "retry_history"]
        if getattr(engine, "ttl_rounds", None) is not None:
            # windowed membership: 'seen' retires cohorts every round, so it
            # shrinks BY DESIGN whenever retirements outnumber new URLs —
            # enforcing monotonicity there would veto every legitimate TTL
            # round (and re-running reproduces the shrink: a deadlock).
            tables.remove("seen")
        for t in tables:
            info = staged["tables"].get(t)
            if info is None:  # metrics-only or delta-untouched table
                continue
            committed = engine.store._chain_rows(
                engine.store._live_chain(man_rounds, t)
            )
            if info.get("mode", "full") == "delta":
                continue  # a delta can only add rows
            if info.get("rows", 0) + info.get("base_rows", 0) < committed:
                return False
        return True

    return gate


def span_sample_gate(k: int = 5) -> Gate:
    """Re-parse `k` of the round's staged pages with the single-row kernel
    and assert span-sequence equality (kind, text, media_ref, offset) — the
    input_hint's per-row invariant, enforced AT COMMIT TIME on a sample.
    The deterministic sample (first k by url_hash) keeps the audit
    reproducible across retries."""

    def gate(engine, round_no: int) -> bool:
        from crawler_spark.kernels.htmlparse import extract_page

        pages = engine.store.read_staged(engine.spark, "pages")
        if pages is None:
            return True
        sample = (
            pages.filter(F.col("fetched_round") == round_no)
            .select("url_hash", "raw_html", "spans")
            .orderBy("url_hash")
            .limit(k)
            .collect()
        )
        for r in sample:
            expected = extract_page(r.raw_html)["spans"]
            got = [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
            if got != expected:
                return False
        return True

    return gate


def all_of(*gates: Gate) -> Gate:
    """Conjunction combinator — evaluates in order, short-circuits on the
    first veto (cheapest gates first)."""

    def gate(engine, round_no: int) -> bool:
        return all(g(engine, round_no) for g in gates)

    return gate
