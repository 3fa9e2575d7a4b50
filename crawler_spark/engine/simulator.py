"""Pure-Python reference simulator for scheduler equivalence (SURVEY.md §5.3).

Replays the EXACT superstep semantics of engine/superstep.py — same kernels
(urlnorm, htmlparse, robots, StopDetector), same invariants (S1 score, budget
rank with url_hash tiebreak, enqueue==seen, retry recirculation, chain stop)
— but as a sequential loop with zero Spark. The north-rule gate asserts:

    engine.crawl_order() == simulate(...).crawl_order
    engine.seen_set()    == simulate(...).seen

i.e. the distributed plan's crawl order and URL-seen set are bit-identical
to the single-threaded reference execution, under any parallelism.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from crawler_spark.kernels.htmlparse import extract_page
from crawler_spark.kernels.pagination import StopDetector
from crawler_spark.kernels.robots import RobotsPolicy, parse_robots
from crawler_spark.kernels.urlnorm import (
    canonical_host,
    normalize_url,
    registered_domain,
    resolve_relative,
)

PRIORITY_LISTING = 7
PRIORITY_DETAIL = 5
MAX_ATTEMPTS = 3
SCOPE_RE = re.compile(r"/putusan")
RETRYABLE_STATUS = {429, 408}  # plus 5xx, see _retryable


def _retryable(status: int) -> bool:
    return status in RETRYABLE_STATUS or 500 <= status < 600


@dataclass
class SimResult:
    crawl_order: list[tuple[int, str, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    dlq: list[tuple[str, int]] = field(default_factory=list)
    robots_excluded: list[str] = field(default_factory=list)
    rounds: int = 0
    # every fetch ATTEMPT in execution order: (round, host, url_norm, status)
    # — the fetch_log analogue (failures included; stop-consumed rows are not
    # fetched and do not appear)
    fetch_attempts: list[tuple[int, str, str, int]] = field(default_factory=list)
    # every retry recirculation decision: (url_norm, attempt_number) — the
    # retry_history(action='retry') analogue
    retries: list[tuple[str, int]] = field(default_factory=list)
    # circuit-breaker suppressions: (round, host) for every host that had
    # due rows but was held at budget 0 — matches the engine's
    # n_breaker_hosts metric per round
    breaker_events: list[tuple[int, str]] = field(default_factory=list)
    # crawl-trap state: flagged (host, template) pairs per round — matches
    # the engine's n_trap_templates metric; final cumulative counts mirror
    # the url_templates table
    trap_flags_by_round: dict[int, set[tuple[str, str]]] = field(
        default_factory=dict
    )
    template_counts: dict[tuple[str, str], int] = field(default_factory=dict)
    # conditional re-crawl: (round, url_norm) for every 304 (body matched
    # the stored page; parse + merge skipped) — matches the engine's
    # n_not_modified metric per round
    not_modified: list[tuple[int, str]] = field(default_factory=list)
    # adaptive re-crawl: (round, url_hash) for every candidate dropped
    # because its change-rate interval had not elapsed — matches the
    # engine's n_adaptive_deferred metric per round (one event per unique
    # hash per round; the engine counts post-dedup rows). Final per-URL
    # (n_obs, n_changed, last_obs_round) mirrors the change_stats table.
    adaptive_deferrals: list[tuple[int, str]] = field(default_factory=list)
    change_stats: dict[str, tuple[int, int, int]] = field(default_factory=dict)
    # hash -> LAST enqueue round (res.seen is cumulative ever-seen; under
    # TTL the engine's compacted table is the ACTIVE window — compare it to
    # {h: r >= last_active_round - ttl} over this dict)
    seen_rounds: dict[str, int] = field(default_factory=dict)


def _mk_row(
    norm: str, priority: int, scheduled_ms: int, not_before: int, depth: int = 0
) -> dict:
    h = hashlib.sha256(norm.encode()).hexdigest()
    host = canonical_host(norm)
    m = re.match(r"^https?://[^/]+(/.*)?$", norm)
    path = m.group(1) or "/" if m else "/"
    is_listing = "?page=" in norm
    return {
        "url_norm": norm, "url_hash": h, "host": host, "path": path,
        "seed_id": f"listing:{host}" if is_listing else f"detail:{h}",
        "priority": priority, "scheduled_ms": scheduled_ms,
        "attempt": 0, "not_before": not_before, "depth": depth,
    }


def simulate(
    corpus: dict[str, tuple[int, str, str | None]],
    robots_by_host: dict[str, str],
    seeds: list[str],
    per_host_budget: int = 8,
    max_rounds: int = 20,
    user_agent: str = "lexi-spark",
    ttl_rounds: int | None = None,
    max_depth: int | None = None,
    domain_priority: dict[str, int] | None = None,
    breaker: tuple[float, int, int] | None = None,
    trap_max_urls: int | None = None,
    conditional_recrawl: bool = False,
    adaptive_ttl: int | None = None,
    corpus_updates: dict[int, dict[str, tuple[int, str, str | None]]] | None = None,
    domain_politeness: bool = False,
) -> SimResult:
    policies: dict[str, RobotsPolicy] = {
        h: parse_robots(t) for h, t in robots_by_host.items()
    }
    dom_prio = dict(domain_priority or {})
    res = SimResult()
    # The frontier is a MULTISET of rows (a list, removal by identity), not a
    # hash-keyed map: the engine's frontier table never dedups on url_hash —
    # enqueue dedup happens only through the seen set at extraction time —
    # so under TTL expiry a retry row and a re-discovered fresh row for the
    # same URL can legitimately coexist, and the simulator must mirror that.
    frontier: list[dict] = []
    seen_round: dict[str, int] = {}  # hash -> round last enqueued (TTL window)
    # conditional re-crawl: stored page bodies as of the LAST COMMITTED round
    # (the engine joins against the pages table read at round start);
    # within-round fetches buffer into a delta merged at round end
    page_body: dict[str, str] = {}
    if adaptive_ttl is not None and not conditional_recrawl:
        raise ValueError("adaptive_ttl requires conditional_recrawl")
    if adaptive_ttl is not None and adaptive_ttl < 1:
        raise ValueError("adaptive_ttl must be >= 1 round")
    # adaptive re-crawl: per-hash (n_obs, n_changed, last_obs_round) as of
    # the LAST COMMITTED round (the engine reads the change_stats chain at
    # candidate time); this round's observations buffer and merge at round
    # end, mirroring the snapshot-commit boundary
    change_stats: dict[str, tuple[int, int, int]] = {}
    corpus = dict(corpus)
    corpus_updates = corpus_updates or {}
    for u in seeds:
        norm = normalize_url(u)
        row = _mk_row(
            norm, dom_prio.get(canonical_host(norm), PRIORITY_LISTING), 0, 0, 0
        )
        frontier.append(row)
        res.seen.add(row["url_hash"])
        seen_round[row["url_hash"]] = -1

    def is_seen(h: str, rnd: int) -> bool:
        if h not in seen_round:
            return False
        if ttl_rounds is None:
            return True
        return seen_round[h] >= rnd - ttl_rounds

    for rnd in range(0, max_rounds):
        if rnd in corpus_updates:
            # round-boundary corpus churn (tests mutate engine.corpus at the
            # same boundary between run(max_rounds=1) calls)
            corpus.update(corpus_updates[rnd])
        if not frontier:
            break
        due = [r for r in frontier if r["not_before"] <= rnd]
        if not due:
            continue
        res.rounds = rnd + 1

        # robots gate — excluded rows leave the frontier permanently
        allowed: list[dict] = []
        for r in due:
            pol = policies.get(r["host"])
            if pol is None or pol.is_allowed(user_agent, r["path"]):
                allowed.append(r)
            else:
                res.robots_excluded.append(r["url_norm"])
                frontier.remove(r)

        # circuit breaker (mirrors superstep.py): a host whose 5xx rate in
        # any of the previous `cooldown` rounds reached `thr` over >=
        # `min_att` fetches is held at budget 0 this round; its rows stay
        # in the frontier untouched
        suppressed: set[str] = set()
        if breaker is not None and rnd > 0:
            thr, min_att, cooldown = breaker
            per_rh: dict[tuple[str, int], tuple[int, int]] = {}
            for r0, h0, _u, st in res.fetch_attempts:
                if rnd - cooldown <= r0 <= rnd - 1:
                    n, e = per_rh.get((h0, r0), (0, 0))
                    per_rh[(h0, r0)] = (n + 1, e + (1 if st >= 500 else 0))
            suppressed = {
                h0
                for (h0, _r0), (n, e) in per_rh.items()
                if n >= min_att and e / n >= thr
            }

        # crawl-trap flags: round-START snapshot of the standing counts
        # (mirrors superstep.py reading url_templates before the round)
        trap_flags: set[tuple[str, str]] = set()
        if trap_max_urls is not None:
            trap_flags = {
                key
                for key, n in res.template_counts.items()
                if n > trap_max_urls
            }
            res.trap_flags_by_round[rnd] = set(trap_flags)
        trap_delta: dict[tuple[str, str], int] = {}
        body_delta: dict[str, str] = {}
        obs_delta: dict[str, tuple[int, int]] = {}  # hash -> (obs, changed)
        deferred_this_round: set[str] = set()

        # per-host selection: rank by (S1 score, url_hash), crawl-delay budget
        by_host: dict[str, list[dict]] = {}
        for r in allowed:
            by_host.setdefault(r["host"], []).append(r)
        new_rows: list[dict] = []
        new_link_rows: dict[str, dict] = {}  # this round's link discoveries
        # organization-level budget split (mirrors superstep.py): live-host
        # counts per registrable domain from the due-and-allowed set AFTER
        # breaker suppression
        domain_hosts: dict[str, int] = {}
        if domain_politeness:
            for host in by_host:
                if host not in suppressed:
                    rd = registered_domain(host)
                    domain_hosts[rd] = domain_hosts.get(rd, 0) + 1
        for host in by_host:
            if host in suppressed:
                res.breaker_events.append((rnd, host))
                continue  # budget 0: rows remain in the frontier
            pol = policies.get(host)
            cd = pol.crawl_delay(user_agent) if pol else None
            budget = (
                min(per_host_budget, int(per_host_budget / cd))
                if cd and cd > 0
                else per_host_budget
            )
            if domain_politeness:
                nh = domain_hosts[registered_domain(host)]
                budget = min(budget, max(1, per_host_budget // nh))
            rows = sorted(
                by_host[host],
                key=lambda r: (
                    (10 - max(0, min(10, r["priority"]))) * 10**12 + r["scheduled_ms"],
                    r["url_hash"],
                ),
            )[:budget]
            detectors: dict[str, StopDetector] = {}
            stopped_chains: set[str] = set()
            for order, r in enumerate(rows, 1):
                frontier.remove(r)  # by identity — duplicates unaffected
                if r["seed_id"] in stopped_chains:
                    continue  # consumed, never fetched (chain ended this round)
                status, content, ra = corpus.get(r["url_norm"], (404, "", None))
                res.fetch_attempts.append((rnd, host, r["url_norm"], status))
                det = detectors.setdefault(r["seed_id"], StopDetector())
                stop, _reason = det.check(status, content or "", r["url_norm"])
                if stop:
                    stopped_chains.add(r["seed_id"])
                if status == 200:
                    res.crawl_order.append((rnd, host, order, r["url_norm"]))
                    page_links = None
                    if conditional_recrawl and ttl_rounds is not None:
                        stored = page_body.get(r["url_norm"])
                        if adaptive_ttl is not None and stored is not None:
                            # one change observation per re-fetch (304 or
                            # modified) — the engine's obs_delta row
                            n0, x0 = obs_delta.get(r["url_hash"], (0, 0))
                            obs_delta[r["url_hash"]] = (
                                n0 + 1,
                                x0 + (0 if stored[0] == content else 1),
                            )
                        if stored is not None and stored[0] == content:
                            # 304: parse and the page merge are skipped, but
                            # the STORED link set recirculates (body
                            # unchanged ⇒ links unchanged) — mirrors
                            # superstep.py's __stored_links union
                            res.not_modified.append((rnd, r["url_norm"]))
                            page_links = stored[1]
                    if page_links is None:
                        page = extract_page(content)
                        page_links = page["links"]
                        if conditional_recrawl and ttl_rounds is not None:
                            # within-round later fetch wins, matching the
                            # engine merge's fetch_order tiebreak
                            body_delta[r["url_norm"]] = (content, page_links)
                    for href, *_meta in page_links:
                        cand_depth = r["depth"] + 1
                        if max_depth is not None and cand_depth > max_depth:
                            continue  # over-horizon: dropped BEFORE seen
                        absu = resolve_relative(href, r["url_norm"])
                        try:
                            norm = normalize_url(absu)
                        except (ValueError, TypeError):
                            continue
                        if not SCOPE_RE.search(norm):
                            continue
                        row = _mk_row(
                            norm,
                            dom_prio.get(
                                canonical_host(norm),
                                PRIORITY_LISTING if "?page=" in norm else PRIORITY_DETAIL,
                            ),
                            rnd + 1,
                            rnd + 1,
                            cand_depth,
                        )
                        tmpl_key = None
                        if trap_max_urls is not None:
                            tmpl_key = (
                                row["host"],
                                re.sub(r"[0-9]+", "{N}", row["path"]),
                            )
                            # flagged template: dropped before the seen set
                            # (order vs within-round dedup is immaterial —
                            # all copies share the template)
                            if tmpl_key in trap_flags:
                                continue
                        if adaptive_ttl is not None:
                            # adaptive deferral: round-START stats (commits
                            # <= rnd-1); all copies of a hash share the
                            # decision, so order vs dedup is immaterial —
                            # the deferral set counts unique hashes like the
                            # engine's post-dedup metric
                            st = change_stats.get(row["url_hash"])
                            if st is not None:
                                n0, x0, last = st
                                iv = min(
                                    adaptive_ttl,
                                    max(1, (2 * n0 + 1) // (2 * x0 + 1)),
                                )
                                if rnd + 1 < last + iv:
                                    deferred_this_round.add(row["url_hash"])
                                    continue
                        prev = new_link_rows.get(row["url_hash"])
                        if prev is not None:
                            # within-round dup: min depth wins (engine's
                            # first_by_order on (depth, pos)); every other
                            # column of the two rows is identical
                            prev["depth"] = min(prev["depth"], cand_depth)
                            continue
                        if is_seen(row["url_hash"], rnd):
                            continue
                        res.seen.add(row["url_hash"])
                        seen_round[row["url_hash"]] = rnd
                        new_link_rows[row["url_hash"]] = row
                        new_rows.append(row)
                        if tmpl_key is not None:
                            trap_delta[tmpl_key] = (
                                trap_delta.get(tmpl_key, 0) + 1
                            )
                elif _retryable(status):
                    if r["attempt"] + 1 < MAX_ATTEMPTS:
                        res.retries.append((r["url_norm"], r["attempt"] + 1))
                        r2 = dict(r)
                        try:  # Retry-After (rounds) overrides attempt backoff
                            delta = int(ra) if ra is not None else r["attempt"] + 1
                        except ValueError:
                            delta = r["attempt"] + 1
                        r2["not_before"] = rnd + delta
                        r2["attempt"] = r["attempt"] + 1
                        new_rows.append(r2)
                    else:
                        res.dlq.append((r["url_norm"], r["attempt"] + 1))
                # non-retryable failures simply leave the frontier
        frontier.extend(new_rows)
        # standing template counts commit with the round (engine appends the
        # url_templates delta at round end; next round's flags see it)
        for key, n in trap_delta.items():
            res.template_counts[key] = res.template_counts.get(key, 0) + n
        page_body.update(body_delta)
        # change stats commit with the round (next round's candidate checks
        # see them, this round's did not)
        for h, (dn, dx) in obs_delta.items():
            n0, x0, _last = change_stats.get(h, (0, 0, -1))
            change_stats[h] = (n0 + dn, x0 + dx, rnd)
        res.adaptive_deferrals.extend(
            (rnd, h) for h in sorted(deferred_this_round)
        )
    res.seen_rounds = dict(seen_round)
    res.change_stats = dict(change_stats)
    return res
