"""robots.txt parsing + matching (RFC 9309 semantics), pure-Python kernel.

The reference has NO robots handling (verified: no 'robots' match anywhere in
/root/reference — SURVEY.md header note); politeness there is rate-limit only
(crawler/services/local_rate_limiter.py, redis_cache.py:360-463). The north
rule requires robots compliance + crawl-delay budgets, so this component is
designed fresh against RFC 9309:

  * group selection: most-specific user-agent match (longest robots token
    that is a case-insensitive PREFIX of the crawler's product token), '*'
    as fallback; ALL groups tied at the winning specificity are combined
    (§2.2.1) and unknown directives never interfere with grouping (§2.2.4);
  * rule matching: longest-path-match wins; tie -> Allow wins;
  * '*' wildcard and '$' end-anchor in paths;
  * empty Disallow == allow all;
  * Crawl-delay: non-standard but honored (seconds, float).

Pure functions only — Spark integration lives in
crawler_spark/functions/robots_udfs.py (vectorized over a broadcast
host->parsed-rules map; no per-row Python in the driver plan).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    # (pattern, allow) in file order; pattern is the raw robots path pattern
    rules: list[tuple[str, bool]] = field(default_factory=list)
    crawl_delay: float | None = None
    # regexes compiled once at parse time, parallel to `rules` — the match
    # runs per (rule x frontier row) inside the robots pandas UDFs, so a
    # per-call re-compile would thrash re's global cache at frontier scale
    compiled: list[re.Pattern] = field(default_factory=list)

    def _compiled(self, i: int) -> re.Pattern:
        return (
            self.compiled[i]
            if i < len(self.compiled)
            else _compile_path(self.rules[i][0])
        )


@dataclass
class RobotsPolicy:
    groups: list[RobotsGroup] = field(default_factory=list)

    def _matching_groups(self, user_agent: str) -> list[RobotsGroup]:
        """ALL groups tied at the winning specificity — RFC 9309 §2.2.1:
        when more than one group matches, the matching groups' rules MUST
        be combined (two 'User-agent: *' blocks act as one). A robots UA
        token matches when it is a case-insensitive PREFIX of the
        crawler's product token (the published longest-match semantics:
        'googlebot' < 'googlebot-images' for UA googlebot-images; a longer
        token for a DIFFERENT crawler never matches); '*' matches anything
        at specificity 0 and applies only when no named token matches."""
        ua = user_agent.lower().split("/")[0].strip()
        best = -1
        scored: list[tuple[int, RobotsGroup]] = []
        for g in self.groups:
            spec = -1
            for a in g.agents:
                al = a.lower().strip()
                if al == "*":
                    spec = max(spec, 0)
                elif al and ua.startswith(al):
                    spec = max(spec, len(al))
            if spec >= 0:
                scored.append((spec, g))
                best = max(best, spec)
        return [g for s, g in scored if s == best]

    def is_allowed(self, user_agent: str, path: str) -> bool:
        groups = self._matching_groups(user_agent)
        if not groups:
            return True
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for g in groups:
            for i, (pattern, allow) in enumerate(g.rules):
                if not pattern:
                    # "Disallow:" (empty) == no restriction; spec: ignore
                    continue
                if g._compiled(i).match(path) is not None:
                    plen = len(pattern)
                    if plen > best_len or (
                        plen == best_len and allow and not best_allow
                    ):
                        best_len = plen
                        best_allow = allow
        return best_allow if best_len >= 0 else True

    def crawl_delay(self, user_agent: str) -> float | None:
        """First crawl-delay among the combined matching groups, in file
        order (the directive is non-standard; first-wins is the common
        parser behavior for duplicated directives)."""
        for g in self._matching_groups(user_agent):
            if g.crawl_delay is not None:
                return g.crawl_delay
        return None


def _compile_path(pattern: str) -> re.Pattern:
    """robots path pattern -> anchored regex: '*' = any run, '$' = end."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    return re.compile("^" + rx + ("$" if anchored_end else ""))


def _match_path(pattern: str, path: str) -> bool:
    return _compile_path(pattern).match(path) is not None


def parse_robots(text: str) -> RobotsPolicy:
    """Parse robots.txt. Consecutive user-agent lines share one group; a
    non-UA directive closes the UA run (RFC 9309 §2.2.1)."""
    policy = RobotsPolicy()
    group: RobotsGroup | None = None
    in_ua_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_ua_run:
                group = RobotsGroup()
                policy.groups.append(group)
                in_ua_run = True
            group.agents.append(val)
        elif group is not None:
            if key == "disallow":
                in_ua_run = False
                group.rules.append((val, False))
                group.compiled.append(_compile_path(val))
            elif key == "allow":
                in_ua_run = False
                group.rules.append((val, True))
                group.compiled.append(_compile_path(val))
            elif key == "crawl-delay":
                in_ua_run = False
                try:
                    group.crawl_delay = float(val)
                except ValueError:
                    pass
            # any other directive (Sitemap, Host, ...) MUST NOT interfere
            # with parsing (RFC 9309 §2.2.4): it neither closes the UA run
            # nor ends the group — 'User-agent: a / Sitemap: x /
            # User-agent: b / Disallow: /' is ONE group covering a and b
        # directives before any user-agent line are ignored (no group)
    return policy


def is_allowed(robots_text: str, user_agent: str, path: str) -> bool:
    return parse_robots(robots_text).is_allowed(user_agent, path)


def crawl_delay(robots_text: str, user_agent: str) -> float | None:
    return parse_robots(robots_text).crawl_delay(user_agent)
