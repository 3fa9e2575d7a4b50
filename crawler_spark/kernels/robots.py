"""robots.txt parsing + matching (RFC 9309 semantics), pure-Python kernel.

The reference has NO robots handling (verified: no 'robots' match anywhere in
/root/reference — SURVEY.md header note); politeness there is rate-limit only
(crawler/services/local_rate_limiter.py, redis_cache.py:360-463). The north
rule requires robots compliance + crawl-delay budgets, so this component is
designed fresh against RFC 9309:

  * group selection: most-specific user-agent group (longest UA token match,
    case-insensitive substring of product token), '*' as fallback;
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


@dataclass
class RobotsPolicy:
    groups: list[RobotsGroup] = field(default_factory=list)

    def select_group(self, user_agent: str) -> RobotsGroup | None:
        """Most-specific matching group: longest agent token that is a
        case-insensitive prefix of (or equal to) the UA product token;
        '*' matches anything with specificity 0."""
        ua = user_agent.lower().split("/")[0].strip()
        best: tuple[int, RobotsGroup] | None = None
        for g in self.groups:
            for a in g.agents:
                al = a.lower()
                if al == "*":
                    spec = 0
                elif al in ua or ua in al:
                    spec = len(al)
                else:
                    continue
                if best is None or spec > best[0]:
                    best = (spec, g)
        return best[1] if best else None

    def is_allowed(self, user_agent: str, path: str) -> bool:
        g = self.select_group(user_agent)
        if g is None:
            return True
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for pattern, allow in g.rules:
            if not pattern:
                # "Disallow:" (empty) == no restriction; spec: ignore
                continue
            if _match_path(pattern, path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow if best_len >= 0 else True

    def crawl_delay(self, user_agent: str) -> float | None:
        g = self.select_group(user_agent)
        return g.crawl_delay if g else None


def _match_path(pattern: str, path: str) -> bool:
    """robots path pattern -> anchored regex: '*' = any run, '$' = end."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    rx = "^" + rx + ("$" if anchored_end else "")
    return re.match(rx, path) is not None


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
            in_ua_run = False
            if key == "disallow":
                group.rules.append((val, False))
            elif key == "allow":
                group.rules.append((val, True))
            elif key == "crawl-delay":
                try:
                    group.crawl_delay = float(val)
                except ValueError:
                    pass
        # directives before any user-agent line are ignored (no group)
    return policy


def is_allowed(robots_text: str, user_agent: str, path: str) -> bool:
    return parse_robots(robots_text).is_allowed(user_agent, path)


def crawl_delay(robots_text: str, user_agent: str) -> float | None:
    return parse_robots(robots_text).crawl_delay(user_agent)
