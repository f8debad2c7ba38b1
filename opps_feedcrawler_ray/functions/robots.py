"""robots.txt parsing + matching (SURVEY.md §2.2 M9, RFC 9309).

FROZEN SPEC, pinned by ``tests/golden/robots_cases.tsv``:

* Groups: consecutive ``User-agent:`` lines start a group; a group's
  rules apply to every agent named above them.  Agent match: exact
  product token (case-insensitive) beats ``*``; if our token has no
  group, the ``*`` group applies; if neither exists, everything is
  allowed.
* Rules: ``Allow:`` / ``Disallow:`` with path patterns supporting ``*``
  (any char run) and ``$`` (end anchor).  An empty ``Disallow:`` value
  matches nothing (i.e. allows all).
* Decision: the matching rule with the LONGEST pattern wins; on a
  length tie, Allow wins (RFC 9309 §2.2.2).  No matching rule → allow.
* ``/robots.txt`` itself is always fetchable.
* ``Crawl-delay`` is parsed and surfaced (seconds, float) but the
  simulated fetcher treats politeness as a per-round per-host budget
  (SURVEY.md §2.9), not wall-clock delay.

State is serialized compactly (list of (allow, pattern) + crawl_delay)
so frontier actors can checkpoint it (SURVEY.md §2.3 A1/A2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_AGENT_TOKEN = "oppsfeedcrawler-ray"


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts)
    return re.compile(rx + ("$" if anchored else ""))


@dataclass
class RobotsRules:
    """Parsed, matchable rule set for one host."""

    rules: list[tuple[bool, str]] = field(default_factory=list)  # (is_allow, pattern)
    crawl_delay: float | None = None
    _compiled: list[tuple[bool, int, re.Pattern]] | None = None

    def _compile(self) -> list[tuple[bool, int, re.Pattern]]:
        if self._compiled is None:
            self._compiled = [
                (allow, len(pat), _pattern_to_regex(pat)) for allow, pat in self.rules if pat
            ]
        return self._compiled

    def allowed(self, path: str) -> bool:
        if path == "/robots.txt":
            return True
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for allow, plen, rx in self._compile():
            if rx.match(path):
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow

    # -- checkpoint serialization (frontier actor state, SURVEY.md §2.3) --
    def to_tuple(self) -> tuple:
        return (self.rules, self.crawl_delay)

    @classmethod
    def from_tuple(cls, t: tuple) -> "RobotsRules":
        return cls(rules=[(bool(a), p) for a, p in t[0]], crawl_delay=t[1])


def parse_robots(body: bytes | str, agent: str = _AGENT_TOKEN) -> RobotsRules:
    """Parse a robots.txt body into the rule set applicable to ``agent``."""
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", "replace")
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_agent_run = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if key == "disallow" and not val:
                continue  # empty Disallow allows all (matches nothing)
            if val:
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_agent_run = False
            try:
                cur_delay = float(val)
            except ValueError:
                pass
    flush()

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    star = [g for g in groups if "*" in g[0]]
    chosen = exact or star
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    for _, rs, d in chosen:
        rules.extend(rs)
        if d is not None:
            delay = d
    return RobotsRules(rules=rules, crawl_delay=delay)


def extract_sitemaps(body: bytes | str) -> list[str]:
    """``Sitemap:`` directives (the sitemaps.org robots extension):
    global, group-independent, absolute URLs; first-occurrence order,
    deduplicated.  Separate from :class:`RobotsRules` — the frozen rule
    serialization is untouched."""
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", "replace")
    out: list[str] = []
    seen: set[str] = set()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out
