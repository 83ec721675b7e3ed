"""RFC 9309 robots.txt parsing, from scratch.

The crawl engine's politeness layer consumes robots RULES (per-host
disallow prefixes + Crawl-delay) as injected functions — the sandbox
seam that replaces live fetching (sources/synthetic_web.py). A real
deployment fetches ``/robots.txt`` BYTES; this module turns those bytes
into the same rule shape, implementing the Robots Exclusion Protocol as
specified (RFC 9309) plus the de-facto extensions every large crawler
honors:

- group selection: the most specific ``User-agent`` match wins (longest
  product-token match, ``*`` as fallback); multiple groups naming the
  same agent merge
- rule matching: ``Allow``/``Disallow`` patterns with ``*`` wildcards
  and the ``$`` end anchor; the LONGEST matching pattern wins; on a
  length tie Allow wins (RFC 9309 §2.2.2)
- an empty ``Disallow:`` matches nothing; a missing/empty robots.txt
  allows everything; directives are case-insensitive; ``#`` comments
- extensions: ``Crawl-delay`` (seconds, per selected group) and
  host-wide ``Sitemap:`` lines

``parse_robots`` is a pure function of (text, user_agent) → a
``RobotsPolicy`` whose ``allowed(path)`` is itself pure — usable inside
Arrow-batched UDFs with the policy built once per host on the driver or
per partition, exactly like the injected rule functions it replaces.
The synthetic web renders its deterministic rules AS robots.txt text
(sources/synthetic_web.robots_txt) and the differential test pins
``parse_robots∘robots_txt == the rule functions`` across every host.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _pattern_to_regex(pattern: str) -> re.Pattern:
    """Robots path pattern -> anchored regex (* wildcard, $ end anchor)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


@dataclass
class RobotsPolicy:
    """Selected-group view of one robots.txt for one user agent."""

    rules: list[tuple[bool, str]] = field(default_factory=list)  # (allow, pattern)
    crawl_delay: float = 0.0
    sitemaps: list[str] = field(default_factory=list)
    _compiled: list[tuple[bool, int, re.Pattern]] = field(
        default_factory=list, repr=False
    )

    def __post_init__(self):
        self._compiled = [
            (allow, len(pat), _pattern_to_regex(pat))
            for allow, pat in self.rules
            if pat  # an empty pattern matches nothing (RFC 9309 §2.2.2)
        ]

    def allowed(self, path: str) -> bool:
        """Longest-match verdict for a URL path (query string included if
        the caller passes one). No matching rule -> allowed."""
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for allow, plen, rx in self._compiled:
            if rx.match(path) and (
                plen > best_len or (plen == best_len and allow and not best_allow)
            ):
                best_len, best_allow = plen, allow
        return best_allow

    def disallow_prefixes(self) -> list[str]:
        """The plain Disallow prefixes (no wildcard/anchor, no Allow
        overrides) — the shape the crawl engine's injected rule functions
        use. Raises ValueError when this policy is not expressible as
        plain prefixes, so callers can't silently drop Allow carve-outs."""
        out = []
        for allow, pat in self.rules:
            if not pat:
                continue
            if allow or "*" in pat or pat.endswith("$"):
                raise ValueError("policy is not a plain disallow-prefix list")
            out.append(pat)
        return out


def _agent_match_len(group_agent: str, user_agent: str) -> int:
    """Specificity of a User-agent line vs our product token: -1 = no
    match, 0 = the ``*`` fallback, else the matched token length."""
    ga = group_agent.strip().lower()
    if ga == "*":
        return 0
    ua = user_agent.strip().lower()
    if ua.startswith(ga):
        return len(ga)
    return -1


def parse_robots(text: str, user_agent: str = "*") -> RobotsPolicy:
    """robots.txt text → the policy for ``user_agent``. Never raises;
    hostile/garbage lines are skipped (RFC 9309 §2.2: parse what you
    can). Group structure: consecutive User-agent lines share the rule
    block that follows; a blank line does NOT end a group (the RFC
    dropped that pre-standard rule); Sitemap lines are host-wide."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    sitemaps: list[str] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(value)
            in_agent_run = True
        elif key == "sitemap":
            if value:
                sitemaps.append(value)
        elif key in ("allow", "disallow", "crawl-delay"):
            if agents:
                rules.append((key, value))
                in_agent_run = False
        # unknown directives: skipped
    if agents:
        groups.append((agents, rules))

    # pick the most specific matching group; merge equal-specificity ones
    best = -1
    for agents, _ in groups:
        for a in agents:
            best = max(best, _agent_match_len(a, user_agent))
    policy_rules: list[tuple[bool, str]] = []
    crawl_delay = 0.0
    if best >= 0:
        for agents, grules in groups:
            if max((_agent_match_len(a, user_agent) for a in agents), default=-1) != best:
                continue
            for key, value in grules:
                if key == "crawl-delay":
                    try:
                        crawl_delay = max(crawl_delay, float(value))
                    except ValueError:
                        pass
                else:
                    policy_rules.append((key == "allow", value))
    return RobotsPolicy(rules=policy_rules, crawl_delay=crawl_delay,
                        sitemaps=sitemaps)
