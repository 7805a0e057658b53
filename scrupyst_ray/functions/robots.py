"""robots.txt parsing & matching — RFC 9309 semantics (Protego-compatible).

The reference uses the Protego parser by default
(``scrapy/robotstxt.py:45-123``, ``default_settings.py:475``) behind its
robots middleware (``scrapy/downloadermiddlewares/robotstxt.py:32-137``).
Protego is not installed here; this module reimplements the needed subset
from the public RFC 9309 spec + Protego's documented behavior:

- body decoded as ``utf-8-sig`` with errors ignored (reference
  ``robotstxt.py:24-42``),
- groups of ``User-agent`` lines followed by ``Allow``/``Disallow`` rules,
- agent selection: the group whose UA token is the **longest** one contained
  (case-insensitive) in the crawler's UA string; the ``*`` group as fallback,
- rule selection: longest-pattern match wins; on a length tie ``Allow`` wins,
- patterns support ``*`` (any chars) and a trailing ``$`` anchor,
- empty ``Disallow:`` value ⇒ allow-all rule (ignored),
- a missing / unfetchable robots.txt ⇒ allow everything (reference
  ``robotstxt.py:128-136``),
- patterns AND target paths are percent-normalized before comparison
  (Protego behavior, reference ``tests/test_robotstxt_interface.py``
  ``test_unicode_url_and_useragent``: a raw-unicode ``Disallow`` value
  must match the percent-encoded URL path and vice versa).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlsplit

# percent-encode non-ASCII (utf-8 bytes) while leaving existing %XX escapes,
# wildcards (*, $) and URL-legal punctuation untouched — applied identically
# to rule patterns and target paths so either spelling matches the other
_QUOTE_SAFE = "/%*$?=&:,;@+!()'~._-"


def _pct_normalize(s: str) -> str:
    return quote(s, safe=_QUOTE_SAFE)


class _Rule:
    __slots__ = ("allow", "pattern", "length", "regex")

    def __init__(self, allow: bool, pattern: str):
        pattern = _pct_normalize(pattern)
        self.allow = allow
        self.pattern = pattern
        self.length = len(pattern)
        self.regex = self._compile(pattern)

    @staticmethod
    def _compile(pattern: str) -> re.Pattern[str]:
        anchored = pattern.endswith("$")
        if anchored:
            pattern = pattern[:-1]
        parts = [re.escape(p) for p in pattern.split("*")]
        body = ".*".join(parts)
        return re.compile("^" + body + ("$" if anchored else ""))

    def matches(self, path: str) -> bool:
        return self.regex.match(path) is not None


class RobotsRules:
    """Parsed robots.txt for one host."""

    ALLOW_ALL: RobotsRules

    def __init__(self, body: bytes | None):
        # group list: (ua_tokens_lower, rules, crawl_delay)
        self._groups: list[tuple[list[str], list[_Rule], float | None]] = []
        self.sitemaps: list[str] = []
        if body:
            self._parse(body.decode("utf-8-sig", errors="ignore"))

    def _parse(self, text: str) -> None:
        cur_agents: list[str] = []
        cur_rules: list[_Rule] = []
        cur_delay: float | None = None
        expecting_agents = True

        def flush() -> None:
            nonlocal cur_agents, cur_rules, cur_delay
            if cur_agents:
                self._groups.append((cur_agents, cur_rules, cur_delay))
            cur_agents, cur_rules, cur_delay = [], [], None

        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            fld, _, val = line.partition(":")
            fld = fld.strip().lower()
            val = val.strip()
            if fld == "user-agent":
                if not expecting_agents:
                    flush()
                    expecting_agents = True
                cur_agents.append(val.lower())
            elif fld in ("allow", "disallow"):
                expecting_agents = False
                if not cur_agents:
                    continue  # rules before any user-agent line: ignored
                if val == "":
                    continue  # empty pattern matches nothing (allow-all)
                cur_rules.append(_Rule(fld == "allow", val))
            elif fld == "crawl-delay":
                expecting_agents = False
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
            elif fld == "sitemap":
                self.sitemaps.append(val)
        flush()

    def _group_for(self, user_agent: str) -> tuple[list[_Rule], float | None] | None:
        ua = user_agent.lower()
        best: tuple[int, list[_Rule], float | None] | None = None
        wildcard: tuple[list[_Rule], float | None] | None = None
        for agents, rules, delay in self._groups:
            for token in agents:
                if token == "*":
                    if wildcard is None:
                        wildcard = (rules, delay)
                elif token and token in ua:
                    if best is None or len(token) > best[0]:
                        best = (len(token), rules, delay)
        if best is not None:
            return best[1], best[2]
        return wildcard

    @staticmethod
    def _target_path(url: str) -> str:
        parts = urlsplit(url)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        return _pct_normalize(path)

    def allowed(self, url: str, user_agent: str) -> bool:
        """RFC 9309 decision: most-specific (longest) matching rule wins;
        Allow wins length ties; no matching rule ⇒ allowed."""
        group = self._group_for(user_agent)
        if group is None:
            return True
        rules, _ = group
        best_len = -1
        best_allow = True
        for rule in rules:
            if rule.length > best_len and rule.matches(self._target_path(url)):
                best_len = rule.length
                best_allow = rule.allow
            elif rule.length == best_len and rule.allow and not best_allow:
                if rule.matches(self._target_path(url)):
                    best_allow = True
        return best_allow

    def crawl_delay(self, user_agent: str) -> float | None:
        group = self._group_for(user_agent)
        return group[1] if group else None


RobotsRules.ALLOW_ALL = RobotsRules(None)


def parse_robots(body: bytes | None) -> RobotsRules:
    """Parse a robots.txt body; ``None`` (missing / fetch error) ⇒ allow-all
    (reference ``robotstxt.py:128-136``)."""
    if body is None:
        return RobotsRules.ALLOW_ALL
    return RobotsRules(body)
