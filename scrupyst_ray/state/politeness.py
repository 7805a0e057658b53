"""Per-host politeness for one host-hash shard: robots.txt cache + per-round
token budgets (plain class, Ray-free).

Reference semantics being reproduced:
- robots: per-netloc parser cache; missing/unfetchable robots.txt ⇒ allow-all
  (``scrapy/downloadermiddlewares/robotstxt.py:41,82-136``); UA matched is the
  crawler's configured agent (``robotstxt.py:68-71``).
- slots: each host admits at most ``CONCURRENT_REQUESTS_PER_DOMAIN`` (8)
  in-flight requests, and ``DOWNLOAD_DELAY`` seconds between requests
  (``scrapy/core/downloader/__init__.py:199-225``).  The superstep engine is
  time-free: one round models one politeness window, so the per-host budget
  per round is

      budget = concurrent_requests_per_domain                 (delay == 0)
      budget = max(1, floor(round_seconds / effective_delay)) (delay > 0)

  where ``effective_delay = max(download_delay, robots crawl-delay)``.
  Unused budget does NOT carry over (matches the reference: an idle slot
  gains nothing).  Deterministic ⇒ the crawl order is reproducible, which is
  the parity artifact (BASELINE.json).
- host-fairness: each host draws from its own budget, so no hot host can
  starve others — the batch analog of ``DownloaderAwarePriorityQueue`` pop
  (``scrapy/pqueues.py:324-335``); fairness oracle shape:
  reference ``tests/test_scheduler.py:276-290``.

Retry idempotence: one admit() call per shard per round; the full decision
vector is cached per round and replayed on re-delivery.
"""

from __future__ import annotations

import numpy as np

from scrupyst_ray.functions.robots import RobotsRules, parse_robots

# admit() status codes (int8 column on the frontier)
ADMITTED = 0
DEFERRED = 1  # over budget this round — stays in the frontier
ROBOTS_FORBIDDEN = 2  # dropped permanently


class PolitenessState:
    def __init__(
        self,
        shard_id: int,
        user_agent: str,
        per_domain_budget: int = 8,
        download_delay: float = 0.0,
        round_seconds: float = 8.0,
        robotstxt_obey: bool = True,
        download_slots: dict | None = None,
        throttle=None,
    ):
        self.shard_id = shard_id
        self.user_agent = user_agent
        self.per_domain_budget = per_domain_budget
        self.download_delay = download_delay
        self.round_seconds = round_seconds
        self.robotstxt_obey = robotstxt_obey
        # per-slot overrides {host: {"delay", "concurrency"}} — reference
        # DOWNLOAD_SLOTS (core/downloader/__init__.py:131-133,148-167)
        self.download_slots = download_slots or {}
        # optional AutoThrottleState (ST5): when set, its adaptive per-host
        # delay REPLACES the static delay, exactly as the reference throttle
        # mutates slot.delay in place (extensions/throttle.py:104-129)
        self.throttle = throttle
        self._robots_bodies: dict[str, bytes | None] = {}  # host -> raw body
        self._robots_cache: dict[str, RobotsRules] = {}  # host -> parsed (lazy)
        self._round_cache: dict[int, np.ndarray] = {}  # round -> decision vector
        self.stats = {"robots_forbidden": 0, "deferred": 0, "admitted": 0}

    # -- robots -------------------------------------------------------------

    def load_robots_bodies(self, hosts: list[str], bodies: list[bytes | None]) -> None:
        """Install raw robots.txt bodies for this shard's hosts (from the
        robots side-table derived from the page corpus).  Parsing is lazy —
        only hosts that actually appear in the frontier pay for it."""
        self._robots_bodies.update(zip(hosts, bodies))

    def _rules_for(self, host: str) -> RobotsRules:
        rules = self._robots_cache.get(host)
        if rules is None:
            body = self._robots_bodies.get(host)  # missing ⇒ None ⇒ allow-all
            rules = parse_robots(body)
            self._robots_cache[host] = rules
        return rules

    def _budget_for(self, host: str) -> int:
        slot = self.download_slots.get(host, {})
        delay = slot.get("delay", self.download_delay)
        concurrency = slot.get("concurrency", self.per_domain_budget)
        if self.throttle is not None:
            delay = self.throttle.delay_for(host)
        if self.robotstxt_obey:
            cd = self._rules_for(host).crawl_delay(self.user_agent)
            if cd is not None:
                delay = max(delay, cd)
        if delay > 0:
            return max(1, int(self.round_seconds / delay))
        return concurrency

    # -- vectorized gate helpers (scale path) ---------------------------------
    # The superstep gate keeps the deferred backlog OUT of the actor RPC:
    # deferred rows were robots-checked and seen-recorded when first gated, so
    # per round the actor only answers (a) robots verdicts for NEW rows and
    # (b) per-host budgets; the budget draw itself is pure deterministic
    # compute done vectorized inside the gate task (pipelines/crawl.py).

    def robots_ok(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        """Per-row robots verdict (all-True when ROBOTSTXT_OBEY is off)."""
        n = len(urls)
        out = np.ones(n, dtype=bool)
        if not self.robotstxt_obey:
            return out
        ua = self.user_agent
        for i in range(n):
            out[i] = self._rules_for(hosts[i]).allowed(urls[i], ua)
        return out

    def budgets(self, hosts: list[str]) -> np.ndarray:
        """Per-host round budget for a list of (unique) hosts."""
        return np.fromiter(
            (self._budget_for(h) for h in hosts), dtype=np.int64, count=len(hosts)
        )

    # -- admission ----------------------------------------------------------

    def admit(self, round_id: int, hosts: list[str], urls: list[str]) -> np.ndarray:
        """Decide each row of this shard's round batch.

        Rows MUST be pre-sorted by (host, -priority, order_key): budget is
        spent in that order, which makes the admitted set the per-host top-k
        by priority with FIFO tie-break (reference dequeue order,
        ``scrapy/pqueues.py:143-198`` + BFO config, SURVEY.md §2.6).

        Returns an int8 vector of ADMITTED / DEFERRED / ROBOTS_FORBIDDEN.
        """
        cached = self._round_cache.get(round_id)
        if cached is not None and len(cached) == len(urls):
            return cached
        n = len(urls)
        out = np.empty(n, dtype=np.int8)
        remaining: dict[str, int] = {}
        obey = self.robotstxt_obey
        for i in range(n):
            host = hosts[i]
            if obey and not self._rules_for(host).allowed(urls[i], self.user_agent):
                out[i] = ROBOTS_FORBIDDEN
                continue
            left = remaining.get(host)
            if left is None:
                left = self._budget_for(host)
            if left > 0:
                remaining[host] = left - 1
                out[i] = ADMITTED
            else:
                remaining[host] = 0
                out[i] = DEFERRED
        self.stats["robots_forbidden"] += int((out == ROBOTS_FORBIDDEN).sum())
        self.stats["deferred"] += int((out == DEFERRED).sum())
        self.stats["admitted"] += int((out == ADMITTED).sum())
        # keep only the latest round's decisions (retries target the current round)
        self._round_cache = {round_id: out}
        return out
