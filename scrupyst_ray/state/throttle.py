"""AutoThrottle — per-host adaptive delay (reference ST5, SURVEY.md §2.3).

Reference semantics (``scrapy/extensions/throttle.py:21-129``): a feedback
controller that mutates each download slot's ``delay`` from observed
response latency —

    target_delay = latency / AUTOTHROTTLE_TARGET_CONCURRENCY
    new_delay    = max(target_delay, (old_delay + target_delay) / 2)
    new_delay    = clamp(new_delay, mindelay, maxdelay)
    skip if response.status != 200 and new_delay <= old_delay   # no decrease
                                                                 # on errors

with ``mindelay = DOWNLOAD_DELAY``, ``maxdelay = AUTOTHROTTLE_MAX_DELAY``
(60 s), and every slot starting at
``max(mindelay, AUTOTHROTTLE_START_DELAY)`` (5 s)
(``throttle.py:50-61,104-129``).

Superstep adaptation: the reference adjusts once per response; a batch
engine observes a whole round at once, so :meth:`observe_round` applies the
same formula once per (host, round) using that round's MEAN latency for the
host and "ok" = every fetch returned 200.  Corpus replay has no network, so
the engine feeds a deterministic latency proxy (bytes / simulated
bandwidth); on a live cluster the measured per-fetch wall time slots in
unchanged.

Idempotence (SURVEY.md §4.2 — actor state is not lineage-protected): a
re-delivered round first rolls the delays back to the pre-round snapshot,
so Ray task retries and engine-level round replays converge to the same
delay vector.  Delays checkpoint per round to Parquet and restore on
resume, keeping kill-resume bit-identical when throttling is enabled.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

THROTTLE_SCHEMA = pa.schema([("host", pa.string()), ("delay", pa.float64())])


class AutoThrottleState:
    def __init__(
        self,
        *,
        start_delay: float = 5.0,
        max_delay: float = 60.0,
        min_delay: float = 0.0,
        target_concurrency: float = 1.0,
    ):
        if target_concurrency <= 0.0:
            raise ValueError("target_concurrency must be > 0")
        self.min_delay = min_delay
        self.max_delay = max_delay
        self.start_delay = max(min_delay, start_delay)
        self.target_concurrency = target_concurrency
        self._delays: dict[str, float] = {}
        # pre-round snapshot for round-replay idempotence
        self._round_id: int | None = None
        self._round_base: dict[str, float] = {}

    def delay_for(self, host: str) -> float:
        """Current slot delay (a never-seen host sits at the start delay,
        mirroring a fresh ``Slot`` after ``_spider_opened``)."""
        return self._delays.get(host, self.start_delay)

    def _adjust(self, host: str, latency: float, ok: bool) -> None:
        old = self.delay_for(host)
        target = latency / self.target_concurrency
        new = max(target, (old + target) / 2.0)
        new = min(max(self.min_delay, new), self.max_delay)
        if not ok and new <= old:  # throttle.py:123-129
            return
        self._delays[host] = new

    def observe_round(
        self,
        round_id: int,
        hosts: list[str],
        mean_latencies: list[float],
        oks: list[bool],
    ) -> None:
        """Apply one adjustment per host for this round (idempotent: a
        replayed round resets to the pre-round snapshot first)."""
        if self._round_id == round_id:
            self._delays = dict(self._round_base)
        else:
            self._round_id = round_id
            self._round_base = dict(self._delays)
        for host, lat, ok in zip(hosts, mean_latencies, oks):
            self._adjust(host, lat, ok)

    # -- checkpoint / resume --------------------------------------------------

    def snapshot(self, path: str) -> int:
        """Full delay map → Parquet (tmp+rename; tiny: hosts-per-shard)."""
        hosts = sorted(self._delays)
        table = pa.table(
            {"host": hosts, "delay": [self._delays[h] for h in hosts]},
            schema=THROTTLE_SCHEMA,
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(table, path + ".tmp")
        os.replace(path + ".tmp", path)
        return len(hosts)

    def restore(self, path: str) -> int:
        table = pq.read_table(path)
        self._delays = dict(
            zip(table["host"].to_pylist(), table["delay"].to_pylist())
        )
        self._round_id = None
        self._round_base = {}
        return table.num_rows
