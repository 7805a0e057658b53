"""URL-seen state for one host-hash shard (plain class, Ray-free).

Reference semantics (``scrapy/dupefilters.py:53-126``):
- ``request_seen(fp)`` checks AND records the fingerprint (first caller wins),
- ``dont_filter`` requests bypass the check entirely (and are not recorded,
  ``scrapy/core/scheduler.py:343``),
- the seen set persists across restarts (``requests.seen`` under JOBDIR,
  ``dupefilters.py:76-82``) — here: per-round Parquet delta files.

Batch + retry semantics for the superstep engine (SURVEY.md §4.2 "actor
state is NOT lineage-protected"): each shard receives exactly one deduped
batch per round (the shard's whole frontier group).  ``check_and_add`` is
idempotent per round: a fingerprint first recorded in round *r* keeps
answering "fresh" for round-*r* re-deliveries (Ray task retry), but answers
"seen" for any later round.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from scrupyst_ray.state.bloom import Bloom

_DELTA_SCHEMA = pa.schema([("fp", pa.binary()), ("fp64", pa.uint64())])


class SeenState:
    """Exact fingerprint set + sketch negative-path pre-filter for one shard.

    ``sketch`` picks the pre-filter per BASELINE.json's "bloom/cuckoo":
    "bloom" (default — smallest memory) or "cuckoo" (``state/cuckoo.py`` —
    supports DELETE, which :meth:`forget` needs to keep the sketch tight
    under recrawl churn; a bloom only accumulates).  Either way positives
    are confirmed against the exact dict, so results are identical."""

    def __init__(
        self,
        shard_id: int,
        bloom_capacity: int = 1 << 20,
        sketch: str = "bloom",
    ):
        from scrupyst_ray.state.cuckoo import CuckooFilter

        self.shard_id = shard_id
        self._exact: dict[bytes, int] = {}  # fp -> round first recorded
        if sketch == "cuckoo":
            self._bloom = CuckooFilter(bloom_capacity)
        elif sketch == "bloom":
            self._bloom = Bloom(bloom_capacity)
        else:
            raise ValueError(f"unknown seen sketch {sketch!r}")
        self._pending_delta: list[bytes] = []  # fps recorded since last flush
        self.stats = {"checked": 0, "filtered": 0, "bloom_negatives": 0}

    def forget(self, fps: list[bytes]) -> int:
        """Remove fingerprints from the seen set (recrawl re-admission).
        Returns how many were present.  With the cuckoo sketch the slots are
        freed too; with a bloom the stale sketch bits just cost an exact
        lookup on the next sighting (still correct — sketch positives are
        always confirmed)."""
        removed = []
        for fp in fps:
            if self._exact.pop(fp, None) is not None:
                removed.append(fp)
        if removed and hasattr(self._bloom, "delete_many"):
            keys = np.fromiter(
                (int.from_bytes(fp[:8], "big") for fp in removed),
                dtype=np.uint64,
                count=len(removed),
            )
            self._bloom.delete_many(keys)
        return len(removed)

    def __len__(self) -> int:
        return len(self._exact)

    def check_and_add(self, round_id: int, fps: list[bytes], fp64: np.ndarray) -> np.ndarray:
        """Boolean mask: True = fresh (recorded now, or first recorded this
        round — retry-idempotent), False = seen in an earlier round.

        *fps* must be deduplicated by the caller (one occurrence per round);
        the caller keeps the deterministic winner (min order_key) so the
        recorded crawl is reproducible.
        """
        n = len(fps)
        self.stats["checked"] += n
        out = np.ones(n, dtype=bool)
        if n == 0:
            return out
        maybe = self._bloom.contains_many(np.asarray(fp64, dtype=np.uint64))
        self.stats["bloom_negatives"] += int(n - maybe.sum())
        exact = self._exact
        fresh_keys = np.empty(n, dtype=np.uint64)
        n_fresh = 0
        for i, fp in enumerate(fps):
            if maybe[i]:
                first_round = exact.get(fp)
                if first_round is not None:
                    if first_round != round_id:
                        out[i] = False
                        self.stats["filtered"] += 1
                    continue
            # definitely new (bloom negative, or bloom FP with no exact entry)
            exact[fp] = round_id
            self._pending_delta.append(fp)
            fresh_keys[n_fresh] = fp64[i]
            n_fresh += 1
        if n_fresh:
            self._bloom.add_many(fresh_keys[:n_fresh])
        return out

    # -- checkpointing ------------------------------------------------------

    def delta_table(self) -> pa.Table:
        """Fingerprints recorded since the last flush, as an Arrow table."""
        fps = self._pending_delta
        fp64 = np.fromiter(
            (int.from_bytes(fp[:8], "big") for fp in fps), dtype=np.uint64, count=len(fps)
        )
        return pa.table(
            {"fp": pa.array(fps, pa.binary()), "fp64": pa.array(fp64, pa.uint64())},
            schema=_DELTA_SCHEMA,
        )

    def flush_delta(self, path: str) -> int:
        """Write the pending delta to *path* (tmp+rename, idempotent) and
        clear it.  Returns the number of fingerprints written."""
        table = self.delta_table()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        self._pending_delta = []
        return table.num_rows

    def load_delta(self, path: str, round_id: int) -> int:
        """Restore one delta file (resume path)."""
        table = pq.read_table(path)
        fps = table["fp"].to_pylist()
        for fp in fps:
            self._exact.setdefault(fp, round_id)
        self._bloom.add_many(table["fp64"].to_numpy(zero_copy_only=False))
        return len(fps)
