"""Cuckoo filter over uint64 keys — the second sketch option BASELINE.json
names ("partitioned bloom/cuckoo URL-seen filter").

Standard design (Fan et al., "Cuckoo Filter: Practically Better than
Bloom", CoNEXT'14): B buckets × 4 slots of 16-bit fingerprints; a key lives
in bucket i1 = h(key) or its partner i2 = i1 ^ h(fingerprint), so membership
is two vectorized table probes.  Unlike the bloom it supports DELETE —
which is what a recrawl pipeline needs to re-admit a URL without rebuilding
the shard sketch (``SeenState.forget``); a bloom only accumulates.

Same safety contract as ``state/bloom.py``: the sketch answers the fast
NEGATIVE path only — positives are always confirmed against the shard's
exact fingerprint dict, so false positives cost a lookup, never a wrong
answer.  Determinism: the eviction victim is chosen by a rotating counter
(no RNG), so identical insert sequences produce identical tables.

Failure mode: if an insert still has no home after ``max_kicks`` evictions
(table effectively full), the key goes to a small exact overflow set —
lookups stay correct, memory degrades gracefully (same spirit as the
bloom's rising-FP-rate degradation).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500

# splitmix64 finalizer constants (public domain)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(keys: np.ndarray) -> np.ndarray:
    x = keys.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _C1
        x ^= x >> np.uint64(27)
        x *= _C2
        x ^= x >> np.uint64(31)
    return x


class CuckooFilter:
    """Fixed-size cuckoo filter for uint64 keys; vectorized contains."""

    def __init__(self, capacity: int, max_kicks: int = _MAX_KICKS):
        capacity = max(1024, int(capacity))
        # 4 slots/bucket at ~95% max load → buckets ≥ capacity/3.8
        n_buckets = 1 << int(np.ceil(np.log2(max(capacity // 3, 1024) / _SLOTS)))
        self._mask = np.uint64(n_buckets - 1)
        self._table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self._max_kicks = max_kicks
        # stash for entries left homeless by a failed eviction chain.  The
        # homeless entry is the LAST VICTIM of the chain — known only by its
        # (bucket, fingerprint), NOT by the key that triggered the insert —
        # so the stash is keyed by (canonical bucket, fp): canonical =
        # min(i, alt(i, fp)), computable from either of the entry's buckets.
        self._stash: set[tuple[int, int]] = set()
        self._kick_rotor = 0
        self._n = 0

    # -- key decomposition ----------------------------------------------------

    def _parts(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(fingerprint16, bucket1, bucket2) per key, vectorized."""
        mixed = _mix(keys)
        fp = (mixed >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty slot
        i1 = (mixed & self._mask).astype(np.uint64)
        # partner bucket from the fingerprint only (so it's computable from
        # (i, fp) during eviction): i2 = i1 ^ h(fp)
        fp_h = _mix(fp.astype(np.uint64)) & self._mask
        i2 = (i1 ^ fp_h).astype(np.uint64)
        return fp, i1, i2

    def _alt_bucket(self, i: int, fp: int) -> int:
        return int(
            (np.uint64(i) ^ (_mix(np.array([fp], np.uint64))[0] & self._mask))
        )

    # -- Bloom-compatible API ---------------------------------------------------

    def add_many(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        fps, i1s, i2s = self._parts(keys)
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            self._insert_one(int(fp), int(i1), int(i2))

    def _stash_key(self, i: int, fp: int) -> tuple[int, int]:
        return (min(i, self._alt_bucket(i, fp)), fp)

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        self._n += 1
        t = self._table
        for i in (i1, i2):
            row = t[i]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                return
        # evict: deterministic rotating victim slot
        i = i1
        for _ in range(self._max_kicks):
            slot = self._kick_rotor % _SLOTS
            self._kick_rotor += 1
            victim = int(t[i, slot])
            t[i, slot] = fp
            fp = victim
            i = self._alt_bucket(i, fp)
            row = t[i]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                return
        # table saturated: the LAST VICTIM is homeless — stash it exactly
        self._stash.add(self._stash_key(i, fp))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s, i2s = self._parts(keys)
        t = self._table
        hit = (t[i1s] == fps[:, None]).any(axis=1) | (
            t[i2s] == fps[:, None]
        ).any(axis=1)
        if self._stash:
            stash = self._stash
            for j in np.nonzero(~hit)[0]:
                cank = (min(int(i1s[j]), int(i2s[j])), int(fps[j]))
                if cank in stash:
                    hit[j] = True
        return hit

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Remove one stored occurrence per key; True where a fingerprint
        was found and cleared (False = key was never added, or its slot was
        lost to an overflow whose exact entry is removed instead)."""
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        if keys.size == 0:
            return out
        fps, i1s, i2s = self._parts(keys)
        t = self._table
        for j, (fp, i1, i2) in enumerate(
            zip(fps.tolist(), i1s.tolist(), i2s.tolist())
        ):
            for i in (i1, i2):
                row = t[i]
                slots = np.nonzero(row == fp)[0]
                if slots.size:
                    row[slots[0]] = 0
                    self._n -= 1
                    out[j] = True
                    break
            else:
                cank = (min(i1, i2), fp)
                if cank in self._stash:
                    self._stash.discard(cank)
                    self._n -= 1
                    out[j] = True
        return out

    def __len__(self) -> int:
        return self._n
