"""Stable 64-bit hashing for shard / bucket routing.

The engine needs a hash that is stable across processes, Python versions and
runs (Python's builtin ``hash`` is salted; polars' row hash is not guaranteed
stable across versions).  We use BLAKE2b with an 8-byte digest (stdlib,
C-speed): the same routing keys are reproduced when a checkpointed crawl is
resumed or when the page store is rebuilt.

Routing keys (SURVEY.md §7.3):
- ``shard = hash64(host) % num_shards``  — seen/politeness state shard
  (driver mandate: URL-seen sharded by host-hash, co-locating politeness).
- ``bucket = hash64(url) % num_buckets`` — fetch-join bucket; the page store
  is partitioned by the same function so a frontier row's page bytes live in
  exactly one known bucket.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np


def stable_hash64(value: str | bytes) -> int:
    """Deterministic unsigned 64-bit hash of *value*."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(value, digest_size=8).digest(), "big")


def hash_mod_batch(values: list[str], mod: int) -> np.ndarray:
    """Vectorized-ish ``stable_hash64(v) % mod`` → int32 array (one C hash
    call per value; ~2M values/s/core — routing-key assignment is never the
    hot stage, parsing is)."""
    out = np.empty(len(values), dtype=np.int32)
    _h = blake2b
    for i, v in enumerate(values):
        out[i] = (
            int.from_bytes(
                _h(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "big"
            )
            % mod
        )
    return out
