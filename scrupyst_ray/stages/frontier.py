"""Frontier-row construction and the per-candidate filter chain.

The frontier table is the columnar form of the reference's Request stream
(SURVEY.md §1.1).  Schema:

    url:string (safe form) · host:string · depth:int32 · priority:int64 ·
    order_key:binary · dont_filter:bool · already_enqueued:bool ·
    is_start:bool · fp:binary(20) · fp64:uint64 · shard:int32 · bucket:int32

``order_key`` is the deterministic total-order tie-breaker replacing the
reference's FIFO enqueue sequence (BFO config, SURVEY.md §2.6 O2): a seed
gets its 8-byte big-endian seed index; a child appends its 2-byte big-endian
link index (document order) to the parent's key.  Lexicographic binary order
over (round, -priority, order_key) IS the crawl order — a pure function of
seed list + link graph, with no global counter to coordinate across workers.

Filter chain per candidate (reference middleware order, with stats reasons):
  scheme/extension filters already ran inside link extraction (M14);
  nofollow (LinkExtractor flag — following is spider policy) →
  urllength (M5, ``spidermiddlewares/urllength.py:26-53``) →
  offsite (M4, ``downloadermiddlewares/offsite.py:67-99``) →
  depth limit (M6, ``spidermiddlewares/depth.py:87-97``).
Dropped rows keep a ``drop_reason`` column so per-round stats are one small
groupby instead of per-stage counters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrupyst_ray.config import CrawlConfig
from scrupyst_ray.functions.fingerprint import fingerprint
from scrupyst_ray.functions.hashing import stable_hash64
from scrupyst_ray.functions.urlnorm import (
    parse_host,
    safe_url_string,
    url_is_from_any_domain,
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int64()),
        ("order_key", pa.binary()),
        ("dont_filter", pa.bool_()),
        ("already_enqueued", pa.bool_()),
        ("is_start", pa.bool_()),
        ("fp", pa.binary()),
        ("fp64", pa.uint64()),
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
    ]
)

# drop_reason codes (0 = kept)
KEEP = 0
DROP_NOFOLLOW = 1
DROP_URLLENGTH = 2
DROP_OFFSITE = 3
DROP_DEPTH = 4
DROP_BADURL = 5

DROP_REASON_NAMES = {
    KEEP: "kept",
    DROP_NOFOLLOW: "nofollow",
    DROP_URLLENGTH: "urllength/filtered",
    DROP_OFFSITE: "offsite/filtered",
    DROP_DEPTH: "depth/filtered",
    DROP_BADURL: "badurl",
}


def _frontier_columns(
    urls: list[str],
    hosts: list[str],
    depths: np.ndarray,
    priorities: np.ndarray,
    order_keys: list[bytes],
    dont_filter: np.ndarray,
    already_enqueued: np.ndarray,
    is_start: np.ndarray,
    cfg: CrawlConfig,
    compute_keys: bool = True,
    compute_fp: bool = True,
) -> pa.Table:
    n = len(urls)
    fps: list[bytes] = [b""] * n
    fp64 = np.zeros(n, dtype=np.uint64)
    shard = np.zeros(n, dtype=np.int32)
    bucket = np.zeros(n, dtype=np.int32)
    if compute_keys:  # skipped for dropped rows — they never reach a shard
        for i in range(n):
            if compute_fp:
                # candidates skip this (compute_fp=False): the gate computes
                # fingerprints AFTER within-round URL dedup, so the expensive
                # canonicalize+SHA1 runs once per unique URL, not per edge
                fp = fingerprint(urls[i], url_is_safe=True)
                fps[i] = fp
                fp64[i] = int.from_bytes(fp[:8], "big")
            shard[i] = stable_hash64(hosts[i]) % cfg.seen_shards
            bucket[i] = stable_hash64(urls[i]) % cfg.fetch_buckets
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "priority": pa.array(priorities, pa.int64()),
            "order_key": pa.array(order_keys, pa.binary()),
            "dont_filter": pa.array(dont_filter, pa.bool_()),
            "already_enqueued": pa.array(already_enqueued, pa.bool_()),
            "is_start": pa.array(is_start, pa.bool_()),
            "fp": pa.array(fps, pa.binary()),
            "fp64": pa.array(fp64, pa.uint64()),
            "shard": pa.array(shard, pa.int32()),
            "bucket": pa.array(bucket, pa.int32()),
        },
        schema=FRONTIER_SCHEMA,
    )


def seeds_to_frontier(batch: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Seed rows ``(url, seq)`` → round-0 frontier (depth 0, priority 0,
    ``dont_filter=True`` — reference start requests,
    ``scrapy/spiders/__init__.py:136-154``)."""
    raw_urls = batch["url"].to_pylist()
    seqs = batch["seq"].to_pylist()
    urls = [safe_url_string(u) for u in raw_urls]
    hosts = [parse_host(u) for u in urls]
    n = len(urls)
    return _frontier_columns(
        urls,
        hosts,
        depths=np.zeros(n, np.int32),
        priorities=np.zeros(n, np.int64),
        order_keys=[int(s).to_bytes(8, "big") for s in seqs],
        dont_filter=np.ones(n, bool),
        already_enqueued=np.zeros(n, bool),
        is_start=np.ones(n, bool),
        cfg=cfg,
    )


EDGE_META_SCHEMA = pa.schema(
    [
        ("dst", pa.string()),
        ("nofollow", pa.bool_()),
        ("link_idx", pa.int32()),
        ("parent_depth", pa.int32()),
        ("parent_order_key", pa.binary()),
    ]
)


def edges_to_candidates(batch: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Edge rows (``EDGE_META_SCHEMA``) → frontier rows + ``drop_reason``.

    Child depth/priority per the reference depth middleware
    (``spidermiddlewares/depth.py:87-90``): ``depth = parent + 1``,
    ``priority = -depth * DEPTH_PRIORITY`` (new Requests start at 0).
    """
    dsts = batch["dst"].to_pylist()
    nofollows = batch["nofollow"].to_pylist()
    link_idxs = batch["link_idx"].to_pylist()
    parent_depths = batch["parent_depth"].to_pylist()
    parent_keys = batch["parent_order_key"].to_pylist()

    n = len(dsts)
    urls = [""] * n
    hosts = [""] * n
    reason = np.zeros(n, dtype=np.int8)
    depths = np.zeros(n, dtype=np.int32)
    order_keys: list[bytes] = [b""] * n
    allowed = cfg.allowed_domains
    for i in range(n):
        # link extractor already produced safe URLs (functions/links.py)
        url = dsts[i]
        urls[i] = url
        depth = parent_depths[i] + 1
        depths[i] = depth
        order_keys[i] = parent_keys[i] + min(link_idxs[i], 0xFFFF).to_bytes(2, "big")
        if nofollows[i] and not cfg.follow_nofollow:
            reason[i] = DROP_NOFOLLOW
            continue
        if len(url) > cfg.urllength_limit:
            reason[i] = DROP_URLLENGTH
            continue
        host = parse_host(url)
        hosts[i] = host
        if not host:
            reason[i] = DROP_BADURL
            continue
        if allowed and not url_is_from_any_domain(url, allowed):
            reason[i] = DROP_OFFSITE
            continue
        if cfg.depth_limit and depth > cfg.depth_limit:
            reason[i] = DROP_DEPTH

    keep_mask = reason == KEEP
    keep_idx = np.flatnonzero(keep_mask)
    table = _frontier_columns(
        [urls[i] for i in keep_idx],
        [hosts[i] for i in keep_idx],
        depths=depths[keep_idx],
        priorities=(-depths[keep_idx].astype(np.int64) * cfg.depth_priority),
        order_keys=[order_keys[i] for i in keep_idx],
        dont_filter=np.zeros(len(keep_idx), bool),
        already_enqueued=np.zeros(len(keep_idx), bool),
        is_start=np.zeros(len(keep_idx), bool),
        cfg=cfg,
        compute_fp=False,
    )
    # dropped rows travel with minimal columns so stats stay one groupby;
    # they are filtered out before the shard shuffle.
    dropped_idx = np.flatnonzero(~keep_mask)
    drop_col = pa.array(
        np.concatenate([np.zeros(len(keep_idx), np.int8), reason[dropped_idx]]),
        pa.int8(),
    )
    if len(dropped_idx):
        dropped = _frontier_columns(
            [urls[i] for i in dropped_idx],
            [hosts[i] for i in dropped_idx],
            depths=depths[dropped_idx],
            priorities=np.zeros(len(dropped_idx), np.int64),
            order_keys=[order_keys[i] for i in dropped_idx],
            dont_filter=np.zeros(len(dropped_idx), bool),
            already_enqueued=np.zeros(len(dropped_idx), bool),
            is_start=np.zeros(len(dropped_idx), bool),
            cfg=cfg,
            compute_keys=False,
        )
        table = pa.concat_tables([table, dropped])
    return table.append_column("drop_reason", drop_col)
