"""Fetch = lookup in a url-hash-bucketed page store, fused with parse.

The reference's HTTP download handler (S1,
``scrapy/core/downloader/handlers/http11_aiohttp.py:42-339``) becomes a table
lookup: the corpus *is* the network.  To make that lookup scale to a 100 TB
page table WITHOUT re-scanning or re-shuffling the corpus every round, the
pages are partitioned ONCE by ``bucket = stable_hash64(url) % B`` (same
function the frontier uses).  Per round:

    admitted.groupby("bucket").map_groups(FetchParse)

and each group task reads ONLY its bucket's parquet fragments with an
``url ∈ frontier`` scan filter — per-round I/O is proportional to the
frontier, not the corpus.  At 10^10-URL design scale B is sized so one
bucket ≈ a few GB (e.g. B=65536 for 100 TB) and fragments stay prunable.

The task is fused fetch→parse: html bytes are decoded
(:mod:`~scrupyst_ray.functions.textextract` — the byte-identical invariant)
and links extracted (:mod:`~scrupyst_ray.functions.links`) INSIDE the task,
so html never crosses a task boundary or enters a shuffle (SURVEY.md §7.4
"drop html immediately after parse").  The task's side output — the fetched
artifact (url, order, status, text) — is written straight to the round's
checkpoint directory (tmp+rename per bucket file, so Ray task retries are
idempotent); the dataset flow carries only edge metadata onward.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from scrupyst_ray.config import CrawlConfig
from scrupyst_ray.functions.hashing import hash_mod_batch
from scrupyst_ray.functions.links import LinkExtractorConfig, extract_links
from scrupyst_ray.functions.textextract import detect_and_decode
from scrupyst_ray.stages.exchange import EXCHANGE_EXT, write_exchange
from scrupyst_ray.stages.frontier import EDGE_META_SCHEMA
from scrupyst_ray.stages.middleware import MiddlewareContext, MiddlewarePipeline

FETCHED_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int64()),
        ("order_key", pa.binary()),
        ("fp", pa.binary()),
        ("status", pa.int16()),  # 200 = hit, 404 = not in corpus
        ("warc_ts", pa.timestamp("us")),
        ("text_len", pa.int64()),
        ("n_links", pa.int32()),
    ]
)


def build_page_store(
    pages_path: str | list[str],
    store_dir: str,
    num_buckets: int,
    *,
    ray_dataset=None,
) -> str:
    """One-time corpus partitioning by url-hash bucket (idempotent).

    Reads only the columns the crawl needs (url, warc_ts, html — column
    pruning at the read, never the oracle ``text`` column), hash-groups by
    bucket and writes ``store_dir/bucket=K/*.parquet``.  The groupby is a
    full corpus shuffle, but it runs ONCE per corpus (this pass IS the
    design-scale partitioning step); the payoff is one compact fragment per
    bucket instead of one per (input block × bucket), which makes the
    per-round bucket probes O(1) file opens.
    """
    import ray

    done = os.path.join(store_dir, "_STORE_COMPLETE")
    if os.path.exists(done):
        return store_dir
    ds = ray_dataset
    if ds is None:
        ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "html"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = hash_mod_batch(batch["url"].to_pylist(), num_buckets)
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    def write_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"bucket": [], "rows": []})
        bucket = group["bucket"][0].as_py()
        bdir = os.path.join(store_dir, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, "part-0.parquet")
        # url-sorted + small row groups: per-round probes filter by
        # ``url ∈ frontier``, and parquet row-group min/max statistics can
        # only prune when urls are clustered — unsorted single-row-group
        # buckets forced every probe to decode the WHOLE bucket (measured
        # as a 1.4× per-task time inflation at 32-way parallelism from
        # memory-bandwidth contention alone)
        group = group.drop_columns(["bucket"]).sort_by("url")
        pq.write_table(group, path + ".tmp", row_group_size=1024)
        os.replace(path + ".tmp", path)
        return pa.table({"bucket": [bucket], "rows": [group.num_rows]})

    (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=num_buckets)
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    with open(done + ".tmp", "w") as f:
        f.write(f"num_buckets={num_buckets}\n")
    os.replace(done + ".tmp", done)
    return store_dir


_ARROW_POOL_CAPPED = False


def _cap_arrow_threads() -> None:
    """Pin this worker's Arrow pools to 1 compute / 2 IO threads.

    Each Ray task worker gets 1 CPU, but pyarrow's global pool defaults to
    os.cpu_count() threads PER PROCESS — 32 concurrent fetch tasks × 32
    parquet-decode threads oversubscribes the node ~32× and shows up as a
    2.3s..15.9s wall-time spread between identical tasks."""
    global _ARROW_POOL_CAPPED
    if not _ARROW_POOL_CAPPED:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _ARROW_POOL_CAPPED = True


# Per-worker-process cache of opened bucket datasets: Ray reuses worker
# processes across tasks and rounds, so the fragment discovery + parquet
# footer parse for a bucket happens once per (worker, bucket) instead of
# once per probe (measured ~15 cpu-s/round of repeated footer work at the
# bench scale).  Keyed by (store_dir, bucket) — stores are immutable once
# _STORE_COMPLETE exists.
_BUCKET_DS_CACHE: dict[tuple[str, int], "pads.Dataset | None"] = {}


def _bucket_dataset(store_dir: str, bucket: int):
    key = (store_dir, bucket)
    ds = _BUCKET_DS_CACHE.get(key, False)
    if ds is False:
        bucket_dir = os.path.join(store_dir, f"bucket={bucket}")
        ds = (
            pads.dataset(bucket_dir, format="parquet")
            if os.path.isdir(bucket_dir)
            else None
        )
        # Cache ONLY when the store's completeness marker exists: a probe
        # that races a store (re)build would otherwise pin None / a stale
        # fragment list for the worker's lifetime (ADVICE r1).
        if os.path.exists(os.path.join(store_dir, "_STORE_COMPLETE")):
            _BUCKET_DS_CACHE[key] = ds
    return ds


def _read_bucket_pages(store_dir: str, bucket: int, urls: list[str]) -> pa.Table:
    """Scan one bucket's fragments with an ``url ∈ urls`` pushdown filter."""
    dataset = _bucket_dataset(store_dir, bucket)
    if dataset is None:
        return pa.table(
            {"url": pa.array([], pa.string()), "warc_ts": pa.array([], pa.timestamp("us")), "html": pa.array([], pa.binary())}
        )
    return dataset.to_table(
        columns=["url", "warc_ts", "html"],
        filter=pc.field("url").isin(urls),
    )


class FetchParse:
    """Fused fetch→parse→candidate stage for one bucket group.

    One task per url-bucket per round: reads the bucket's page bytes, decodes
    text, extracts links, builds + filters next-round candidate rows
    (``stages.frontier.edges_to_candidates``), and side-writes two artifacts
    keyed by the stable bucket id (idempotent tmp+rename, retry-safe):

    - ``fetched/part-K.parquet`` — the crawl-order artifact rows,
    - ``fetched/part-K.stats.json`` — counters (fetched/miss/edges/drops),
      so per-round stats cost zero extra Ray Data executions.
      K is the group's routing key: ``fetch_key`` (a FETCH_SPLIT-way
      sub-split of the store bucket, see pipelines/crawl.py) when present,
      else the bare bucket.

    Returns the KEPT candidate frontier rows (html and dropped candidates
    never leave the task).
    """

    def __init__(
        self,
        store_dir: str,
        round_id: int,
        fetched_dir: str,
        cfg: CrawlConfig | None = None,
        candidates_dir: str | None = None,
    ):
        self.store_dir = store_dir
        self.round_id = round_id
        self.fetched_dir = fetched_dir
        self.cfg = cfg or CrawlConfig()
        self.candidates_dir = candidates_dir
        self.extractor = LinkExtractorConfig()
        # user middleware chains (SURVEY §2.10) — built once per worker
        self.mw = MiddlewarePipeline(self.cfg.middlewares)
        os.makedirs(fetched_dir, exist_ok=True)
        _cap_arrow_threads()

    def __call__(self, group: pa.Table) -> pa.Table:
        from scrupyst_ray.stages.frontier import (
            DROP_REASON_NAMES,
            FRONTIER_SCHEMA,
            edges_to_candidates,
        )

        empty = pa.table(
            {k: [] for k in FRONTIER_SCHEMA.names}, schema=FRONTIER_SCHEMA
        )
        if group.num_rows == 0:
            return empty
        t0 = time.monotonic()
        bucket = group["bucket"][0].as_py()
        part_key = (
            group["fetch_key"][0].as_py()
            if "fetch_key" in group.column_names
            else bucket
        )
        mw_ctx = MiddlewareContext(round_id=self.round_id, bucket=int(bucket))
        if self.mw.has("process_candidates"):
            # downloader-mw process_request analogue: last chance to drop or
            # rewrite admitted rows before the (fetch) store probe
            group = self.mw.run("process_candidates", group, mw_ctx)
            if group.num_rows == 0:
                # whole group dropped pre-fetch: still emit a sidecar so the
                # middleware counters reach the round stats
                stats = {
                    "bucket": int(bucket),
                    "fetched": 0,
                    "miss": 0,
                    "edges": 0,
                    "kept": 0,
                    "drops": {},
                    "phase_s": {},
                }
                if mw_ctx.stats:
                    stats["mw"] = mw_ctx.stats
                sc_path = os.path.join(
                    self.fetched_dir, f"part-{part_key:06d}.stats.json"
                )
                with open(sc_path + ".tmp", "w") as f:
                    json.dump(stats, f)
                os.replace(sc_path + ".tmp", sc_path)
                return empty
        urls = group["url"].to_pylist()
        pages = _read_bucket_pages(self.store_dir, bucket, urls)
        t_read = time.monotonic()
        joined = group.join(pages, keys="url", join_type="left outer")
        # deterministic artifact order within the bucket file
        joined = joined.sort_by([("priority", "descending"), ("order_key", "ascending")])
        if self.mw.has("process_fetched"):
            # downloader-mw process_response analogue, pre-parse: a dropped
            # row is never parsed, so it contributes no edges (mirrors the
            # reference where IgnoreRequest skips the spider callback)
            joined = self.mw.run("process_fetched", joined, mw_ctx)

        j_urls = joined["url"].to_pylist()
        htmls = joined["html"].to_pylist()
        hosts = joined["host"].to_pylist()
        depths = joined["depth"].to_pylist()
        order_keys = joined["order_key"].to_pylist()

        n = len(j_urls)
        statuses = np.full(n, 200, dtype=np.int16)
        text_lens = np.zeros(n, dtype=np.int64)
        n_links = np.zeros(n, dtype=np.int32)

        e_dst: list[str] = []
        e_nofollow: list[bool] = []
        e_link_idx: list[int] = []
        e_pdepth: list[int] = []
        e_pkey: list[bytes] = []

        for i in range(n):
            html = htmls[i]
            if html is None:
                statuses[i] = 404  # fetch-miss (URL not in corpus), SURVEY.md S1
                continue
            encoding, text = detect_and_decode(html)
            text_lens[i] = len(text)
            links = extract_links(
                text, j_urls[i], encoding, self.extractor, collect_text=False
            )
            n_links[i] = len(links)
            for li, link in enumerate(links):
                e_dst.append(link.url)
                e_nofollow.append(link.nofollow)
                e_link_idx.append(li)
                e_pdepth.append(depths[i])
                e_pkey.append(order_keys[i])
        t_parse = time.monotonic()

        fetched = pa.table(
            {
                "round": pa.array(np.full(n, self.round_id, np.int32), pa.int32()),
                "url": joined["url"],
                "host": pa.array(hosts, pa.string()),
                "depth": pa.array(depths, pa.int32()),
                "priority": joined["priority"],
                "order_key": pa.array(order_keys, pa.binary()),
                "fp": joined["fp"],
                "status": pa.array(statuses, pa.int16()),
                "warc_ts": joined["warc_ts"],
                "text_len": pa.array(text_lens, pa.int64()),
                "n_links": pa.array(n_links, pa.int32()),
            },
            schema=FETCHED_SCHEMA,
        )
        if self.mw.has("process_items"):
            # item-pipeline analogue: transform/drop artifact rows before the
            # sink write (DropItem = filtered-out row)
            fetched = self.mw.run("process_items", fetched, mw_ctx)
        out_path = os.path.join(self.fetched_dir, f"part-{part_key:06d}.parquet")
        pq.write_table(fetched, out_path + ".tmp")
        os.replace(out_path + ".tmp", out_path)  # idempotent on task retry

        edges = pa.table(
            {
                "dst": pa.array(e_dst, pa.string()),
                "nofollow": pa.array(e_nofollow, pa.bool_()),
                "link_idx": pa.array(e_link_idx, pa.int32()),
                "parent_depth": pa.array(e_pdepth, pa.int32()),
                "parent_order_key": pa.array(e_pkey, pa.binary()),
            },
            schema=EDGE_META_SCHEMA,
        )
        if self.mw.has("process_edges"):
            # spider-mw process_spider_output analogue: extracted edges
            # before the candidate filter chain
            edges = self.mw.run("process_edges", edges, mw_ctx)
        kept, drop_counts = edges_to_candidates(edges, self.cfg)
        drops = {DROP_REASON_NAMES[r]: c for r, c in drop_counts.items()}
        t_cand = time.monotonic()
        # Map-side partitioned exchange: write the kept candidates ALREADY
        # split by their owning seen/politeness shard, so next round's gate
        # task reads its shard's files directly and the frontier NEVER rides
        # an all-to-all shuffle (the per-round sort of millions of candidate
        # rows was the dominant non-parallel cost — only the small admitted
        # set is ever exchanged through Ray Data).  File per (shard, fetch
        # group) with tmp+rename keyed by the stable part_key: idempotent on
        # task retry, and the files ARE the resume checkpoint.
        if self.candidates_dir is not None and kept.num_rows:
            cap = self.cfg.map_side_host_cap
            if cap:
                # phase-1 of the salted two-phase top-k (SURVEY §7.4): local
                # per-host rank bound under the SAME order the budget draw
                # sorts by, so every globally-admittable row survives
                ok_dir = (
                    "descending" if self.cfg.order_mode == "dfo" else "ascending"
                )
                order = pc.sort_indices(
                    kept,
                    sort_keys=[
                        ("host", "ascending"),
                        ("priority", "descending"),
                        ("order_key", ok_dir),
                    ],
                )
                kept = kept.take(order)
                hosts_np = kept["host"].to_numpy(zero_copy_only=False)
                m = kept.num_rows
                change = np.empty(m, dtype=bool)
                change[0] = True
                change[1:] = hosts_np[1:] != hosts_np[:-1]
                start = np.maximum.accumulate(np.where(change, np.arange(m), 0))
                kept = kept.filter(pa.array(np.arange(m) - start < cap))
            shards_col = kept["shard"].to_numpy(zero_copy_only=False)
            for shard_id in np.unique(shards_col):
                sub = kept.filter(pa.array(shards_col == shard_id))
                sdir = os.path.join(self.candidates_dir, f"shard-{shard_id:05d}")
                os.makedirs(sdir, exist_ok=True)
                write_exchange(
                    sub,
                    os.path.join(sdir, f"from-{part_key:06d}{EXCHANGE_EXT}"),
                )
        t_write = time.monotonic()
        stats = {
            "bucket": int(bucket),
            "fetched": int((statuses == 200).sum()),
            "miss": int((statuses != 200).sum()),
            "edges": int(edges.num_rows),
            "kept": int(kept.num_rows),
            "drops": drops,
            # per-phase wall (s): store probe / decode+parse+links / artifact
            # write + candidate build / sharded candidate write — lets the
            # driver see where fetch-task time goes without extra executions
            "phase_s": {
                "read": round(t_read - t0, 3),
                "parse": round(t_parse - t_read, 3),
                "emit": round(t_cand - t_parse, 3),
                "write": round(t_write - t_cand, 3),
            },
        }
        if mw_ctx.stats:
            stats["mw"] = mw_ctx.stats
        if self.cfg.autothrottle_enabled:
            # per-host observations for the AutoThrottle feedback loop (ST5):
            # host -> [sum_html_bytes, n_fetches, n_ok]; the engine converts
            # bytes to a deterministic proxy latency (config
            # autothrottle_sim_bandwidth) and feeds the owning state shard
            host_obs: dict[str, list[int]] = {}
            for i in range(n):
                ob = host_obs.setdefault(hosts[i], [0, 0, 0])
                ob[1] += 1
                if htmls[i] is not None:
                    ob[0] += len(htmls[i])
                    ob[2] += 1
            stats["host_obs"] = host_obs
        sc_path = os.path.join(self.fetched_dir, f"part-{part_key:06d}.stats.json")
        with open(sc_path + ".tmp", "w") as f:
            json.dump(stats, f)
        os.replace(sc_path + ".tmp", sc_path)
        if self.candidates_dir is None:
            return kept
        return empty
