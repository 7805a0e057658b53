"""Redirect + retry follow-up rows (M9, M10) — columnar re-emission.

In the corpus-replay model there is no live network, so these middlewares
become flat-map stages over a fetched table with synthetic ``status`` /
``redirect_to`` columns:

- redirect (reference ``scrapy/downloadermiddlewares/redirect.py:27-212``):
  3xx + Location ⇒ new frontier row at the target with ``priority + 2``
  (REDIRECT_PRIORITY_ADJUST, ``default_settings.py:447``),
  ``redirect_times + 1`` capped at 20, fragment-preserving urljoin.
  Reference edge semantics (``redirect.py:166-176``): the Location is
  ``safe_url_string``-ed BEFORE the join; a raw ``//``-prefixed Location
  is scheme-relative (``request_scheme + "://" + location.lstrip("/")`` —
  NOT plain urljoin, which would treat ``///host/p`` as an empty-netloc
  path); and a joined target outside http/https does not redirect at all.
- retry (reference ``scrapy/downloadermiddlewares/retry.py:38-179``):
  status ∈ RETRY_HTTP_CODES ⇒ re-emit the SAME url with
  ``retry_times + 1`` (≤ RETRY_TIMES=2), ``dont_filter=True``,
  ``priority - 1`` (RETRY_PRIORITY_ADJUST, ``default_settings.py:467``).
- meta refresh (reference ``redirect.py:184-212``): when the row carries a
  decoded ``text`` column and neither middleware above fired, a
  ``<meta http-equiv=refresh>`` with interval < 100 re-emits the target as
  a redirect (same priority adjust / cap; reason "meta refresh").  Status
  redirects win because process_response runs highest-priority-first and
  RedirectMiddleware (600) precedes MetaRefreshMiddleware (580).

Both emit rows in the frontier schema (plus retry/redirect counters) that the
driver unions into the next round.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

from scrupyst_ray.config import CrawlConfig
from scrupyst_ray.functions.fingerprint import fingerprint
from scrupyst_ray.functions.hashing import stable_hash64
from scrupyst_ray.functions.metarefresh import meta_refresh_target
from scrupyst_ray.functions.urlnorm import parse_host, safe_url_string
from scrupyst_ray.stages.frontier import FRONTIER_SCHEMA

# reference default_settings.py:454-472
RETRY_HTTP_CODES = frozenset([500, 502, 503, 504, 522, 524, 408, 429])
REDIRECT_STATUSES = frozenset([301, 302, 303, 307, 308])
REDIRECT_MAX_TIMES = 20
REDIRECT_PRIORITY_ADJUST = 2
RETRY_TIMES = 2
RETRY_PRIORITY_ADJUST = -1

FOLLOWUP_SCHEMA = pa.schema(
    list(FRONTIER_SCHEMA)
    + [("retry_times", pa.int8()), ("redirect_times", pa.int8())]
)


def _mk_row(
    url: str,
    depth: int,
    priority: int,
    order_key: bytes,
    dont_filter: bool,
    cfg: CrawlConfig,
) -> dict:
    url = safe_url_string(url)
    fp = fingerprint(url, url_is_safe=True)
    host = parse_host(url)
    return {
        "url": url,
        "host": host,
        "depth": depth,
        "priority": priority,
        "order_key": order_key,
        "dont_filter": dont_filter,
        "already_enqueued": False,
        "is_start": False,
        "fp": fp,
        "fp64": int.from_bytes(fp[:8], "big"),
        "shard": stable_hash64(host) % cfg.seen_shards,
        "bucket": stable_hash64(url) % cfg.fetch_buckets,
    }


def followups_batch(batch: pa.Table, cfg: CrawlConfig | None = None) -> pa.Table:
    """Fetched rows (url, status, depth, priority, order_key[, redirect_to,
    retry_times, redirect_times]) → follow-up frontier rows."""
    cfg = cfg or CrawlConfig()
    n = batch.num_rows
    statuses = batch["status"].to_pylist()
    urls = batch["url"].to_pylist()
    depths = batch["depth"].to_pylist() if "depth" in batch.column_names else [0] * n
    prios = batch["priority"].to_pylist() if "priority" in batch.column_names else [0] * n
    keys = (
        batch["order_key"].to_pylist()
        if "order_key" in batch.column_names
        else [i.to_bytes(8, "big") for i in range(n)]
    )
    redirect_to = (
        batch["redirect_to"].to_pylist()
        if "redirect_to" in batch.column_names
        else [None] * n
    )
    retry_times = (
        batch["retry_times"].to_pylist()
        if "retry_times" in batch.column_names
        else [0] * n
    )
    redirect_times = (
        batch["redirect_times"].to_pylist()
        if "redirect_times" in batch.column_names
        else [0] * n
    )
    texts = (
        batch["text"].to_pylist() if "text" in batch.column_names else [None] * n
    )

    rows: list[dict] = []
    rt_out: list[int] = []
    rd_out: list[int] = []
    for i in range(n):
        s = statuses[i]
        if s in REDIRECT_STATUSES and redirect_to[i]:
            if redirect_times[i] >= REDIRECT_MAX_TIMES:
                continue  # IgnoreRequest: max redirections reached
            loc = safe_url_string(redirect_to[i])
            if redirect_to[i].startswith("//"):
                # scheme-relative Location (redirect.py:169-171)
                loc = urls[i].split(":", 1)[0] + "://" + loc.lstrip("/")
            target = urljoin(urls[i], loc)
            if urlsplit(target).scheme not in ("http", "https"):
                continue  # non-http(s) target: no redirect (redirect.py:175)
            rows.append(
                _mk_row(
                    target,
                    depths[i],
                    prios[i] + REDIRECT_PRIORITY_ADJUST,
                    keys[i] + b"\xff\xfd",  # redirect marker suffix
                    dont_filter=False,
                    cfg=cfg,
                )
            )
            rt_out.append(retry_times[i])
            rd_out.append(redirect_times[i] + 1)
        elif s in RETRY_HTTP_CODES:
            if retry_times[i] >= RETRY_TIMES:
                continue  # gave up (stats: retry/max_reached)
            rows.append(
                _mk_row(
                    urls[i],
                    depths[i],
                    prios[i] + RETRY_PRIORITY_ADJUST,
                    keys[i] + b"\xff\xfe",  # retry marker suffix
                    dont_filter=True,  # retry.py: dont_filter=True
                    cfg=cfg,
                )
            )
            rt_out.append(retry_times[i] + 1)
            rd_out.append(redirect_times[i])
        elif texts[i]:
            target = meta_refresh_target(texts[i], urls[i])
            if target is None or redirect_times[i] >= REDIRECT_MAX_TIMES:
                continue
            rows.append(
                _mk_row(
                    target,
                    depths[i],
                    prios[i] + REDIRECT_PRIORITY_ADJUST,
                    keys[i] + b"\xff\xfc",  # meta-refresh marker suffix
                    dont_filter=False,
                    cfg=cfg,
                )
            )
            rt_out.append(retry_times[i])
            rd_out.append(redirect_times[i] + 1)

    cols: dict[str, list] = {name: [] for name in FRONTIER_SCHEMA.names}
    for r in rows:
        for k in cols:
            cols[k].append(r[k])
    out = pa.table(
        {
            **{k: pa.array(cols[k], FRONTIER_SCHEMA.field(k).type) for k in cols},
            "retry_times": pa.array(np.array(rt_out, np.int8), pa.int8()),
            "redirect_times": pa.array(np.array(rd_out, np.int8), pa.int8()),
        },
        schema=FOLLOWUP_SCHEMA,
    )
    return out
