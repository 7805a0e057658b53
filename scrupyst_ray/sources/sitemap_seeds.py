"""Sitemap-seeded crawls — the reference ``SitemapSpider`` start path.

Reference semantics (``scrapy/spiders/sitemap.py:26-99``):

- start urls are sitemap documents; a robots.txt start url contributes its
  ``Sitemap:`` lines instead (``utils/sitemap.py:50-59``),
- a ``<sitemapindex>`` entry is followed (recursively) only if it matches
  one of the ``sitemap_follow`` regexes (default: follow all),
- a ``<urlset>`` entry becomes a seed if it matches one of the
  ``sitemap_rules`` url regexes (default: all); with
  ``sitemap_alternate_links`` the ``xhtml:link`` alternates seed too,
- ``.xml.gz`` bodies are gunzipped by magic sniff.

Corpus-replay mapping: "fetching" a sitemap url is a filtered read of the
page table (``url ∈ pending`` pushdown — I/O ∝ number of sitemap documents,
never the corpus).  The recursion depth is the sitemap-index nesting level,
bounded by *max_depth*.  Seed order is deterministic: (discovery level,
parent order, entry order) — the same order the reference's depth-first
yield produces for a breadth-level walk.

The sitemap-document reads run driver-side on purpose: even at 10^10-URL
design scale a site's sitemap tree is thousands of documents, not billions
— the OUTPUT (the seed list) is what can be huge, and it is returned as a
Ray Dataset and never re-collected.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from scrupyst_ray.functions.sitemap import Sitemap, sitemap_urls_from_robots


def seeds_from_sitemaps(
    pages_path: str | list[str],
    sitemap_urls: list[str],
    *,
    follow: list[str] | None = None,
    rules: list[str] | None = None,
    alternate_links: bool = False,
    max_depth: int = 5,
):
    """→ seeds Dataset ``(url, seq)`` from sitemap documents in the page
    table.  See module docstring for the reference contract."""
    import ray
    import ray.data

    follow_res = [re.compile(r) for r in (follow if follow is not None else [""])]
    rule_res = [re.compile(r) for r in (rules if rules is not None else [""])]

    dataset = pads.dataset(pages_path, format="parquet")

    def fetch(urls: list[str]) -> dict[str, bytes]:
        if not urls:
            return {}
        t = dataset.to_table(
            columns=["url", "html"], filter=pc.field("url").isin(urls)
        )
        return dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))

    seeds: list[str] = []
    seen_docs: set[str] = set()
    pending = list(dict.fromkeys(sitemap_urls))
    for _level in range(max_depth + 1):
        if not pending:
            break
        bodies = fetch([u for u in pending if u not in seen_docs])
        seen_docs.update(pending)
        next_pending: list[str] = []
        for url in pending:  # preserve request order, not fetch order
            body = bodies.get(url)
            if body is None:
                continue  # sitemap-miss: reference drops the response
            if url.endswith("/robots.txt"):
                next_pending.extend(
                    u
                    for u in sitemap_urls_from_robots(
                        body.decode("utf-8", "ignore"), base_url=url
                    )
                    if u not in seen_docs
                )
                continue
            try:
                sm = Sitemap(body)
            except Exception:
                continue  # unparseable: reference logs + skips
            if sm.type == "sitemapindex":
                for entry in sm:
                    loc = entry["loc"]
                    if loc not in seen_docs and any(
                        r.search(loc) for r in follow_res
                    ):
                        next_pending.append(loc)
            elif sm.type == "urlset":
                for entry in sm:
                    locs = [entry["loc"]]
                    if alternate_links:
                        locs.extend(entry.get("alternate", []))
                    for loc in locs:
                        if any(r.search(loc) for r in rule_res):
                            seeds.append(loc)
        pending = next_pending

    # reference start requests keep first occurrence per url (dupefilter
    # would drop the rest anyway); seq = discovery order
    uniq = list(dict.fromkeys(seeds))
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(uniq, pa.string()),
                "seq": pa.array(range(len(uniq)), pa.int64()),
            }
        )
    )
