"""Sitemap parsing (M15) — reference ``scrapy/utils/sitemap.py:19-59`` +
``scrapy/spiders/sitemap.py:101-132``.

Iterates <urlset>/<sitemapindex> entries (namespace-insensitive, like the
reference's lxml pass which strips namespaces), extracts ``Sitemap:`` lines
from robots.txt, and gunzips .xml.gz bodies by magic sniff.  stdlib
``xml.etree`` (lxml is not in this container).
"""

from __future__ import annotations

import re
from xml.etree import ElementTree

import pyarrow as pa

from scrupyst_ray.functions.compression import gunzip, is_gzipped

_TAG_RE = re.compile(r"\{.*\}")


def _local(tag: str) -> str:
    return _TAG_RE.sub("", tag).lower()


class Sitemap:
    """Parsed sitemap: ``type`` ∈ {'urlset', 'sitemapindex'}; iterate dicts
    of child-element text keyed by local tag name (reference Sitemap class
    shape, ``utils/sitemap.py:19-47``)."""

    def __init__(self, xmltext: bytes):
        if is_gzipped(xmltext):
            xmltext = gunzip(xmltext)
        root = ElementTree.fromstring(xmltext)
        self.type = _local(root.tag)
        self._root = root

    def __iter__(self):
        for entry in self._root:
            d: dict[str, str] = {}
            for el in entry:
                name = _local(el.tag)
                if name == "link":  # xhtml:link alternates carry href
                    href = el.get("href")
                    if href:
                        d.setdefault("alternate", []).append(href)  # type: ignore[union-attr]
                else:
                    text = (el.text or "").strip()
                    if text:
                        d[name] = text
            if "loc" in d:
                yield d


def sitemap_urls_from_robots(robots_text: str, base_url: str = "") -> list[str]:
    """``Sitemap:`` lines from a robots.txt body (reference
    ``utils/sitemap.py:50-59``), resolved against the robots URL."""
    from urllib.parse import urljoin

    urls = []
    for line in robots_text.splitlines():
        if line.strip().lower().startswith("sitemap:"):
            url = line.split(":", 1)[1].strip()
            urls.append(urljoin(base_url, url))
    return urls


def sitemap_batch(batch: pa.Table, body_col: str = "html", url_col: str = "url") -> pa.Table:
    """Pages that are sitemaps → (src, loc, lastmod, kind) rows (flat-map
    shape for seeding a crawl from sitemap indexes)."""
    src_out: list[str] = []
    loc_out: list[str] = []
    lastmod_out: list[str] = []
    kind_out: list[str] = []
    for url, body in zip(batch[url_col].to_pylist(), batch[body_col].to_pylist()):
        try:
            sm = Sitemap(body or b"")
        except ElementTree.ParseError:
            continue
        for entry in sm:
            src_out.append(url)
            loc_out.append(entry["loc"])
            lastmod_out.append(entry.get("lastmod", ""))
            kind_out.append(sm.type)
    return pa.table(
        {
            "src": pa.array(src_out, pa.string()),
            "loc": pa.array(loc_out, pa.string()),
            "lastmod": pa.array(lastmod_out, pa.string()),
            "kind": pa.array(kind_out, pa.string()),
        }
    )
