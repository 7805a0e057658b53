"""Sitemap-seeded start path (reference SitemapSpider, spiders/sitemap.py).

Builds a tiny synthetic page table containing a robots.txt with Sitemap:
lines, a gzipped sitemapindex, and two urlsets — then asserts discovery
order, follow/rule regex filtering, alternate links, recursion bound and
end-to-end seeding of a crawl.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scrupyst_ray.sources.sitemap_seeds import seeds_from_sitemaps

HOST = "http://smh.test"

URLSET_A = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:xhtml="http://www.w3.org/1999/xhtml">
  <url><loc>http://smh.test/a1.html</loc>
       <xhtml:link rel="alternate" hreflang="de" href="http://smh.test/de/a1.html"/>
  </url>
  <url><loc>http://smh.test/a2.php</loc></url>
</urlset>"""

URLSET_B = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://smh.test/b1.html</loc></url>
</urlset>"""

INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://smh.test/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>http://smh.test/sitemap-b.xml</loc></sitemap>
  <sitemap><loc>http://smh.test/skipped-archive.xml</loc></sitemap>
</sitemapindex>"""

ROBOTS = b"""User-agent: *
Disallow:

Sitemap: http://smh.test/sitemap-index.xml.gz
"""


@pytest.fixture(scope="module")
def sitemap_pages(tmp_path_factory):
    rows = {
        f"{HOST}/robots.txt": ROBOTS,
        f"{HOST}/sitemap-index.xml.gz": gzip.compress(INDEX),
        f"{HOST}/sitemap-a.xml": URLSET_A,
        f"{HOST}/sitemap-b.xml": URLSET_B,
        # the skipped-archive.xml body exists but must not be read when
        # follow excludes it
        f"{HOST}/skipped-archive.xml": URLSET_B,
        f"{HOST}/a1.html": b"<html>a1</html>",
    }
    out = tmp_path_factory.mktemp("smpages")
    t = pa.table(
        {
            "url": pa.array(list(rows), pa.string()),
            "html": pa.array(list(rows.values()), pa.binary()),
        }
    )
    p = os.path.join(str(out), "pages.parquet")
    pq.write_table(t, p)
    return p


@pytest.mark.usefixtures("ray_session")
class TestSitemapSeeds:
    def test_robots_index_urlset_chain(self, sitemap_pages):
        seeds = seeds_from_sitemaps(
            sitemap_pages, [f"{HOST}/robots.txt"]
        ).to_arrow_refs()
        import ray

        t = pa.concat_tables([ray.get(r) for r in seeds])
        # discovery order: sitemap-a entries, then sitemap-b, then the
        # followed archive (same body as b — deduped by first occurrence)
        assert t["url"].to_pylist() == [
            f"{HOST}/a1.html",
            f"{HOST}/a2.php",
            f"{HOST}/b1.html",
        ]
        assert t["seq"].to_pylist() == [0, 1, 2]

    def test_follow_and_rules_regexes(self, sitemap_pages):
        import ray

        seeds = seeds_from_sitemaps(
            sitemap_pages,
            [f"{HOST}/sitemap-index.xml.gz"],
            follow=[r"sitemap-a"],  # reference sitemap_follow
            rules=[r"\.html$"],  # reference sitemap_rules url regex
        )
        t = pa.concat_tables([ray.get(r) for r in seeds.to_arrow_refs()])
        assert t["url"].to_pylist() == [f"{HOST}/a1.html"]

    def test_alternate_links(self, sitemap_pages):
        import ray

        seeds = seeds_from_sitemaps(
            sitemap_pages,
            [f"{HOST}/sitemap-a.xml"],
            alternate_links=True,
        )
        t = pa.concat_tables([ray.get(r) for r in seeds.to_arrow_refs()])
        assert f"{HOST}/de/a1.html" in t["url"].to_pylist()

    def test_max_depth_bounds_recursion(self, sitemap_pages):
        import ray

        # depth 0 processes only the index itself -> no urlset reached
        seeds = seeds_from_sitemaps(
            sitemap_pages, [f"{HOST}/sitemap-index.xml.gz"], max_depth=0
        )
        t = pa.concat_tables([ray.get(r) for r in seeds.to_arrow_refs()])
        assert t.num_rows == 0

    def test_crawl_from_sitemap_seeds(self, smoke_corpus, tmp_path, sitemap_pages):
        """End-to-end: sitemap seeds feed init_frontier via a parquet file
        (the CLI --seeds-from-sitemaps path)."""
        import ray

        from scrupyst_ray.config import CrawlConfig
        from scrupyst_ray.pipelines.crawl import CrawlEngine

        # seed the smoke corpus with its own real page urls via a sitemap
        pages = pq.read_table(
            os.path.join(smoke_corpus, "pages"), columns=["url"]
        )
        urls = [u for u in pages["url"].to_pylist() if "page000" in u][:3]
        body = (
            b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + b"".join(
                f"<url><loc>{u}</loc></url>".encode() for u in urls
            )
            + b"</urlset>"
        )
        smp = str(tmp_path / "sm.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(["http://x.test/sitemap.xml"]),
                    "html": pa.array([body], pa.binary()),
                }
            ),
            smp,
        )
        seeds = seeds_from_sitemaps(smp, ["http://x.test/sitemap.xml"])
        seeds_file = str(tmp_path / "seeds.parquet")
        t = pa.concat_tables([ray.get(r) for r in seeds.to_arrow_refs()])
        pq.write_table(t, seeds_file)

        cfg = CrawlConfig(seen_shards=4, fetch_buckets=4,
                          concurrent_requests_per_domain=4)
        eng = CrawlEngine.for_corpus(
            os.path.join(smoke_corpus, "pages"), str(tmp_path / "wd"), cfg
        )
        eng.init_frontier(seeds_file)
        res = eng.run(max_rounds=2)
        eng.shutdown_actors()
        assert res.total_fetched >= len(urls)
