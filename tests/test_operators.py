"""Tests for the remaining reference-operator kernels: response sniffing
(M13), referer policies (M8), decompression (M11), sitemap parsing (M15),
redirect/retry follow-ups (M9/M10)."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from scrupyst_ray.config import CrawlConfig
from scrupyst_ray.functions.compression import (
    decode_body,
    decompress_batch,
    gunzip,
    is_gzipped,
)
from scrupyst_ray.functions.referer import POLICIES, referer_for
from scrupyst_ray.functions.sitemap import (
    Sitemap,
    sitemap_batch,
    sitemap_urls_from_robots,
)
from scrupyst_ray.functions.sniff import sniff_batch, sniff_type
from scrupyst_ray.stages.followup import followups_batch


class TestSniff:
    # reference responsetypes.py ordered rules
    def test_content_type_first(self):
        assert sniff_type(b"", "x", b"text/html; charset=utf-8") == "html"
        assert sniff_type(b"", "x", b"application/rss+xml") == "xml"
        assert sniff_type(b"", "x", b"text/plain") == "text"
        assert sniff_type(b"", "x", b"application/octet-stream") == "binary"

    def test_batch_content_type_column(self):
        import pyarrow as pa

        b = pa.table(
            {
                "url": ["http://x/a", "http://x/b", "http://x/c"],
                "html": pa.array([b"<html>", b"<html>", b"<html>"], pa.binary()),
                "content_type": pa.array(
                    ["application/pdf", None, "text/xml"], pa.string()
                ),
            }
        )
        out = sniff_batch(b)
        assert out["kind"].to_pylist() == ["binary", "html", "xml"]
        assert out["is_xml"].to_pylist() == [False, False, True]

    def test_body_sniff(self):
        assert sniff_type(b"<!DOCTYPE html><html>") == "html"
        assert sniff_type(b"  <html><body>") == "html"
        assert sniff_type(b'<?xml version="1.0"?><urlset/>') == "xml"
        assert sniff_type(b"plain words") == "text"
        assert sniff_type(b"ab\x00cd") == "binary"

    def test_url_extension(self):
        assert sniff_type(b"irrelevant", "http://x/a.pdf") == "binary"
        assert sniff_type(b"", "http://x/a.html") == "html"
        assert sniff_type(b"", "http://x/feed.rss") == "xml"

    def test_encoding_suffix_falls_through_to_body(self):
        # reference responsetypes.py:96-101 — mimetypes reports .gz as an
        # *encoding*, so from_filename punts and from_body decides.
        assert sniff_type(b'<?xml version="1.0"?><urlset/>', "http://x/sitemap.xml.gz") == "xml"
        assert sniff_type(b"\x1f\x8b\x00garbage", "http://x/sitemap.xml.gz") == "binary"

    def test_batch(self):
        t = pa.table(
            {"url": ["http://a/x", "http://a/y"], "html": [b"<html>", b"hello"]}
        )
        out = sniff_batch(t)
        assert out["is_html"].to_pylist() == [True, False]
        assert out["is_text"].to_pylist() == [False, True]


class TestReferer:
    P, C_SAME = "https://site.test/page/1?q=2#frag", "https://site.test/other"
    C_CROSS, C_DOWN = "https://elsewhere.test/x", "http://site.test/insecure"

    def test_default_no_referrer_when_downgrade(self):
        assert referer_for(self.P, self.C_SAME) == "https://site.test/page/1?q=2"
        assert referer_for(self.P, self.C_DOWN) is None

    def test_unsafe_url(self):
        assert (
            referer_for(self.P, self.C_DOWN, "unsafe-url")
            == "https://site.test/page/1?q=2"
        )

    def test_origin_policies(self):
        assert referer_for(self.P, self.C_CROSS, "origin") == "https://site.test/"
        assert referer_for(self.P, self.C_DOWN, "strict-origin") is None
        assert (
            referer_for(self.P, self.C_CROSS, "origin-when-cross-origin")
            == "https://site.test/"
        )
        assert (
            referer_for(self.P, self.C_SAME, "origin-when-cross-origin")
            == "https://site.test/page/1?q=2"
        )

    def test_same_origin(self):
        assert referer_for(self.P, self.C_CROSS, "same-origin") is None
        assert referer_for(self.P, self.C_SAME, "same-origin") is not None

    def test_no_referrer(self):
        assert referer_for(self.P, self.C_SAME, "no-referrer") is None

    def test_all_policies_total(self):
        for p in POLICIES:
            referer_for(self.P, self.C_CROSS, p)  # no exceptions
        with pytest.raises(ValueError):
            referer_for(self.P, self.C_SAME, "bogus")


class TestCompression:
    def test_gzip_roundtrip(self):
        body = b"<html>hello compressed world</html>"
        assert gunzip(gzip.compress(body)) == body
        assert is_gzipped(gzip.compress(body))
        assert not is_gzipped(body)

    def test_truncated_gzip_returns_partial(self):
        data = gzip.compress(b"x" * 100000)[:-20]
        out = gunzip(data)
        assert out.startswith(b"xxx")

    def test_deflate(self):
        import zlib

        body = b"deflated body"
        assert decode_body(zlib.compress(body), "deflate") == body
        # raw deflate (no zlib header) also accepted
        co = zlib.compressobj(wbits=-15)
        raw = co.compress(body) + co.flush()
        assert decode_body(raw, "deflate") == body

    def test_identity_passthrough(self):
        assert decode_body(b"abc", "identity") == b"abc"

    def test_batch_magic_sniff(self):
        t = pa.table(
            {"html": [gzip.compress(b"<html>a</html>"), b"<html>b</html>"]}
        )
        out = decompress_batch(t)
        assert out["html"].to_pylist() == [b"<html>a</html>", b"<html>b</html>"]


SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.test/1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://a.test/2</loc></url>
</urlset>"""

SITEMAP_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.test/sitemap1.xml.gz</loc></sitemap>
</sitemapindex>"""


class TestSitemap:
    def test_urlset(self):
        sm = Sitemap(SITEMAP)
        assert sm.type == "urlset"
        entries = list(sm)
        assert [e["loc"] for e in entries] == ["http://a.test/1", "http://a.test/2"]
        assert entries[0]["lastmod"] == "2024-01-01"

    def test_sitemapindex_and_gzip(self):
        sm = Sitemap(gzip.compress(SITEMAP_INDEX))
        assert sm.type == "sitemapindex"
        assert [e["loc"] for e in sm] == ["http://a.test/sitemap1.xml.gz"]

    def test_robots_sitemap_lines(self):
        robots = "User-agent: *\nSitemap: http://a.test/sm.xml\nSitemap: /rel.xml\n"
        assert sitemap_urls_from_robots(robots, "http://a.test/robots.txt") == [
            "http://a.test/sm.xml",
            "http://a.test/rel.xml",
        ]

    def test_batch(self):
        t = pa.table(
            {"url": ["http://a.test/sm.xml", "http://a.test/bad"],
             "html": [SITEMAP, b"not xml"]}
        )
        out = sitemap_batch(t)
        assert out.num_rows == 2
        assert out["kind"].to_pylist() == ["urlset", "urlset"]


class TestFollowups:
    CFG = CrawlConfig(seen_shards=4, fetch_buckets=4)

    def _batch(self, **over):
        base = {
            "url": ["http://a.test/x", "http://a.test/y", "http://a.test/z"],
            "status": [301, 503, 200],
            "depth": [1, 1, 1],
            "priority": [-1, -1, -1],
            "order_key": [b"\x00\x01", b"\x00\x02", b"\x00\x03"],
            "redirect_to": ["/moved", None, None],
        }
        base.update(over)
        return pa.table(base)

    def test_redirect_and_retry_emitted(self):
        out = followups_batch(self._batch(), self.CFG)
        assert out.num_rows == 2
        rows = out.to_pylist()
        redir = next(r for r in rows if r["redirect_times"] == 1)
        assert redir["url"] == "http://a.test/moved"
        assert redir["priority"] == -1 + 2  # REDIRECT_PRIORITY_ADJUST
        assert not redir["dont_filter"]
        retry = next(r for r in rows if r["retry_times"] == 1)
        assert retry["url"] == "http://a.test/y"
        assert retry["priority"] == -1 - 1  # RETRY_PRIORITY_ADJUST
        assert retry["dont_filter"]  # retry.py: bypass dupefilter

    def test_retry_cap(self):
        out = followups_batch(
            self._batch(status=[503, 503, 200], retry_times=[2, 1, 0]), self.CFG
        )
        # first row exhausted RETRY_TIMES=2 → dropped; second retried
        assert out.num_rows == 1
        assert out["retry_times"].to_pylist() == [2]

    def test_redirect_cap(self):
        out = followups_batch(
            self._batch(redirect_times=[20, 0, 0]), self.CFG
        )
        # row 0's redirect capped out (20 = max) → dropped; the surviving
        # row is row 1's retry, whose redirect_times stays 0
        assert out.num_rows == 1
        assert out["redirect_times"].to_pylist() == [0]
        assert out["retry_times"].to_pylist() == [1]

    def test_no_followups(self):
        out = followups_batch(self._batch(status=[200, 200, 200]), self.CFG)
        assert out.num_rows == 0


class TestRedirectSchemeMatrix:
    """Reference scheme semantics, ported from
    tests/test_downloadermiddleware_redirect.py (REDIRECT_SCHEME_CASES,
    test_redirect_302_relative, test_utf8_location)."""

    CFG = CrawlConfig(seen_shards=4, fetch_buckets=4)

    def _one(self, url: str, location: str):
        t = pa.table(
            {
                "url": [url],
                "status": [301],
                "depth": [0],
                "priority": [0],
                "order_key": [b"\x00"],
                "redirect_to": [location],
            }
        )
        out = followups_batch(t, self.CFG)
        return out["url"].to_pylist()[0] if out.num_rows else None

    def test_scheme_matrix(self):
        # http/https → http/https follows; → data/file/ftp/s3/foo does not
        for in_s in ("http", "https"):
            for out_s in ("http", "https"):
                got = self._one(f"{in_s}://example.com/a", f"{out_s}://example.com/b")
                assert got == f"{out_s}://example.com/b"
            for out_s in ("data", "file", "ftp", "s3", "foo"):
                got = self._one(f"{in_s}://example.com/a", f"{out_s}://example.com/b")
                assert got is None, (in_s, out_s, got)

    def test_relative_locations(self):
        for scheme in ("http", "https"):
            assert (
                self._one(f"{scheme}://example.com/a", "//example.com/b")
                == f"{scheme}://example.com/b"
            )
            assert (
                self._one(f"{scheme}://example.com/a", "/b")
                == f"{scheme}://example.com/b"
            )

    def test_triple_slash_is_scheme_relative(self):
        # reference test_redirect_302_relative: ///host/p keeps the host
        assert (
            self._one("http://www.example.com/302", "///i8n.example2.com/302")
            == "http://i8n.example2.com/302"
        )

    def test_utf8_location_percent_encoded(self):
        # reference test_utf8_location (str-typed column ≡ utf-8 header)
        assert (
            self._one("http://scrapytest.org/first", "/ação")
            == "http://scrapytest.org/a%C3%A7%C3%A3o"
        )
