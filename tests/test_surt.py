"""SURT canonicalization (functions/surt.py) — hand-pinned cases from the
public SURT spec, plus the CDX index pipeline shape."""

import pytest

from scrupyst_ray.functions.surt import surt


class TestSurt:
    @pytest.mark.parametrize(
        "url,want",
        [
            ("http://example.com/", "com,example)/"),
            ("http://example.com", "com,example)/"),
            ("https://www.Example.COM/Path?b=2&a=1#f", "com,example)/path?a=1&b=2"),
            ("http://example.com:80/x", "com,example)/x"),
            ("https://example.com:443/x", "com,example)/x"),
            ("http://example.com:8080/x", "com,example:8080)/x"),
            ("http://a.b.c.example.com/", "com,example,c,b,a)/"),
            ("http://127.0.0.1:8000/x", "127.0.0.1:8000)/x"),
            ("http://localhost/x", "localhost)/x"),
            ("http://user:pw@example.com/a", "com,example)/a"),
            ("http://www2.host001.test/p/1.html", "test,host001)/p/1.html"),
            ("http://example.com/?", "com,example)/"),
            ("http://example.com/a?z=1&y=2&y=1", "com,example)/a?y=1&y=2&z=1"),
            ("http://warc.corpus.local/en/123", "local,corpus,warc)/en/123"),
        ],
    )
    def test_pinned(self, url, want):
        assert surt(url) == want

    def test_sort_contiguity(self):
        # the point of SURT: one registered domain's captures sort together
        keys = sorted(
            surt(u)
            for u in [
                "http://a.example.com/1",
                "http://zz-other.test/x",
                "http://b.example.com/2",
                "http://example.com/3",
                "http://aaa-first.test/x",
            ]
        )
        ex = [k for k in keys if k.startswith("com,example")]
        i = keys.index(ex[0])
        assert keys[i : i + len(ex)] == ex  # contiguous run


class TestCdxIndex:
    def test_sorted_and_complete(self, ray_session):
        from scrupyst_ray.pipelines.webops import cdx_index

        t = cdx_index("/root/testdata/sf0.001").take_all()
        assert len(t) == 500
        surts = [r["surt"] for r in t]
        assert surts == sorted(surts)
        r0 = t[0]
        assert r0["surt"].startswith("local,corpus,warc)/")
        assert r0["url"].startswith("http://warc.corpus.local/")
        assert len(r0["digest"]) == 32
