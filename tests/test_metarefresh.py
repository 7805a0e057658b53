"""Meta-refresh parsing + middleware rules — cases ported from the
reference ``tests/test_downloadermiddleware_redirect.py``
(TestMetaRefreshMiddleware + test_meta_refresh_schemes)."""

from __future__ import annotations

from scrupyst_ray.functions.metarefresh import (
    get_meta_refresh,
    meta_refresh_target,
)


def body(url: str, interval: float = 5) -> str:
    # reference meta_refresh_body helper (test_downloadermiddleware_redirect.py:1162)
    return (
        f'<html><head><meta http-equiv="refresh" '
        f'content="{interval};url={url}"/></head></html>'
    )


def test_meta_refresh_basic():
    t = meta_refresh_target(body("http://example.org/newpage"), "http://example.org")
    assert t == "http://example.org/newpage"


def test_high_interval_does_not_redirect():
    assert (
        meta_refresh_target(
            body("http://example.org/newpage", interval=1000), "http://example.org"
        )
        is None
    )


def test_ignore_tags_default_noscript():
    html = (
        "<noscript><meta http-equiv=\"refresh\" "
        "content=\"0;URL='http://example.org/newpage'\"></noscript>"
    )
    assert meta_refresh_target(html, "http://example.org") is None


def test_quoted_url_inside_content():
    html = (
        "<meta http-equiv=\"refresh\" "
        "content=\"0;URL='http://example.org/newpage'\">"
    )
    assert (
        meta_refresh_target(html, "http://example.org")
        == "http://example.org/newpage"
    )


def test_relative_url_joined_to_base():
    assert (
        meta_refresh_target(body("/next"), "http://example.com/a")
        == "http://example.com/next"
    )


def test_attribute_order_reversed():
    html = '<meta content="3; url=/b" http-equiv="refresh">'
    assert meta_refresh_target(html, "http://example.com/a") == "http://example.com/b"


def test_comments_removed():
    html = '<!-- <meta http-equiv="refresh" content="0;url=/spam"> -->'
    assert meta_refresh_target(html, "http://example.com/a") is None


def test_non_http_schemes_do_not_redirect():
    # reference test_meta_refresh_schemes: data/file/ftp/s3 → never
    for scheme in ("data", "file", "ftp", "s3", "foo"):
        assert meta_refresh_target(body("http://b.test/x"), f"{scheme}://example.com/a") is None
        assert (
            meta_refresh_target(body(f"{scheme}://example.com/b"), "http://example.com/a")
            is None
        )


def test_get_meta_refresh_interval():
    interval, url = get_meta_refresh(body("http://x.test/", 12.5), "http://x.test")
    assert interval == 12.5
    assert url == "http://x.test/"


def test_no_meta():
    assert get_meta_refresh("<html><body>hi</body></html>", "http://x.test") == (
        None,
        None,
    )
