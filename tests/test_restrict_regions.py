"""Region-restricted link extraction — the ``restrict_xpaths`` /
``restrict_css`` analog, with fixtures and expectations ported from the
reference ``tests/test_linkextractors.py:226-292`` (the selectors are
expressed in the CSS subset tag/#id/.class)."""

from __future__ import annotations

import pytest

from scrupyst_ray.functions.links import (
    LinkExtractorConfig,
    extract_links,
    parse_region_selector,
)

# reference tests/sample_data/link_extractor/linkextractor.html (verbatim)
FIXTURE = """<!DOCTYPE html>

<html>
  <head>
    <base href='http://example.com' />
    <title>Sample page with links for testing LinkExtractor</title>
  </head>
  <body>
    <div id='wrapper'>
      <div id='subwrapper'>
        <area href='sample1.html' alt='sample1'/>
        <a href='sample2.html'>sample 2<img src='sample2.jpg' alt='sample2'/></a>
      </div>
      <a href='http://example.com/sample3.html' title='sample 3'>sample 3 text</a>
      <a href='sample3.html'>sample 3 repetition</a>
      <a href='sample3.html'>sample 3 repetition</a>
      <a href='sample3.html#foo'>sample 3 repetition with fragment</a>
      <a href='http://www.google.com/something'></a>
      <a href='http://example.com/innertag.html'><strong>inner</strong> tag</a>
      <a href='page 4.html'>href with whitespaces</a>
    </div>
  </body>
</html>"""

URL = "http://example.com/index"


def urls(cfg):
    return [link.url for link in extract_links(FIXTURE, URL, config=cfg)]


def test_restrict_subwrapper():
    # reference test_restrict_xpaths: //div[@id="subwrapper"]
    cfg = LinkExtractorConfig(restrict_regions=["div#subwrapper"])
    assert urls(cfg) == [
        "http://example.com/sample1.html",
        "http://example.com/sample2.html",
    ]
    # anchor text comes through for the <a>
    links = extract_links(FIXTURE, URL, config=cfg)
    assert links[1].text == "sample 2"


def test_restrict_by_class():
    # reference test_restrict_xpaths_encoding: //div[@class='links']
    html = (
        "<html><head><title>Page title</title></head>"
        "<body><p><a href=\"item/12.html\">Item 12</a></p>"
        "<div class='links'>"
        "<p><a href=\"/about.html\">About us</a></p>"
        "</div>"
        "<div>"
        "<p><a href=\"/nofollow.html\">This shouldn't be followed</a></p>"
        "</div>"
        "</body></html>"
    )
    cfg = LinkExtractorConfig(restrict_regions=["div.links"])
    got = [
        link.url
        for link in extract_links(html, "http://example.org/somepage/index.html", config=cfg)
    ]
    assert got == ["http://example.org/about.html"]


def test_restrict_tag_only():
    # reference test_restrict_xpaths_with_html_entities-style: //p
    html = '<html><body><p><a href="/sub/">text</a></p><a href="/top/">top</a></body></html>'
    cfg = LinkExtractorConfig(restrict_regions=["p"])
    got = [link.url for link in extract_links(html, "http://example.org/", config=cfg)]
    assert got == ["http://example.org/sub/"]


def test_restrict_bare_id():
    cfg = LinkExtractorConfig(restrict_regions=["#subwrapper"])
    assert urls(cfg) == [
        "http://example.com/sample1.html",
        "http://example.com/sample2.html",
    ]


def test_anchor_itself_may_match():
    # restrict_css("a.nav") analog: the anchor element itself matches
    html = '<a class="nav" href="/a">A</a><a href="/b">B</a>'
    cfg = LinkExtractorConfig(restrict_regions=["a.nav"])
    got = [link.url for link in extract_links(html, "http://x.test/", config=cfg)]
    assert got == ["http://x.test/a"]


def test_multiple_regions_union():
    html = (
        '<nav><a href="/n">n</a></nav>'
        '<div id="m"><a href="/m">m</a></div>'
        '<a href="/out">out</a>'
    )
    cfg = LinkExtractorConfig(restrict_regions=["nav", "#m"])
    got = [link.url for link in extract_links(html, "http://x.test/", config=cfg)]
    assert got == ["http://x.test/n", "http://x.test/m"]


def test_region_closes():
    html = '<div class="r"><a href="/in">i</a></div><a href="/after">a</a>'
    cfg = LinkExtractorConfig(restrict_regions=[".r"])
    got = [link.url for link in extract_links(html, "http://x.test/", config=cfg)]
    assert got == ["http://x.test/in"]


def test_no_regions_means_all():
    assert len(urls(LinkExtractorConfig())) > 5


def test_bad_selector_rejected():
    with pytest.raises(ValueError):
        LinkExtractorConfig(restrict_regions=["div > a"])


def test_selector_parse():
    assert parse_region_selector("div#x") == ("div", "x", None)
    assert parse_region_selector(".cls") == (None, None, "cls")
    assert parse_region_selector("NAV") == ("nav", None, None)
