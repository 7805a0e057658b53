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
    for expr in ("div >", "> a", "div > > a", "div + a"):
        with pytest.raises(ValueError):
            LinkExtractorConfig(restrict_regions=[expr])


def test_selector_parse():
    assert parse_region_selector("div#x") == ("div", "x", None)
    assert parse_region_selector(".cls") == (None, None, "cls")
    assert parse_region_selector("NAV") == ("nav", None, None)


class TestXPathSubsetChains:
    """Round-3 upgrade: the common restrict_xpaths/restrict_css shapes —
    //-separated descendant chains and @id/@class predicates (lxml
    semantics: @class= is EXACT attr equality, contains() is substring)."""

    def test_xpath_id_predicate(self):
        # identical to the reference test_restrict_xpaths expression
        cfg = LinkExtractorConfig(restrict_regions=['//div[@id="subwrapper"]'])
        assert urls(cfg) == [
            "http://example.com/sample1.html",
            "http://example.com/sample2.html",
        ]

    def test_xpath_descendant_chain(self):
        # wrapper//subwrapper chain: same two anchors
        cfg = LinkExtractorConfig(
            restrict_regions=["//div[@id='wrapper']//div[@id='subwrapper']"]
        )
        assert urls(cfg) == [
            "http://example.com/sample1.html",
            "http://example.com/sample2.html",
        ]

    def test_xpath_star_and_anchor_step(self):
        # chain ending at the <a> elements themselves
        cfg = LinkExtractorConfig(restrict_regions=["//*[@id='subwrapper']//a"])
        assert urls(cfg) == ["http://example.com/sample2.html"]

    def test_xpath_chain_requires_order(self):
        # subwrapper//wrapper never matches (wrong nesting order)
        cfg = LinkExtractorConfig(
            restrict_regions=["//div[@id='subwrapper']//div[@id='wrapper']"]
        )
        assert urls(cfg) == []

    def test_css_descendant_chain(self):
        cfg = LinkExtractorConfig(restrict_regions=["#wrapper #subwrapper"])
        assert urls(cfg) == [
            "http://example.com/sample1.html",
            "http://example.com/sample2.html",
        ]

    def test_class_exact_vs_token(self):
        html = (
            "<html><body>"
            "<div class='nav main'><a href='a.html'>a</a></div>"
            "<div class='nav'><a href='b.html'>b</a></div>"
            "</body></html>"
        )
        base = "http://x.test/"
        exact = LinkExtractorConfig(restrict_regions=["//div[@class='nav']"])
        got = [l.url for l in extract_links(html, base, config=exact)]
        assert got == ["http://x.test/b.html"]  # exact attr equality
        token = LinkExtractorConfig(restrict_regions=["div.nav"])
        got = [l.url for l in extract_links(html, base, config=token)]
        assert got == ["http://x.test/a.html", "http://x.test/b.html"]
        sub = LinkExtractorConfig(
            restrict_regions=["//div[contains(@class,'main')]"]
        )
        got = [l.url for l in extract_links(html, base, config=sub)]
        assert got == ["http://x.test/a.html"]

    def test_chain_needs_two_distinct_elements(self):
        # one element matching both steps must NOT complete the chain
        html = (
            "<html><body><div class='a b'><a href='x.html'>x</a></div>"
            "<div class='a'><div class='b'><a href='y.html'>y</a></div></div>"
            "</body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["div.a div.b"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/y.html"]

    def test_unsupported_forms_raise(self):
        for expr in ("//div[1]", "//a[text()='x']", "//div[last()]",
                     "//div/..", "//div[@a='x' and @b='y']"):
            with pytest.raises(ValueError):
                LinkExtractorConfig(restrict_regions=[expr])

    def test_prefix_state_restores_after_close(self):
        # after leaving a partial-chain subtree, later anchors outside the
        # chain must not leak in-region state
        html = (
            "<html><body>"
            "<div id='m'><p><a href='in.html'>in</a></p></div>"
            "<p><a href='out.html'>out</a></p>"
            "</body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["//div[@id='m']//p"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/in.html"]


class TestChildCombinator:
    """Round-4 upgrade: CSS `>` / XPath `/` child steps (NFA subsequence
    matcher — a greedy prefix automaton cannot do adjacency) and generic
    attribute predicates [@attr] / [@attr='v']."""

    HTML = (
        "<html><body>"
        "<div id='m'><a href='child.html'>c</a>"
        "<p><a href='grand.html'>g</a></p></div>"
        "<a href='out.html'>o</a>"
        "</body></html>"
    )

    def test_css_child_combinator(self):
        cfg = LinkExtractorConfig(restrict_regions=["div#m > a"])
        got = [l.url for l in extract_links(self.HTML, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/child.html"]

    def test_xpath_child_step(self):
        cfg = LinkExtractorConfig(restrict_regions=["//div[@id='m']/a"])
        got = [l.url for l in extract_links(self.HTML, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/child.html"]

    def test_descendant_still_catches_grandchild(self):
        cfg = LinkExtractorConfig(restrict_regions=["//div[@id='m']//a"])
        got = [l.url for l in extract_links(self.HTML, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/child.html", "http://x.test/grand.html"]

    def test_nfa_beats_greedy_prefix(self):
        # chain "div.a > p": greedy matching would bind to the OUTER div.a
        # and reject p (whose parent is the inner div.a); the NFA keeps
        # both candidate states
        html = (
            "<html><body><div class='a'><div class='a'>"
            "<p><a href='in.html'>i</a></p>"
            "</div></div></body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["div.a > p"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/in.html"]

    def test_child_rejects_non_child(self):
        html = (
            "<html><body><div class='a'><section>"
            "<p><a href='deep.html'>d</a></p>"
            "</section></div></body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["div.a > p"])
        assert extract_links(html, "http://x.test/", config=cfg) == []

    def test_attr_existence_predicate(self):
        html = (
            "<html><body>"
            "<div data-x='1'><a href='a.html'>a</a></div>"
            "<div><a href='b.html'>b</a></div>"
            "</body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["//div[@data-x]"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/a.html"]

    def test_attr_value_predicate(self):
        html = (
            "<html><body>"
            "<ul role='nav'><li><a href='n.html'>n</a></li></ul>"
            "<ul role='list'><li><a href='l.html'>l</a></li></ul>"
            "</body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["//ul[@role='nav']//a"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/n.html"]

    def test_chained_child_steps(self):
        html = (
            "<html><body>"
            "<div id='m'><ul><li><a href='y.html'>y</a></li></ul></div>"
            "<div id='m'><ul><div><li><a href='n.html'>n</a></li></div></ul></div>"
            "</body></html>"
        )
        cfg = LinkExtractorConfig(restrict_regions=["//div[@id='m']/ul/li"])
        got = [l.url for l in extract_links(html, "http://x.test/", config=cfg)]
        assert got == ["http://x.test/y.html"]
