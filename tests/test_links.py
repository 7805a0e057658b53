"""Link-extractor tests mirroring the reference's cases
(``tests/test_linkextractors.py`` shapes + FIXTURES.md §6 noise links)."""

from scrupyst_ray.functions.links import (
    IGNORED_EXTENSIONS,
    LinkExtractorConfig,
    extract_links,
    extract_links_batch,
    get_base_url,
)

PAGE_URL = "http://host000.test/follow?n=5"


def _urls(links):
    return [l.url for l in links]


def test_basic_relative_and_absolute():
    html = (
        "<html><body>"
        '<a href="/follow?n=4">four</a>'
        '<a href="http://host001.test/follow?n=2">x</a>'
        "</body></html>"
    )
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == [
        "http://host000.test/follow?n=4",
        "http://host001.test/follow?n=2",
    ]
    assert links[0].text == "four"


def test_noise_links_filtered():
    html = (
        "<html><body>"
        '<a href="/follow?n=4">ok</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="/file5.jpg">img</a>'
        '<a href="/archive.tar.gz">arch</a>'
        "</body></html>"
    )
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == ["http://host000.test/follow?n=4"]


def test_nofollow_flag_kept_not_dropped():
    # reference keeps rel=nofollow links in the edge list, flagged
    # (lxmlhtml.py:133-137); following them is the crawler's policy decision
    html = '<a href="/a" rel="nofollow">n</a><a href="/b">y</a>'
    links = extract_links(html, PAGE_URL)
    assert [(l.url, l.nofollow) for l in links] == [
        ("http://host000.test/a", True),
        ("http://host000.test/b", False),
    ]


def test_fragment_link_resolves_to_self_with_fragment():
    html = '<a href="#frag">f</a>'
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == ["http://host000.test/follow?n=5#frag"]


def test_base_tag_resolution():
    html = (
        '<html><head><base href="http://other.test/dir/"></head>'
        '<body><a href="page.html">p</a></body></html>'
    )
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == ["http://other.test/dir/page.html"]
    assert get_base_url(html, PAGE_URL) == "http://other.test/dir/"


def test_whitespace_stripped_href():
    html = '<a href="  /follow?n=1\n">x</a>'
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == ["http://host000.test/follow?n=1"]


def test_per_page_dedup_canonical_keep_fragments():
    # dedup key = canonicalize_url(url, keep_fragments=True):
    # query-order variants collapse, fragment variants do NOT
    html = (
        '<a href="/p?a=1&b=2">1</a>'
        '<a href="/p?b=2&a=1">2</a>'
        '<a href="/p?a=1&b=2#x">3</a>'
    )
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == [
        "http://host000.test/p?a=1&b=2",
        "http://host000.test/p?a=1&b=2#x",
    ]


def test_area_and_selfclosing():
    html = '<map><area href="/m1"/></map><a href="/m2"></a>'
    links = extract_links(html, PAGE_URL)
    assert _urls(links) == ["http://host000.test/m1", "http://host000.test/m2"]


def test_anchor_text_subtree():
    html = '<a href="/x"><b>bold</b> and plain</a>'
    links = extract_links(html, PAGE_URL)
    assert links[0].text == "bold and plain"


def test_allow_deny_domains():
    html = '<a href="http://a.test/1">a</a><a href="http://sub.b.test/2">b</a>'
    cfg = LinkExtractorConfig(allow_domains=["b.test"])
    assert _urls(extract_links(html, PAGE_URL, config=cfg)) == ["http://sub.b.test/2"]
    cfg = LinkExtractorConfig(deny_domains=["b.test"])
    assert _urls(extract_links(html, PAGE_URL, config=cfg)) == ["http://a.test/1"]


def test_allow_deny_regex():
    html = '<a href="/keep/1">k</a><a href="/drop/2">d</a>'
    cfg = LinkExtractorConfig(allow=[r"/keep/"])
    assert _urls(extract_links(html, PAGE_URL, config=cfg)) == [
        "http://host000.test/keep/1"
    ]
    cfg = LinkExtractorConfig(deny=[r"/drop/"])
    assert _urls(extract_links(html, PAGE_URL, config=cfg)) == [
        "http://host000.test/keep/1"
    ]


def test_ignored_extensions_constant():
    assert "jpg" in IGNORED_EXTENSIONS
    assert "tar.gz" in IGNORED_EXTENSIONS
    assert "html" not in IGNORED_EXTENSIONS


def test_batch_explode():
    htmls = ['<a href="/a">A</a><a href="/b">B</a>', '<a href="/c">C</a>']
    urls = ["http://h0.test/p1", "http://h1.test/p2"]
    t = extract_links_batch(htmls, urls, ["utf-8", "utf-8"])
    assert t["src"].to_pylist() == [
        "http://h0.test/p1",
        "http://h0.test/p1",
        "http://h1.test/p2",
    ]
    assert t["dst"].to_pylist() == [
        "http://h0.test/a",
        "http://h0.test/b",
        "http://h1.test/c",
    ]
    assert t["link_idx"].to_pylist() == [0, 1, 0]


class TestMakeJoiner:
    """make_joiner must equal urllib.parse.urljoin on EVERY input — the fast
    paths may only trigger where the join is provably the identity/prefix."""

    BASES = [
        "http://h.test/a/b.html",
        "https://x.example.com/",
        "http://h.test/p/q/r/",
        "http://h.test",
        "http://h.test/a%20b/c.html?q=1",
        "ftp://h/x/y",
        "http://h.test/./d/e.html",
        # bases WITH query/fragment take the fast path too (the crawl's own
        # page urls are /follow?n=K — the hot case)
        "http://h.test/follow?n=5",
        "http://h.test/a/b?q=1#f",
        "https://h.test/?x",
        "http://h.test/p#frag",
        "http://h.test/a/./b?n=1",
        "http://h.test/p?q=/./x",
    ]
    ATOMS = [
        "page7.html", "a", "a/b", "a/b/", "", ".", "..", "../x", "./x",
        "x/./y", "x/../y", "/root.html", "//proto.test/p", "http://abs.test/q",
        "https://abs.test", "HTTP://abs.test/u", "?q=2", "#frag", "a?b=c",
        "a#f", "a?b=c#f", "a;p=1", "mailto:x@y", "javascript:void(0)", "x:y",
        "a b", "a%2Fb", "http://abs.test/?", "http://abs.test/#", "%41",
        "a.html?", "a.html#", "..//x", "a//b", "/..", "/a/../b", "/a//b",
        "/x?", "/x#", "/x;", "a;", "http://abs.test/a;", "a.", "a./b", "x/",
    ]

    def test_atoms_match_urljoin(self):
        from urllib.parse import urljoin

        from scrupyst_ray.functions.urlnorm import make_joiner

        for base in self.BASES:
            j = make_joiner(base)
            for href in self.ATOMS:
                assert j(href) == urljoin(base, href), (base, href)

    def test_fuzz_matches_urljoin(self):
        import random
        import string as st
        from urllib.parse import urljoin

        from scrupyst_ray.functions.urlnorm import make_joiner

        rng = random.Random(1234)
        # \t\n\r included: urlsplit strips ASCII tab/newline (WHATWG), which
        # once diverged from the fast paths (ADVICE r1)
        chars = st.ascii_letters + st.digits + "/?#.%:@&=+,;~!$'()*-_ \t\n\r"
        joiners = {b: make_joiner(b) for b in self.BASES}
        for _ in range(20000):
            base = rng.choice(self.BASES)
            href = "".join(
                rng.choice(chars) for _ in range(rng.randint(0, 30))
            )
            try:
                exp = urljoin(base, href)
            except ValueError:
                continue
            assert joiners[base](href) == exp, (base, href)
