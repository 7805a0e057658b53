"""LinkExtractor conformance scenarios ported from the reference's own
``tests/test_linkextractors.py`` (fixture HTML + expected Link lists are the
reference's test DATA, reproduced as conformance fixtures like the
fingerprint goldens — SURVEY §5)."""

from scrupyst_ray.functions.links import LinkExtractorConfig, extract_links

# tests/sample_data/link_extractor/linkextractor.html (verbatim)
SAMPLE = """<!DOCTYPE html>

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
</html>
"""
BASE = "http://example.com/index.html"


def _links(html=SAMPLE, base=BASE, **cfg):
    return [
        (l.url, l.text)
        for l in extract_links(html, base, "utf-8", LinkExtractorConfig(**cfg))
    ]


class TestReferenceSamplePage:
    def test_extract_all_links(self):
        # reference test_extract_all_links (tests/test_linkextractors.py:32-47)
        assert _links() == [
            ("http://example.com/sample1.html", ""),
            ("http://example.com/sample2.html", "sample 2"),
            ("http://example.com/sample3.html", "sample 3 text"),
            (
                "http://example.com/sample3.html#foo",
                "sample 3 repetition with fragment",
            ),
            ("http://www.google.com/something", ""),
            ("http://example.com/innertag.html", "inner tag"),
            ("http://example.com/page%204.html", "href with whitespaces"),
        ]

    def test_extract_filter_allow(self):
        assert _links(allow=["sample"]) == [
            ("http://example.com/sample1.html", ""),
            ("http://example.com/sample2.html", "sample 2"),
            ("http://example.com/sample3.html", "sample 3 text"),
            (
                "http://example.com/sample3.html#foo",
                "sample 3 repetition with fragment",
            ),
        ]

    def test_extract_filter_allow_with_duplicates(self):
        assert _links(allow=["sample"], unique=False) == [
            ("http://example.com/sample1.html", ""),
            ("http://example.com/sample2.html", "sample 2"),
            ("http://example.com/sample3.html", "sample 3 text"),
            ("http://example.com/sample3.html", "sample 3 repetition"),
            ("http://example.com/sample3.html", "sample 3 repetition"),
            (
                "http://example.com/sample3.html#foo",
                "sample 3 repetition with fragment",
            ),
        ]

    def test_extract_filter_allow_and_deny(self):
        assert _links(allow=["sample"], deny=["3"]) == [
            ("http://example.com/sample1.html", ""),
            ("http://example.com/sample2.html", "sample 2"),
        ]

    def test_extract_filter_allowed_domains(self):
        assert _links(allow_domains=["google.com"]) == [
            ("http://www.google.com/something", ""),
        ]


class TestReferenceNofollow:
    # reference test_nofollow (tests/test_linkextractors.py:152-193)
    HTML = """<html><head><title>Page title</title></head>
    <body>
    <div class='links'>
    <p><a href="/about.html">About us</a></p>
    </div>
    <div>
    <p><a href="/follow.html">Follow this link</a></p>
    </div>
    <div>
    <p><a href="/nofollow.html" rel="nofollow">Dont follow this one</a></p>
    </div>
    <div>
    <p><a href="/nofollow2.html" rel="blah">Choose to follow or not</a></p>
    </div>
    <div>
    <p><a href="http://google.com/something" rel="external nofollow">External link not to follow</a></p>
    </div>
    </body></html>"""

    def test_nofollow_flags(self):
        links = extract_links(
            self.HTML,
            "http://example.org/somepage/index.html",
            "utf-8",
            LinkExtractorConfig(),
        )
        assert [(l.url, l.text, l.nofollow) for l in links] == [
            ("http://example.org/about.html", "About us", False),
            ("http://example.org/follow.html", "Follow this link", False),
            ("http://example.org/nofollow.html", "Dont follow this one", True),
            (
                "http://example.org/nofollow2.html",
                "Choose to follow or not",
                False,
            ),
            (
                "http://google.com/something",
                "External link not to follow",
                True,
            ),
        ]


class TestReferenceTagsAttrsProcessValue:
    TAGS_HTML = (
        '<html><area href="sample1.html"></area>'
        '<a href="sample2.html">sample 2</a><img src="sample2.jpg"/></html>'
    )

    def _links(self, html, **cfg):
        return [
            (l.url, l.text)
            for l in extract_links(
                html, "http://example.com/index.html", "utf-8",
                LinkExtractorConfig(**cfg),
            )
        ]

    def test_tags(self):
        # reference test_tags (tests/test_linkextractors.py:427-459)
        assert self._links(self.TAGS_HTML, tags=()) == []
        assert self._links(self.TAGS_HTML) == [
            ("http://example.com/sample1.html", ""),
            ("http://example.com/sample2.html", "sample 2"),
        ]
        assert self._links(self.TAGS_HTML, tags=("area",)) == [
            ("http://example.com/sample1.html", ""),
        ]
        assert self._links(self.TAGS_HTML, tags=("a",)) == [
            ("http://example.com/sample2.html", "sample 2"),
        ]
        assert self._links(
            self.TAGS_HTML,
            tags=("a", "img"),
            attrs=("href", "src"),
            deny_extensions=frozenset(),
        ) == [
            ("http://example.com/sample2.html", "sample 2"),
            ("http://example.com/sample2.jpg", ""),
        ]

    def test_tags_attrs(self):
        # reference test_tags_attrs: custom data attribute on divs
        html = """
        <html><body>
        <div id="item1" data-url="get?id=1"><a href="#">Item 1</a></div>
        <div id="item2" data-url="get?id=2"><a href="#">Item 2</a></div>
        </body></html>
        """
        assert self._links(html, tags=("div",), attrs=("data-url",)) == [
            ("http://example.com/get?id=1", ""),
            ("http://example.com/get?id=2", ""),
        ]

    def test_process_value(self):
        # reference test_process_value: pull the target out of javascript:
        import re as _re

        html = """
<a href="javascript:goToPage('../other/page.html','photo','width=600'); return false">Text</a>
<a href="/about.html">About us</a>
        """

        def process_value(value):
            m = _re.search(r"javascript:goToPage\('(.*?)'", value)
            return m.group(1) if m else None

        links = extract_links(
            html,
            "http://example.org/somepage/index.html",
            "utf-8",
            LinkExtractorConfig(process_value=process_value),
        )
        assert [(l.url, l.text) for l in links] == [
            ("http://example.org/other/page.html", "Text")
        ]

    def test_canonicalize_option(self):
        html = '<a href="/a?b=2&a=1#frag">x</a>'
        links = extract_links(
            html, "http://example.com/", "utf-8",
            LinkExtractorConfig(canonicalize=True),
        )
        assert [l.url for l in links] == ["http://example.com/a?a=1&b=2"]


class TestReferenceMisc:
    def test_encoded_url_base(self):
        # reference test_encoded_url: %2F in the base must survive the join
        body = '<html><body><div><a href="?page=2">BinB</a></body></html>'
        links = extract_links(
            body, "http://known.fm/AC%2FDC/", "utf-8", LinkExtractorConfig()
        )
        assert [(l.url, l.text) for l in links] == [
            ("http://known.fm/AC%2FDC/?page=2", "BinB")
        ]

    def test_ignored_extensions_and_override(self):
        # reference test_ignored_extensions
        html = '<a href="page.html">asd</a> and <a href="photo.jpg">'
        links = extract_links(
            html, "http://example.org/", "utf-8", LinkExtractorConfig()
        )
        assert [l.url for l in links] == ["http://example.org/page.html"]
        links = extract_links(
            html,
            "http://example.org/",
            "utf-8",
            LinkExtractorConfig(deny_extensions=frozenset(["html"])),
        )
        assert [l.url for l in links] == ["http://example.org/photo.jpg"]
