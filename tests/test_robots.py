"""Robots matrix from FIXTURES.md §1 + RFC 9309 precedence cases
(reference semantics: ``scrapy/robotstxt.py:45-123``,
``downloadermiddlewares/robotstxt.py:32-137``)."""

from scrupyst_ray.functions.robots import RobotsRules, parse_robots

UA = "scrupyst-ray/0.1 (+local)"


def test_missing_robots_allows_all():
    r = parse_robots(None)
    assert r.allowed("http://h.test/anything", UA)


def test_empty_robots_allows_all():
    r = parse_robots(b"")
    assert r.allowed("http://h.test/x", UA)


def test_disallow_prefix():
    r = parse_robots(b"User-agent: *\nDisallow: /follow?n=1\n")
    assert not r.allowed("http://h.test/follow?n=1", UA)
    assert not r.allowed("http://h.test/follow?n=10", UA)  # prefix match
    assert r.allowed("http://h.test/follow?n=2", UA)


def test_ua_specific_group():
    body = b"User-agent: scrupyst-ray\nDisallow: /\n\nUser-agent: *\nDisallow:\n"
    r = parse_robots(body)
    assert not r.allowed("http://h.test/x", UA)  # our UA contains the token
    assert r.allowed("http://h.test/x", "otherbot/1.0")  # * group, empty disallow


def test_longest_ua_token_wins():
    body = (
        b"User-agent: scrupyst\nDisallow: /a\n\n"
        b"User-agent: scrupyst-ray\nDisallow: /b\n"
    )
    r = parse_robots(body)
    # UA matches both tokens; the longer one ("scrupyst-ray") owns the group
    assert r.allowed("http://h.test/a", UA)
    assert not r.allowed("http://h.test/b", UA)


def test_longest_rule_wins_and_allow_tiebreak():
    body = b"User-agent: *\nDisallow: /dir\nAllow: /dir/open\n"
    r = parse_robots(body)
    assert not r.allowed("http://h.test/dir/x", UA)
    assert r.allowed("http://h.test/dir/open/y", UA)
    # equal-length tie → allow wins
    r2 = parse_robots(b"User-agent: *\nDisallow: /ab\nAllow: /ab\n")
    assert r2.allowed("http://h.test/ab", UA)


def test_wildcards_and_anchor():
    r = parse_robots(b"User-agent: *\nDisallow: /*.php$\nDisallow: /priv*/x\n")
    assert not r.allowed("http://h.test/a.php", UA)
    assert r.allowed("http://h.test/a.php?x=1", UA)  # $ anchors before query? path+query used
    assert not r.allowed("http://h.test/private/x", UA)
    assert r.allowed("http://h.test/private/y", UA)


def test_bom_and_garbage_lines_ignored():
    body = b"\xef\xbb\xbf\xff\xfenoise noise\nUser-agent: *\nDisallow: /blocked\njunk-line\n"
    r = parse_robots(body)
    assert not r.allowed("http://h.test/blocked/1", UA)
    assert r.allowed("http://h.test/ok", UA)


def test_crawl_delay():
    r = parse_robots(b"User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert r.crawl_delay(UA) == 2.5


def test_sitemaps_collected():
    r = parse_robots(b"Sitemap: http://h.test/sitemap.xml\nUser-agent: *\nDisallow:\n")
    assert r.sitemaps == ["http://h.test/sitemap.xml"]


def test_multiple_ua_lines_one_group():
    body = b"User-agent: a\nUser-agent: b\nDisallow: /x\n"
    r = parse_robots(body)
    assert not r.allowed("http://h.test/x", "a-bot")
    assert not r.allowed("http://h.test/x", "b-bot")
    # UA-token matching is substring-based (Protego semantics), so pick a UA
    # containing neither token
    assert r.allowed("http://h.test/x", "zzz/1.0")


class TestReferenceInterfaceCases:
    """Ported from reference tests/test_robotstxt_interface.py (the Protego
    parser cases scrapy runs by default)."""

    def test_allowed_basic(self):
        rp = parse_robots(
            b"User-agent: * \nDisallow: /disallowed \nAllow: /allowed \nCrawl-delay: 10"
        )
        assert rp.allowed("https://www.site.local/allowed", "*")
        assert not rp.allowed("https://www.site.local/disallowed", "*")

    def test_allowed_wildcards_two_groups(self):
        rp = parse_robots(
            b"""User-agent: first
                Disallow: /disallowed/*/end$

                User-agent: second
                Allow: /*allowed
                Disallow: /
            """
        )
        assert rp.allowed("https://www.site.local/disallowed", "first")
        assert not rp.allowed("https://www.site.local/disallowed/xyz/end", "first")
        assert not rp.allowed("https://www.site.local/disallowed/abc/end", "first")
        assert rp.allowed(
            "https://www.site.local/disallowed/xyz/endinglater", "first"
        )
        assert rp.allowed("https://www.site.local/allowed", "second")
        assert rp.allowed("https://www.site.local/is_still_allowed", "second")
        assert rp.allowed("https://www.site.local/is_allowed_too", "second")

    def test_length_based_precedence(self):
        rp = parse_robots(b"User-agent: * \nDisallow: / \nAllow: /page")
        assert rp.allowed("https://www.site.local/page", "*")

    def test_garbage_body_allows_all(self):
        rp = parse_robots(b"GIF89a\xd3\x00\xfe\x00\xa2")
        assert rp.allowed("https://site.local/", "*")
        assert rp.allowed("https://site.local/disallowed", "chrome")

    def test_unicode_url_and_useragent(self):
        rp = parse_robots(
            """
            User-Agent: *
            Disallow: /admin/
            Disallow: /static/
            Disallow: /wiki/K%C3%A4ytt%C3%A4j%C3%A4:
            Disallow: /wiki/Käyttäjä:

            User-Agent: UnicödeBöt
            Disallow: /some/randome/page.html""".encode()
        )
        assert rp.allowed("https://site.local/", "*")
        assert not rp.allowed("https://site.local/admin/", "*")
        assert not rp.allowed("https://site.local/static/", "*")
        assert rp.allowed("https://site.local/admin/", "UnicödeBöt")
        # raw-unicode pattern ↔ percent-encoded path and vice versa
        assert not rp.allowed(
            "https://site.local/wiki/K%C3%A4ytt%C3%A4j%C3%A4:", "*"
        )
        assert not rp.allowed("https://site.local/wiki/Käyttäjä:", "*")
        assert rp.allowed("https://site.local/some/randome/page.html", "*")
        assert not rp.allowed(
            "https://site.local/some/randome/page.html", "UnicödeBöt"
        )
