"""Cookie jar adapter conformance (M18) — scenarios mirrored from the
reference's ``tests/test_downloadermiddleware_cookies.py`` (basic merge,
path scoping, Secure, Domain matching, overwrite/delete), backed by the
same stdlib ``http.cookiejar`` the reference middleware wraps."""

from scrupyst_ray.functions.cookies import CookieJarState


class TestCookieJarState:
    def test_roundtrip_same_host(self):
        j = CookieJarState()
        assert j.header_for("http://example.test/") is None
        j.extract("http://example.test/", ["C1=value1; Path=/"])
        assert j.header_for("http://example.test/page") == "C1=value1"

    def test_host_isolation(self):
        j = CookieJarState()
        j.extract("http://a.test/", ["k=v; Path=/"])
        assert j.header_for("http://b.test/") is None

    def test_path_scoping_and_order(self):
        j = CookieJarState()
        j.extract("http://s.test/", ["root=1; Path=/"])
        j.extract("http://s.test/sub", ["deep=2; Path=/sub"])
        # longest path first (stdlib add_cookie_header ordering)
        assert j.header_for("http://s.test/sub/x") == "deep=2; root=1"
        assert j.header_for("http://s.test/") == "root=1"

    def test_secure_not_sent_over_http(self):
        j = CookieJarState()
        j.extract("https://bank.test/", ["tok=s; Path=/; Secure"])
        assert j.header_for("http://bank.test/") is None
        assert j.header_for("https://bank.test/") == "tok=s"

    def test_domain_cookie_matches_subdomains_and_apex(self):
        j = CookieJarState()
        j.extract("http://www.site.test/", ["lang=en; Domain=.site.test; Path=/"])
        assert j.header_for("http://api.site.test/") == "lang=en"
        assert j.header_for("http://site.test/") == "lang=en"
        assert j.header_for("http://othersite.test/") is None

    def test_overwrite_and_maxage_zero_deletes(self):
        j = CookieJarState()
        j.extract("http://a.test/", ["x=1; Path=/"])
        j.extract("http://a.test/", ["x=2; Path=/"])
        assert j.header_for("http://a.test/") == "x=2"
        j.extract("http://a.test/", ["x=gone; Max-Age=0; Path=/"])
        assert j.header_for("http://a.test/") is None

    def test_multiple_set_cookie_headers_one_response(self):
        j = CookieJarState()
        j.extract("http://m.test/", ["a=1; Path=/", "b=2; Path=/"])
        hdr = j.header_for("http://m.test/")
        assert hdr is not None and set(hdr.split("; ")) == {"a=1", "b=2"}


class TestCookieSessionQuery:
    def test_matches_scenario_literals(self, ray_session):
        from scrupyst_ray.pipelines import webops

        rows = webops.cookie_session("ignored").take_all()
        by_key = {(r["jar"], r["seq"]): r["cookie_header"] for r in rows}
        assert by_key[(0, 1)] == "sid=abc"
        assert by_key[(0, 4)] == "theme=dark; sid=abc"
        assert by_key[(0, 7)] is None  # Secure cookie not sent over http
        assert by_key[(0, 10)] == "lang=en"  # Domain matches subdomain
        assert by_key[(1, 3)] is None  # Max-Age=0 deleted
        assert len(rows) == len(webops.COOKIE_EVENTS)


class TestPublicSuffixGuard:
    """Round-3: the reference's tldextract Domain guard on the bundled PSL
    snapshot (functions/public_suffix.py)."""

    def test_public_suffix_domain_rejected(self):
        from scrupyst_ray.functions.cookies import CookieJarState

        jar = CookieJarState()
        jar.extract(
            "http://sub.example.com/",
            ["a=1; Domain=com", "b=2; Domain=co.uk", "c=3; Domain=example.com"],
        )
        hdr = jar.header_for("http://sub.example.com/") or ""
        assert "a=1" not in hdr and "b=2" not in hdr
        assert "c=3" in hdr

    def test_host_equal_suffix_kept(self):
        from scrupyst_ray.functions.cookies import CookieJarState

        # visiting github.io itself: Domain equals the request host, so the
        # guard strips the attribute and the jar keeps a HOST-ONLY cookie.
        # DELIBERATE DIVERGENCE from the reference (see cookies.py module
        # docstring): scrapy's plain default policy would still Netscape-
        # suffix-match this onto alice.github.io; our DomainStrictNonDomain
        # policy pins RFC 6265 exact-host return scope instead.
        jar = CookieJarState()
        jar.extract("http://github.io/", ["s=1; Domain=github.io; Path=/"])
        assert "s=1" in (jar.header_for("http://github.io/") or "")
        # host-only: must NOT be sent to subdomains of the suffix
        assert jar.header_for("http://alice.github.io/") is None

    def test_host_only_cookie_exact_host_scope(self):
        from scrupyst_ray.functions.cookies import CookieJarState

        # Pin the documented divergence for ORDINARY host-only cookies too:
        # a cookie set on example.com with no Domain attribute stays on
        # example.com (RFC 6265).  The reference's default stdlib policy
        # would also send it to www.example.com — we deliberately don't.
        jar = CookieJarState()
        jar.extract("http://example.com/", ["h=1; Path=/"])
        assert "h=1" in (jar.header_for("http://example.com/") or "")
        assert jar.header_for("http://www.example.com/") is None
        # an EXPLICIT Domain attribute still gets reference-identical
        # subdomain scope (domain cookie, leading-dot semantics)
        jar.extract("http://example.com/", ["d=2; Domain=example.com"])
        assert "d=2" in (jar.header_for("http://www.example.com/") or "")

    def test_private_section_suffix_rejected_for_subdomains(self):
        from scrupyst_ray.functions.cookies import CookieJarState

        jar = CookieJarState()
        jar.extract("http://alice.github.io/", ["t=1; Domain=github.io"])
        assert jar.header_for("http://bob.github.io/") is None
        assert jar.header_for("http://alice.github.io/") is None  # rejected

    def test_is_public_suffix_rules(self):
        from scrupyst_ray.functions.public_suffix import is_public_suffix

        assert is_public_suffix("com")
        assert is_public_suffix(".ORG")
        assert is_public_suffix("co.uk")
        assert is_public_suffix("github.io")
        assert not is_public_suffix("example.com")
        assert not is_public_suffix("weird.registry.example")
        assert not is_public_suffix("")
