"""Cookie jar semantics (M18) — reference
``scrapy/downloadermiddlewares/cookies.py:40-140`` + ``scrapy/http/cookies.py``.

The reference middleware is a thin adapter over the stdlib
``http.cookiejar.CookieJar``: responses feed ``extract_cookies`` through a
WrappedResponse, requests get their ``Cookie`` header from
``add_cookie_header`` through a WrappedRequest.  This module reproduces that
adapter for the columnar engine: a :class:`CookieJarState` holds one jar
(the reference's per-``cookiejar``-meta-key jar) and exposes two pure-ish
operations:

- ``extract(url, set_cookie_headers)`` — ingest a response's Set-Cookie
  headers (reference ``process_response``),
- ``header_for(url)`` — the Cookie header the next request to *url* would
  carry (reference ``process_request``), None when the jar has nothing to
  send (domain/path/secure mismatch or empty).

In the superstep crawl this state is per-host-shard (the same actor that
owns politeness state owns the host's jars); the query surface replays a
deterministic event log per jar (``pipelines/webops.py::cookie_session``).

Public-suffix guard: the reference rejects public-suffix ``Domain``
attributes via tldextract (``cookies.py:35-37,64-72``).  tldextract is not
in this container; round 3 carries the same mechanism on a bundled PSL
snapshot (``functions/public_suffix.py``): a Set-Cookie whose Domain is a
public suffix is DROPPED unless it names the request host itself, in which
case the Domain attribute is stripped (host-only cookie, RFC 6265 §5.3
step 5).  Exotic registry suffixes outside the snapshot fail open.

Session-cookie expiry, domain matching, path scoping, the Secure flag and
Cookie-header ordering (longest path first) all come from the stdlib policy,
exactly as in the reference — with ONE deliberate divergence:

Host-only return scope (DELIBERATE DIVERGENCE from the reference): this jar
runs ``DefaultCookiePolicy(strict_ns_domain=DomainStrictNonDomain)``, so a
cookie set WITHOUT a Domain attribute (host-only, including those
host-normalized by the public-suffix guard) is returned only to the exact
host that set it — RFC 6265 §5.1.3/§5.4 host-only semantics.  The reference
uses the plain default policy, whose Netscape suffix heuristic DOES send a
host-only cookie set on ``example.com`` to ``www.example.com`` (and would
likewise send a guard-normalized ``github.io`` cookie to
``alice.github.io``).  We keep the RFC-6265 hardening on purpose: the
subdomain blanket is the pre-RFC-6265 Netscape behavior no modern browser
implements, and it is exactly the channel through which a public-suffix
cookie would leak across registry tenants.  The divergence is pinned by
``tests/test_cookies.py`` (subdomain non-match) and the ``cookie_session``
oracle encodes the RFC-6265 behavior — no oracle or test depends on
subdomain delivery of host-only cookies.
"""

from __future__ import annotations

import email.message
from http.cookiejar import CookieJar, DefaultCookiePolicy
from urllib.parse import urlparse


class _WrappedRequest:
    """The subset of ``urllib.request.Request`` that ``http.cookiejar``
    touches (reference WrappedRequest, ``http/cookies.py:138-200``)."""

    def __init__(self, url: str):
        self._url = url
        self._host = urlparse(url).netloc
        self.origin_req_host = urlparse(url).hostname or ""
        self.unverifiable = False
        self.headers: dict[str, str] = {}

    # http.cookiejar probes both the method and attribute spellings
    def get_full_url(self) -> str:
        return self._url

    @property
    def full_url(self) -> str:
        return self._url

    @property
    def host(self) -> str:
        return self._host

    @property
    def type(self) -> str:
        return urlparse(self._url).scheme

    def get_host(self) -> str:
        return self._host

    def get_type(self) -> str:
        return urlparse(self._url).scheme

    def is_unverifiable(self) -> bool:
        return False

    def has_header(self, name: str) -> bool:
        return name in self.headers

    def get_header(self, name: str, default: str | None = None) -> str | None:
        return self.headers.get(name, default)

    def header_items(self):
        return list(self.headers.items())

    def add_unredirected_header(self, name: str, value: str) -> None:
        self.headers[name] = value


class _WrappedResponse:
    """The subset of ``urllib.response`` the jar reads: ``info()`` returning
    a Message with the Set-Cookie headers (reference WrappedResponse,
    ``http/cookies.py:203-221``)."""

    def __init__(self, url: str, set_cookie_headers: list[str]):
        self._url = url
        self._msg = email.message.Message()
        for h in set_cookie_headers:
            self._msg.add_header("Set-Cookie", h)

    def info(self) -> email.message.Message:
        return self._msg

    @property
    def url(self) -> str:
        return self._url


import re

_DOMAIN_ATTR_RE = re.compile(
    r";\s*domain\s*=\s*\"?([^;\"\s]*)\"?", re.IGNORECASE
)


def _guard_public_suffix_domains(
    url: str, set_cookie_headers: list[str]
) -> list[str]:
    """Reference public-suffix guard (``cookies.py:60-72``
    ``_process_cookies``): a Set-Cookie whose dot-stripped Domain attribute
    is a public suffix is DROPPED unless it equals the request host, in
    which case the Domain attribute is STRIPPED so the stdlib jar stores a
    host-only cookie.  The reference instead rewrites
    ``cookie.domain = request_domain`` post-parse, which keeps
    ``domain_specified`` set and still Netscape-suffix-matches onto
    subdomains (a ``github.io`` cookie reaches ``alice.github.io`` in the
    reference).  Stripping + the jar's ``DomainStrictNonDomain`` policy
    (see module docstring) closes that leak here — a deliberate RFC 6265
    hardening, not reference parity."""
    from scrupyst_ray.functions.public_suffix import is_public_suffix

    host = (urlparse(url).hostname or "").lower()
    out: list[str] = []
    for h in set_cookie_headers:
        m = _DOMAIN_ATTR_RE.search(h)
        if m is None or not is_public_suffix(m.group(1)):
            out.append(h)
            continue
        if m.group(1).lstrip(".").lower() == host:
            out.append(h[: m.start()] + h[m.end():])
        # else: rejected (cookie would blanket a whole registry suffix)
    return out


class CookieJarState:
    """One cookie jar (reference per-``cookiejar``-key jar)."""

    def __init__(self) -> None:
        # DomainStrictNonDomain = a cookie with NO explicit Domain attribute
        # (host-only, incl. those host-normalized by the public-suffix
        # guard) is returned only to the exact host that set it — RFC 6265
        # host-only semantics.  DELIBERATE DIVERGENCE: the reference's
        # plain default policy suffix-matches host-only cookies onto
        # subdomains (pre-RFC Netscape behavior); see module docstring.
        self.jar = CookieJar(
            policy=DefaultCookiePolicy(
                strict_ns_domain=DefaultCookiePolicy.DomainStrictNonDomain
            )
        )

    def extract(self, url: str, set_cookie_headers: list[str]) -> None:
        """Ingest a response's Set-Cookie headers into the jar (after the
        public-suffix Domain guard — see module docstring)."""
        if not set_cookie_headers:
            return
        set_cookie_headers = _guard_public_suffix_domains(
            url, set_cookie_headers
        )
        if not set_cookie_headers:
            return
        req = _WrappedRequest(url)
        self.jar.extract_cookies(_WrappedResponse(url, set_cookie_headers), req)  # type: ignore[arg-type]

    def header_for(self, url: str) -> str | None:
        """The Cookie header a request to *url* would carry, else None."""
        req = _WrappedRequest(url)
        self.jar.add_cookie_header(req)  # type: ignore[arg-type]
        return req.headers.get("Cookie")
