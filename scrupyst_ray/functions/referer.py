"""Referer policy (M8) — reference ``scrapy/spidermiddlewares/referer.py``.

Computes the Referer header value a child request would carry, for ALL nine
reference policies (``referer.py:108-306``): the eight W3C referrer policies
plus ``scrapy-default`` (no-referrer-when-downgrade that additionally never
leaks ``file://`` / ``s3://`` parents).  Pure column compute over
(parent_url, child_url) — used in link expansion.

Semantics mirrored exactly (verified against the reference's own scenario
matrix in ``tests/test_spidermiddleware_referer.py``, ported to
``tests/test_referer_matrix.py``):

- ``strip_url`` (reference ``utils/url.py:159-204``): credentials dropped
  (``netloc.split('@')[-1]`` — host case preserved), fragment dropped,
  default port dropped only for (http,80)/(https,443)/(ftp,21); origin
  serialization is ``scheme://host/`` (path replaced by "/").
- TLS-protected schemes are https and ftps; ``data:`` is never potentially
  trustworthy.
- Parents with a local scheme (about/blob/data/filesystem — plus file/s3
  under ``scrapy-default``) never send a referrer.
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse

LOCAL_SCHEMES = ("about", "blob", "data", "filesystem")

POLICIES = (
    "no-referrer",
    "no-referrer-when-downgrade",
    "same-origin",
    "origin",
    "strict-origin",
    "origin-when-cross-origin",
    "strict-origin-when-cross-origin",
    "unsafe-url",
    "scrapy-default",
)

_DEFAULT_PORTS = {("http", 80), ("https", 443), ("ftp", 21)}


def strip_url(url: str, origin_only: bool = False) -> str:
    """Reference ``w3lib``-backed ``strip_url(strip_credentials=True,
    strip_fragment=True, strip_default_port=True, origin_only=...)``."""
    p = urlparse(url)
    netloc = p.netloc
    if p.username or p.password:
        netloc = netloc.split("@")[-1]
    if p.port and (p.scheme, p.port) in _DEFAULT_PORTS:
        netloc = netloc.replace(f":{p.port}", "")
    return urlunparse(
        (
            p.scheme,
            netloc,
            "/" if origin_only else p.path,
            "" if origin_only else p.params,
            "" if origin_only else p.query,
            "",
        )
    )


def _tls_protected(url: str) -> bool:
    return urlparse(url).scheme in ("https", "ftps")


def _potentially_trustworthy(url: str) -> bool:
    if urlparse(url).scheme in ("data",):
        return False
    return _tls_protected(url)


def _noreferrer_schemes(policy: str) -> tuple[str, ...]:
    if policy == "scrapy-default":
        return (*LOCAL_SCHEMES, "file", "s3")
    return LOCAL_SCHEMES


def _stripped(url: str, policy: str, origin_only: bool = False) -> str | None:
    if urlparse(url).scheme in _noreferrer_schemes(policy):
        return None
    return strip_url(url, origin_only=origin_only)


def referer_for(
    parent_url: str, child_url: str, policy: str = "scrapy-default"
) -> str | None:
    """Referer value (None ⇒ no header), reference policy semantics.  The
    empty policy string means no-referrer-when-downgrade (W3C empty-string
    rule, reference ``referer.py:306``)."""
    if policy == "":
        policy = "no-referrer-when-downgrade"
    if policy not in POLICIES:
        raise ValueError(f"unknown referrer policy: {policy}")
    if policy == "no-referrer":
        return None
    if policy == "unsafe-url":
        return _stripped(parent_url, policy)
    if policy in ("no-referrer-when-downgrade", "scrapy-default"):
        if not _tls_protected(parent_url) or _tls_protected(child_url):
            return _stripped(parent_url, policy)
        return None
    same = strip_url(parent_url, origin_only=True) == strip_url(
        child_url, origin_only=True
    )
    if policy == "same-origin":
        return _stripped(parent_url, policy) if same else None
    if policy == "origin":
        return _stripped(parent_url, policy, origin_only=True)
    sends_origin = (
        _tls_protected(parent_url) and _potentially_trustworthy(child_url)
    ) or not _tls_protected(parent_url)
    if policy == "strict-origin":
        return _stripped(parent_url, policy, origin_only=True) if sends_origin else None
    if policy == "origin-when-cross-origin":
        if same:
            return _stripped(parent_url, policy)
        return _stripped(parent_url, policy, origin_only=True)
    # strict-origin-when-cross-origin
    if same:
        return _stripped(parent_url, policy)
    if sends_origin:
        return _stripped(parent_url, policy, origin_only=True)
    return None
