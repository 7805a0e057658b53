"""Referer policy (M8) — reference ``scrapy/spidermiddlewares/referer.py``.

Computes the Referer header value a child request would carry, per the W3C
referrer policies the reference implements (``referer.py:108-306``).  Pure
column compute over (parent_url, child_url) — used in link expansion.

Default is the reference's ``scrapy-default`` = no-referrer-when-downgrade
(``referer.py:279-288``): full parent URL (stripped of credentials/fragment)
unless going from https → http.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

POLICIES = (
    "no-referrer",
    "no-referrer-when-downgrade",  # scrapy-default
    "same-origin",
    "origin",
    "strict-origin",
    "origin-when-cross-origin",
    "strict-origin-when-cross-origin",
    "unsafe-url",
)


def _strip(url: str, origin_only: bool = False) -> str:
    """w3lib ``strip_url(strip_credentials=True, strip_fragment=True,
    origin_only=...)`` semantics (reference ``utils/url.py:159-204``)."""
    p = urlsplit(url)
    netloc = p.hostname or ""
    if p.port is not None:
        default = {"http": 80, "https": 443}.get(p.scheme)
        if p.port != default:
            netloc += f":{p.port}"
    if origin_only:
        return urlunsplit((p.scheme, netloc, "/", "", ""))
    return urlunsplit((p.scheme, netloc, p.path, p.query, ""))


def _origin(url: str) -> tuple[str, str]:
    p = urlsplit(url)
    return (p.scheme, p.netloc.rsplit("@", 1)[-1].lower())


def _downgrade(parent: str, child: str) -> bool:
    return urlsplit(parent).scheme == "https" and urlsplit(child).scheme == "http"


def referer_for(
    parent_url: str, child_url: str, policy: str = "no-referrer-when-downgrade"
) -> str | None:
    """Referer value (None ⇒ no header), reference policy semantics."""
    if policy == "no-referrer":
        return None
    if policy == "unsafe-url":
        return _strip(parent_url)
    same = _origin(parent_url) == _origin(child_url)
    down = _downgrade(parent_url, child_url)
    if policy == "no-referrer-when-downgrade":
        return None if down else _strip(parent_url)
    if policy == "same-origin":
        return _strip(parent_url) if same else None
    if policy == "origin":
        return _strip(parent_url, origin_only=True)
    if policy == "strict-origin":
        return None if down else _strip(parent_url, origin_only=True)
    if policy == "origin-when-cross-origin":
        return _strip(parent_url) if same else _strip(parent_url, origin_only=True)
    if policy == "strict-origin-when-cross-origin":
        if same:
            return _strip(parent_url)
        return None if down else _strip(parent_url, origin_only=True)
    raise ValueError(f"unknown referrer policy: {policy}")
