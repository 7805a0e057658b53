"""SURT (Sort-friendly URI Reordering Transform) — the canonical key form
web archives index by (Internet Archive / Common Crawl CDX indexes use it
so one host's captures sort contiguously: ``com,example)/path``).

Reimplemented from the PUBLIC spec/README of the ``internetarchive/surt``
project (no code consulted).  The subset implemented — and pinned in
``tests/test_surt.py`` — is the default canonicalizer behaviors that are
pure functions of the URL:

- lowercase the whole key; drop scheme and userinfo; drop fragment
- reverse dotted host labels joined by commas (IPv4/IPv6 hosts and
  single-label hosts are left unreversed)
- strip ONE leading ``www`` label (with optional digits: www2.)
- elide default ports (80/http, 443/https); keep explicit non-defaults
- ``)`` then the path (empty path → ``/``)
- query args sorted bytewise by ``name=value`` pair, joined with ``&``;
  an empty query drops its ``?``

NOT implemented (stateful/heuristic canonicalizer options): session-id
stripping, %-re-encoding beyond what the URL already carries.
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import urlsplit

_WWW_RE = re.compile(r"^www\d*\.")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    """Canonical SURT key for *url* (assumed already safe/absolute)."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    host = _WWW_RE.sub("", host)

    reverse = True
    if "." not in host:
        reverse = False
    else:
        try:
            ipaddress.ip_address(host)
            reverse = False
        except ValueError:
            pass
    key_host = ",".join(reversed(host.split("."))) if reverse else host

    port = ""
    if parts.port is not None:
        p = str(parts.port)
        if _DEFAULT_PORT.get(scheme) != p:
            port = ":" + p

    path = parts.path or "/"
    query = ""
    if parts.query:
        query = "?" + "&".join(sorted(parts.query.split("&")))
    return (key_host + port + ")" + path + query).lower()


def surt_batch(urls: list[str | None]) -> list[str | None]:
    return [None if u is None else surt(u) for u in urls]
