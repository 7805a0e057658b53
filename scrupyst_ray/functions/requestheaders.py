"""Request-header middlewares (M17): HTTP basic auth, proxy resolution,
default headers — reference ``scrapy/downloadermiddlewares/httpauth.py:25-53``,
``httpproxy.py:27-105``, ``defaultheaders.py:25-40``.

In the columnar engine a "request" is a frontier row, so these middlewares
are pure column computes over the ``url`` column: each returns the header
value (or proxy assignment) the reference middleware would set on the
request object.  ``basic_auth_header`` mirrors ``w3lib.http.basic_auth_header``
(public BSD, not installed here).
"""

from __future__ import annotations

import base64
from urllib.parse import unquote, urlparse, urlunparse
from urllib.request import _parse_proxy  # type: ignore[attr-defined]

from scrupyst_ray.functions.urlnorm import url_is_from_any_domain

# reference default_settings.py:231-234
DEFAULT_REQUEST_HEADERS: dict[str, str] = {
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en",
}


def basic_auth_header(
    username: str, password: str, encoding: str = "ISO-8859-1"
) -> bytes:
    """``Basic <base64(user:pass)>`` — w3lib.http.basic_auth_header."""
    auth = f"{username}:{password}"
    return b"Basic " + base64.b64encode(auth.encode(encoding))


def http_auth_for(
    url: str,
    http_user: str = "",
    http_pass: str = "",
    http_auth_domain: str | None = None,
) -> bytes | None:
    """Authorization header value per HttpAuthMiddleware (``httpauth.py:
    40-53``): only when credentials are configured AND the url is within
    ``http_auth_domain`` (None ⇒ any domain, the reference's legacy mode)."""
    if not (http_user or http_pass):
        return None
    if http_auth_domain and not url_is_from_any_domain(url, [http_auth_domain]):
        return None
    return basic_auth_header(http_user, http_pass)


def proxy_auth_header(username: str, password: str, encoding: str = "latin-1") -> bytes:
    # httpproxy.py:45-49: credentials are unquoted then encoded
    user_pass = f"{unquote(username)}:{unquote(password)}".encode(encoding)
    return base64.b64encode(user_pass)


def parse_proxy_url(url: str, orig_type: str = "") -> tuple[bytes | None, str]:
    """(credentials, proxy_url) per ``HttpProxyMiddleware._get_proxy``."""
    proxy_type, user, password, hostport = _parse_proxy(url)
    proxy_url = urlunparse((proxy_type or orig_type, hostport, "", "", "", ""))
    creds = proxy_auth_header(user, password or "") if user else None
    return creds, proxy_url


def _bypassed(host: str | None, no_proxy: list[str]) -> bool:
    """Simplified ``proxy_bypass``: suffix match against NO_PROXY entries
    ('*' bypasses everything)."""
    if not host:
        return False
    host = host.lower()
    for entry in no_proxy:
        e = entry.strip().lower().lstrip(".")
        if e == "*" or host == e or host.endswith("." + e):
            return True
    return False


def proxy_for(
    url: str,
    proxies: dict[str, str],
    no_proxy: list[str] | None = None,
) -> tuple[str | None, bytes | None]:
    """(proxy_url, Proxy-Authorization value) the reference middleware would
    assign for *url*, per ``httpproxy.py:60-79``: scheme-keyed proxy map,
    ``no_proxy`` bypass applies to http(s) schemes only."""
    p = urlparse(url)
    scheme = p.scheme
    if scheme not in proxies:
        return None, None
    if scheme in ("http", "https") and _bypassed(p.hostname, no_proxy or []):
        return None, None
    creds, proxy_url = parse_proxy_url(proxies[scheme], scheme)
    return proxy_url, (b"Basic " + creds) if creds else None


def apply_default_headers(
    request_headers: dict[str, str],
    defaults: dict[str, str | None] | None = None,
) -> dict[str, str]:
    """``DefaultHeadersMiddleware.process_request`` setdefault semantics:
    configured defaults (None-valued settings dropped first, reference
    ``without_none_values``) fill only the keys the request doesn't set."""
    if defaults is None:
        defaults = DEFAULT_REQUEST_HEADERS
    out = {k: v for k, v in defaults.items() if v is not None}
    out.update(request_headers)
    return out
