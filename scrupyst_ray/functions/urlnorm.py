"""URL normalization & canonicalization.

From-scratch reimplementation of the subset of ``w3lib.url`` semantics that the
reference engine depends on (w3lib is a public BSD library; it is NOT installed
in this environment, so the behavior is rebuilt here from its documented
contract and verified against the reference's golden request fingerprints,
reference ``tests/test_utils_request.py:65-200``):

- ``safe_url_string``  — applied to every Request URL at construction
  (reference ``scrapy/http/request/__init__.py:228-239``).
- ``canonicalize_url`` — query-param sorting, percent-encoding normalization,
  fragment dropping; input to the request fingerprint
  (reference ``scrapy/utils/request.py:87-96``).
- ``strip_html5_whitespace`` — href cleanup in the link extractor
  (reference ``scrapy/linkextractors/lxmlhtml.py:115-117``).
- ``url_has_any_extension`` / ``url_is_from_any_domain`` — link filters
  (reference ``scrapy/utils/url.py:43-62``).

All functions are pure and deterministic; they are called per-value inside
Arrow ``map_batches`` kernels (see ``scrupyst_ray.stages``).
"""

from __future__ import annotations

import re
import string
from urllib.parse import (
    parse_qsl,
    quote,
    unquote,
    unquote_to_bytes,
    urlencode,
    urljoin,
    urlparse,
    urlsplit,
    urlunparse,
    urlunsplit,
)

# RFC 3986 character classes (public spec).
RFC3986_GEN_DELIMS = b":/?#[]@"
RFC3986_SUB_DELIMS = b"!$&'()*+,;="
RFC3986_RESERVED = RFC3986_GEN_DELIMS + RFC3986_SUB_DELIMS
RFC3986_UNRESERVED = (string.ascii_letters + string.digits + "-._~").encode()
EXTRA_SAFE_CHARS = b"|"  # kept unencoded for compatibility with real-world URLs
RFC3986_USERINFO_SAFE_CHARS = RFC3986_SUB_DELIMS + b":"

_SAFE_CHARS = RFC3986_RESERVED + RFC3986_UNRESERVED + EXTRA_SAFE_CHARS + b"%"
_PATH_SAFE_CHARS = _SAFE_CHARS.replace(b"#", b"")

# WHATWG URL spec: strip leading/trailing C0 controls and space; remove ASCII
# tab/newline anywhere.
_ASCII_TAB_OR_NEWLINE = re.compile(r"[\t\n\r]")
_C0_SPACE = "".join(chr(c) for c in range(0x21)) + "\x7f"

HTML5_WHITESPACE = " \t\n\r\x0c"

# -- fast paths ---------------------------------------------------------------
# The slow paths below are exact reimplementations of the w3lib contracts; the
# hot loop (link extraction + fingerprinting: millions of calls per round)
# mostly sees URLs that the slow path maps to THEMSELVES.  Each fast-path
# regex admits only inputs for which the function is provably the identity
# (or a trivial rewrite), everything else falls through to the full path.
# Parity is enforced by tests/test_fingerprint.py::TestUrlnormFastPathParity,
# which compares fast vs forced-slow on golden + adversarial + random inputs.

# safe_url_string identity: lowercase http(s) scheme, lowercase ASCII host
# (no userinfo/port), all remaining chars inside the component-wise safe sets
# (every char of _SAFE_CHARS plus the '?'/'#' separators).
_SAFE_FAST_RE = re.compile(
    r"^https?://[a-z0-9.\-]+"
    r"(?:$|[/?#][A-Za-z0-9%/?#@!$&'()*+,;=\[\]\-._~:|]*$)"
)

# canonicalize_url fast shape: lowercase http(s)://host/path with no '%', no
# ';' (urlparse params), query restricted to quote_plus-safe chars.  The
# query is still key-sorted in the fast path; the fragment is dropped or
# kept verbatim.
_CANON_FAST_RE = re.compile(
    r"^https?://[a-z0-9.\-]+/[A-Za-z0-9/=._\-~:@!$&'()*+,|]*"
    r"(?:\?[A-Za-z0-9_.\-~=&]+)?$"
)
_CANON_FRAGMENT_RE = re.compile(r"^[A-Za-z0-9%/?@!$&'()*+,;=\[\]\-._~:|#]+$")

_HOST_FAST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([a-z0-9.\-]+)(?=[/?#]|$)")


def strip_html5_whitespace(text: str) -> str:
    """Strip HTML5 space characters (space, tab, LF, FF, CR) from both ends."""
    return text.strip(HTML5_WHITESPACE)


def _strip(url: str) -> str:
    return _ASCII_TAB_OR_NEWLINE.sub("", url.strip(_C0_SPACE))


def safe_url_string(
    url: str,
    encoding: str = "utf-8",
    path_encoding: str = "utf-8",
    quote_path: bool = True,
) -> str:
    """Return a percent-encoded, ASCII-safe version of *url*.

    Mirrors w3lib ``safe_url_string``: IDNA-encode the host, percent-encode
    non-safe characters in path/query/fragment (leaving existing %XX escapes
    untouched because '%' is in the safe set), keep userinfo and port.
    """
    if quote_path and _SAFE_FAST_RE.match(url):
        # identity fast path — but a bare trailing '?'/'#' (empty query or
        # fragment) is dropped by urlunsplit, so those shapes fall through
        hi = url.find("#")
        if hi != len(url) - 1:
            end = hi if hi != -1 else len(url)
            qi = url.find("?", 0, end)
            if qi == -1 or qi + 1 != end:
                return url
    return _safe_url_string_slow(url, encoding, path_encoding, quote_path)


def _safe_url_string_slow(
    url: str,
    encoding: str = "utf-8",
    path_encoding: str = "utf-8",
    quote_path: bool = True,
) -> str:
    """Full general path (fast-path parity oracle)."""
    decoded = _strip(url)
    parts = urlsplit(decoded)

    netloc_bytes = b""
    username, password = parts.username, parts.password
    if username is not None or password is not None:
        if username is not None:
            safe_username = quote(
                unquote(username), RFC3986_USERINFO_SAFE_CHARS.decode()
            )
            netloc_bytes += safe_username.encode(encoding)
        if password is not None:
            netloc_bytes += b":"
            safe_password = quote(
                unquote(password), RFC3986_USERINFO_SAFE_CHARS.decode()
            )
            netloc_bytes += safe_password.encode(encoding)
        netloc_bytes += b"@"
    hostname = parts.hostname
    if hostname:
        try:
            netloc_bytes += hostname.encode("idna")
        except UnicodeError:
            netloc_bytes += hostname.encode(encoding)
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None:
        netloc_bytes += b":" + str(port).encode(encoding)
    netloc = netloc_bytes.decode()

    if quote_path:
        path = quote(parts.path.encode(path_encoding), _PATH_SAFE_CHARS)
    else:
        path = parts.path

    return urlunsplit(
        (
            parts.scheme,
            netloc,
            path,
            quote(parts.query.encode(encoding), _SAFE_CHARS),
            quote(parts.fragment.encode(encoding), _SAFE_CHARS),
        )
    )


def _unquotepath(path: str) -> bytes:
    # %2F / %3F must stay escaped inside a path (they would change its
    # structure if decoded), so protect them before the general unquote.
    for reserved in ("2f", "2F", "3f", "3F"):
        path = path.replace("%" + reserved, "%25" + reserved.upper())
    return unquote_to_bytes(path)


def _parse_qsl_to_bytes(
    qs: str, keep_blank_values: bool = False
) -> list[tuple[bytes, bytes]]:
    """Like ``urllib.parse.parse_qsl`` but returning raw bytes pairs
    (so non-UTF8 percent-escapes round-trip losslessly)."""
    pairs = qs.split("&")
    out: list[tuple[bytes, bytes]] = []
    for name_value in pairs:
        if not name_value:
            continue
        nv = name_value.split("=", 1)
        if len(nv) != 2:
            if not keep_blank_values:
                continue
            nv.append("")
        if len(nv[1]) or keep_blank_values:
            name = unquote_to_bytes(nv[0].replace("+", " "))
            value = unquote_to_bytes(nv[1].replace("+", " "))
            out.append((name, value))
    return out


def canonicalize_url(
    url: str,
    keep_blank_values: bool = True,
    keep_fragments: bool = False,
    encoding: str | None = None,
) -> str:
    """Canonical form of *url* (w3lib ``canonicalize_url`` semantics):

    - sort query arguments (first by key bytes, then value bytes),
    - percent-encode path / query with uppercase escapes, decoding any
      unnecessarily-escaped characters,
    - normalize empty path to ``/``,
    - lowercase the netloc (host),
    - remove the fragment unless *keep_fragments*.

    Golden oracle: the reference fingerprint test vectors
    (``tests/test_utils_request.py:65-141``) which hash this string.
    """
    # fast path: already-canonical shape except (possibly) query order and
    # the fragment — sort the query pairs in place, drop/keep the fragment
    hi = url.find("#")
    base = url[:hi] if hi != -1 else url
    if _CANON_FAST_RE.match(base):
        qi = base.find("?")
        if qi == -1:
            query_ok = True
        else:
            pairs = base[qi + 1 :].split("&")
            query_ok = all(p.count("=") == 1 for p in pairs)
            if query_ok:
                kv = [p.split("=", 1) for p in pairs]
                if not keep_blank_values:
                    kv = [p for p in kv if p[1]]
                kv.sort()
                if kv:
                    base = base[:qi] + "?" + "&".join(f"{k}={v}" for k, v in kv)
                else:
                    base = base[:qi]
        if query_ok:
            if not keep_fragments or hi == -1:
                return base
            fragment = url[hi + 1 :]
            if fragment and _CANON_FRAGMENT_RE.match(fragment):
                return base + "#" + fragment
    return _canonicalize_url_slow(url, keep_blank_values, keep_fragments, encoding)


def _canonicalize_url_slow(
    url: str,
    keep_blank_values: bool = True,
    keep_fragments: bool = False,
    encoding: str | None = None,
) -> str:
    """Full general path (fast-path parity oracle)."""
    enc = encoding or "utf-8"
    parts = urlparse(url)
    try:
        netloc = parts.netloc.encode("idna").decode() if parts.netloc else ""
    except UnicodeError:
        netloc = parts.netloc
    scheme = parts.scheme
    path = quote(parts.path.encode(enc), _PATH_SAFE_CHARS)
    params = quote(parts.params.encode(enc), _SAFE_CHARS)
    query = quote(parts.query.encode(enc), _SAFE_CHARS)
    fragment = quote(parts.fragment.encode(enc), _SAFE_CHARS)

    keyvals = _parse_qsl_to_bytes(query, keep_blank_values)
    keyvals.sort()
    query = urlencode(keyvals)

    path = quote(_unquotepath(path), _PATH_SAFE_CHARS) or "/"
    fragment = "" if not keep_fragments else fragment

    return urlunparse(
        (scheme, netloc.lower().rstrip(":"), path, params, query, fragment)
    )


def parse_host(url: str) -> str:
    """Lowercased hostname of *url* ('' if unparseable) — the politeness /
    seen-shard routing key (reference slot key: hostname,
    ``scrapy/core/downloader/__init__.py:169-177``)."""
    m = _HOST_FAST_RE.match(url)
    if m:
        return m.group(1)
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def _url_path(url: str) -> str:
    """``urlparse(url).path`` without the full parse (params split included)."""
    i = url.find("://")
    if i == -1 or not (
        url[:i].isascii()
        and url[:1].isalpha()
        and url[:i].replace("+", "a").replace("-", "a").replace(".", "a").isalnum()
    ):
        try:
            return urlparse(url).path
        except ValueError:
            raise
    j = url.find("/", i + 3)
    if j == -1:
        return ""
    end = len(url)
    for sep in ("#", "?"):
        k = url.find(sep, j, end)
        if k != -1:
            end = k
    path = url[j:end]
    # urlparse splits ';params' off the last path segment
    semi = path.find(";", path.rfind("/"))
    if semi != -1:
        path = path[:semi]
    return path


from functools import lru_cache


@lru_cache(maxsize=64)
def _norm_extensions(extensions: frozenset[str]) -> frozenset[str]:
    return frozenset(e.lstrip(".").lower() for e in extensions)


def url_has_any_extension(url: str, extensions: frozenset[str] | set[str]) -> bool:
    """True if the URL path ends in one of *extensions* (reference
    ``scrapy/utils/url.py:60-63`` — there the entries carry a leading dot
    and match by ``endswith``; dotted and dot-less entries are accepted here
    and normalized once per distinct set).  Equivalent to checking every
    dot-suffix of the path against the set (extensions may contain one
    internal dot, e.g. ``tar.gz``)."""
    if not isinstance(extensions, frozenset):
        extensions = frozenset(extensions)
    extensions = _norm_extensions(extensions)
    try:
        path = _url_path(url).lower()
    except ValueError:
        return False
    pos = len(path)
    for _ in range(4):
        pos = path.rfind(".", 0, pos)
        if pos == -1:
            return False
        if path[pos + 1 :] in extensions:
            return True
    return False


def url_is_from_any_domain(url: str, domains: list[str]) -> bool:
    """True if the URL's NETLOC equals one of *domains* or is a subdomain of
    it — reference ``scrapy/utils/url.py:43-48`` matches the lowered netloc,
    so a port (or userinfo) in the URL must also appear in the domain entry
    to match (``192.169.0.15:8080`` ≠ ``192.169.0.15`` — reference
    ``tests/test_utils_url.py::test_url_is_from_any_domain``).  The OFFSITE
    filter is different (hostname-only, port-insensitive) and uses
    :func:`host_is_from_any_domain`."""
    netloc = urlsplit(url).netloc.lower()
    if not netloc:
        return False
    domains = [d.lower() for d in domains]
    return any(netloc == d or netloc.endswith(f".{d}") for d in domains)


def host_is_from_any_domain(url: str, domains: list[str]) -> bool:
    """Hostname-only domain match (port/userinfo-insensitive) — the OFFSITE
    middleware semantics (reference ``downloadermiddlewares/offsite.py:67-99``
    regex ``^(.*\\.)?(d1|d2...)$`` against ``urlparse(url).hostname``)."""
    host = parse_host(url)
    if not host:
        return False
    domains = [d.lower() for d in domains]
    return any(host == d or host.endswith(f".{d}") for d in domains)


# -- cached-base urljoin ------------------------------------------------------

# base eligible for fast joins: clean absolute http(s) URL; a query or
# fragment on the BASE is fine (RFC 3986 join uses only the base path for
# relative references — the empty-href case is precomputed via urljoin)
_JOIN_BASE_RE = re.compile(
    r"^(https?://[^/?#]+)((?:/[^?#]*)?)(?:\?[^#]*)?(?:#.*)?$"
)
# relative reference eligible for the prefix fast path: path segments without
# ':' (a colon in the first segment would parse as a scheme), '?' query and
# '#' fragment allowed
# segments exclude ':' (scheme ambiguity) and ';' (bare-params dropping) and
# must be nonempty (urljoin collapses empty segments); a bare trailing '?' or
# '#' would be dropped by urljoin, so query/fragment must be nonempty
_JOIN_REL_SEG = r"[A-Za-z0-9_\-.~%!$&'()*+,=@]+"
_JOIN_REL_RE = re.compile(
    rf"^{_JOIN_REL_SEG}(?:/{_JOIN_REL_SEG})*/?(?:\?[^#]+)?(?:#.+)?$"
)
# absolute reference for which urljoin is the identity: nonempty host, no
# bare trailing '?' / '#' / ';' (urlunparse drops empty query/fragment/params)
_JOIN_ABS_RE = re.compile(
    r"^https?://[^/?#]+(?:/[^?#]*(?<![;/])|/)?(?:\?[^#]+)?(?:#.+)?$"
)
# root-relative reference: nonempty-or-bare path without a trailing ';' (the
# bare-params drop), nonempty query/fragment if present; the caller also
# rejects '/.' (dot segments) inside the captured path
_JOIN_ROOT_RE = re.compile(r"^(/(?:[^?#]*(?<![;/]))?)(?:\?[^#]+)?(?:#.+)?$")


def make_joiner(base_url: str):
    """Return ``join(href) -> str`` equal to ``urljoin(base_url, href)`` but
    with the base parsed ONCE — ``urljoin`` re-parses the base on every call,
    which dominates link extraction on pages with many links.  Fast paths
    cover plain relative paths, root-relative paths and already-absolute
    http(s) references; every other shape (dot segments, protocol-relative,
    other schemes, query/fragment-only refs) falls back to ``urljoin``
    itself, so the result is always identical (property-tested)."""
    m = _JOIN_BASE_RE.match(base_url)
    if m is None or "/." in m.group(2):
        return lambda href: urljoin(base_url, href)
    root = m.group(1)
    path = m.group(2)
    base_dir = root + path[: path.rfind("/") + 1] if path else root + "/"
    # urljoin(base, "") keeps the base query but drops its fragment —
    # precompute rather than special-case
    empty_result = urljoin(base_url, "")

    def join(href: str) -> str:
        if not href:
            return empty_result
        if "\t" in href or "\n" in href or "\r" in href:
            # urlsplit strips ASCII tab/newline anywhere in the URL (WHATWG
            # rule) — the fast-path regexes would keep them, diverging from
            # urljoin, so these always take the stdlib path
            return urljoin(base_url, href)
        c0 = href[0]
        if c0 == "/":
            if href.startswith("//"):
                return urljoin(base_url, href)
            m2 = _JOIN_ROOT_RE.match(href)
            if m2 is not None and "/." not in m2.group(1):
                return root + href
        elif c0 not in "?#.":
            if _JOIN_REL_RE.match(href):
                if "/." not in href and ".." not in href:
                    return base_dir + href
            elif _JOIN_ABS_RE.match(href):
                return href
        return urljoin(base_url, href)

    return join
