"""Meta-refresh redirect detection (M9) — reference
``scrapy/downloadermiddlewares/redirect.py:184-212`` (MetaRefreshMiddleware)
on top of ``w3lib.html.get_meta_refresh`` semantics (w3lib is public BSD but
not installed here; the parser is rebuilt from the documented behavior and
the reference's own middleware tests, ported to
``tests/test_metarefresh.py``):

- ``<meta http-equiv="refresh" content="<interval>; url=<target>">`` in the
  decoded HTML (attribute order flexible, quotes optional, the url value
  may itself be quoted inside the content attribute),
- HTML comments and the content of ``METAREFRESH_IGNORE_TAGS`` (default
  ``["noscript"]``, ``default_settings.py:432``) are removed first,
- the redirect fires only when interval < METAREFRESH_MAXDELAY (100,
  ``default_settings.py:433``) and both the page URL and the resolved
  target are http(s).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

METAREFRESH_MAXDELAY = 100  # default_settings.py:433
METAREFRESH_IGNORE_TAGS = ("noscript",)  # default_settings.py:432

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)

# both attribute orders; content value = interval [;,] url=<target>
_CONTENT_VAL = (
    r"(?P<int{n}>(?:\d*\.)?\d+)\s*[;,]\s*url=\s*(?P<url{n}>[^\"'>]+?|'[^']*'|\"[^\"]*\")"
)
_META_RE = re.compile(
    r"<meta\s[^>]*?http-equiv\s*=\s*[\"']?\s*refresh\s*[\"']?[^>]*?"
    r"content\s*=\s*[\"']\s*" + _CONTENT_VAL.format(n="") + r"\s*[\"']"
    r"|<meta\s[^>]*?content\s*=\s*[\"']\s*" + _CONTENT_VAL.format(n="2") + r"\s*[\"']"
    r"[^>]*?http-equiv\s*=\s*[\"']?\s*refresh\s*[\"']?",
    re.I | re.S,
)


def _remove_tags_with_content(text: str, tags: tuple[str, ...]) -> str:
    for tag in tags:
        text = re.sub(rf"<{tag}\b.*?</{tag}\s*>", "", text, flags=re.S | re.I)
    return text


def get_meta_refresh(
    text: str,
    base_url: str = "",
    ignore_tags: tuple[str, ...] = METAREFRESH_IGNORE_TAGS,
) -> tuple[float, str] | tuple[None, None]:
    """(interval, absolute_url) of the first meta-refresh, or (None, None)."""
    text = _remove_tags_with_content(text, ignore_tags)
    text = _COMMENT_RE.sub("", text)
    m = _META_RE.search(text)
    if not m:
        return None, None
    interval = float(m.group("int") or m.group("int2"))
    url = (m.group("url") or m.group("url2")).strip().strip("\"'").strip()
    return interval, urljoin(base_url, url)


def meta_refresh_target(
    text: str,
    base_url: str,
    max_delay: float = METAREFRESH_MAXDELAY,
    ignore_tags: tuple[str, ...] = METAREFRESH_IGNORE_TAGS,
) -> str | None:
    """Redirect target per MetaRefreshMiddleware rules, else None."""
    if urlparse(base_url).scheme not in ("http", "https"):
        return None
    interval, url = get_meta_refresh(text, base_url, ignore_tags)
    if url is None or interval is None:
        return None
    if urlparse(url).scheme not in ("http", "https"):
        return None
    if interval >= max_delay:
        return None
    return url
