"""Response-type sniffing (M13) — reference ``scrapy/responsetypes.py:21-145``.

The reference picks a Response subclass from, in order: Content-Type header →
Content-Disposition → URL extension → body sniff.  Our corpus rows carry no
headers, so the kernel implements the header rules for an OPTIONAL
content_type column and the body/url fallbacks, emitting ``is_html / is_xml /
is_text`` boolean columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_HTML_CT = re.compile(rb"text/html|application/xhtml\+xml|application/vnd\.wap\.xhtml\+xml")
_XML_CT = re.compile(rb"application/xml|text/xml|application/atom\+xml|application/rss\+xml|application/xslt\+xml")
_TEXT_CT = re.compile(rb"^text/|charset=")

_BINARY_EXTENSIONS = frozenset(
    ".pdf .zip .7z .rar .exe .png .jpg .jpeg .gif .webp .mp3 .mp4 .avi".split()
)
# mimetypes reports these as *encodings*, not types; the reference's
# from_filename then returns plain Response and the decision falls through
# to the body sniff (responsetypes.py:96-101 + from_args order :135-142).
_ENCODING_SUFFIXES = (".gz", ".bz2")
_HTML_EXTENSIONS = (".html", ".htm", ".xhtml")
_XML_EXTENSIONS = (".xml", ".rss", ".atom", ".xsl", ".xslt")
_TEXT_EXTENSIONS = (".txt", ".csv", ".json")


def _is_binary_body(body: bytes) -> bool:
    """Reference binary check: a NUL byte in the first chunk ⇒ binary
    (``scrapy/utils/response.py`` / ``responsetypes.py:120-133`` semantics)."""
    return b"\x00" in body[:5000]


def sniff_type(body: bytes, url: str = "", content_type: bytes | None = None) -> str:
    """'html' | 'xml' | 'text' | 'binary' via the reference's ordered rules."""
    if content_type:
        if _HTML_CT.search(content_type):
            return "html"
        if _XML_CT.search(content_type):
            return "xml"
        if _TEXT_CT.search(content_type):
            return "text"
        return "binary"
    path = url.split("?", 1)[0].lower()
    if not path.endswith(_ENCODING_SUFFIXES):
        for ext in _BINARY_EXTENSIONS:
            if path.endswith(ext):
                return "binary"
        if path.endswith(_HTML_EXTENSIONS):
            return "html"
        if path.endswith(_XML_EXTENSIONS):
            return "xml"
        if path.endswith(_TEXT_EXTENSIONS):
            return "text"
    # body sniff, reference from_body semantics (responsetypes.py:120-133):
    # substring checks over the first 5000 bytes, binary first.
    chunk = (body or b"")[:5000]
    if _is_binary_body(chunk):
        return "binary"
    lower = chunk.lower()
    if b"<html>" in lower or b"<!doctype html" in lower:
        return "html"
    if b"<?xml" in lower:
        return "xml"
    return "text"


def sniff_batch(
    batch: pa.Table,
    html_col: str = "html",
    url_col: str = "url",
    content_type_col: str = "content_type",
) -> pa.Table:
    """Append ``kind`` plus is_html / is_xml / is_text columns.  When the
    batch carries a *content_type_col* (string, nullable), non-null values
    take the reference's header branch (``responsetypes.py:60-94``);
    null rows fall through to the URL-extension / body sniff."""
    bodies = batch[html_col].to_pylist()
    urls = batch[url_col].to_pylist()
    cts = (
        batch[content_type_col].to_pylist()
        if content_type_col in batch.column_names
        else [None] * batch.num_rows
    )
    kinds = [
        sniff_type(b or b"", u, ct.encode() if ct else None)
        for b, u, ct in zip(bodies, urls, cts)
    ]
    k = np.array(kinds)
    out = batch
    for col in ("kind", "is_html", "is_xml", "is_text"):
        if col in out.column_names:
            out = out.drop_columns([col])
    out = out.append_column("kind", pa.array(kinds, pa.string()))
    for col, val in (("is_html", "html"), ("is_xml", "xml"), ("is_text", "text")):
        out = out.append_column(col, pa.array(k == val, pa.bool_()))
    return out
