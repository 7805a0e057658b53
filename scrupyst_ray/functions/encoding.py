"""Character-encoding detection & decoding for HTML bodies.

From-scratch reimplementation of the ``w3lib.encoding`` functions the
reference's ``TextResponse`` uses (``scrapy/http/response/text.py:16-22``);
w3lib is public BSD but NOT installed here, so semantics are rebuilt:

- :func:`read_bom`                    — BOM sniff (UTF-32/16/8).
- :func:`http_content_type_encoding`  — ``charset=`` in a Content-Type value.
- :func:`html_body_declared_encoding` — ``<meta charset>``/``http-equiv`` or
  XML declaration in the first 4096 bytes.
- :func:`resolve_encoding`            — alias normalization + the w3lib
  "web-compat" translation table (notably ascii→cp1252, latin-1→cp1252,
  gb2312→gb18030).
- :func:`html_to_unicode`             — header charset → declared → BOM →
  auto-detect → default.

Undecodable byte ranges are replaced with one U+FFFD **per byte** (the w3lib
``w3lib_replace`` error handler), which differs from Python's built-in utf-8
``replace`` that collapses maximal invalid subsequences — this is part of the
byte-identical-text invariant surface.
"""

from __future__ import annotations

import codecs
import encodings
import re
from collections.abc import Callable

_BOM_TABLE: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF8, "utf-8"),
]
_FIRST_CHARS = {c[0] for (c, _) in _BOM_TABLE}


def read_bom(data: bytes) -> tuple[str | None, bytes | None]:
    """Read the byte-order mark prefix of *data*: ``(encoding, bom_bytes)`` or
    ``(None, None)``.  UTF-32 checked before UTF-16 (its BOM is a superset)."""
    if data and data[0] in _FIRST_CHARS:
        for bom, encoding in _BOM_TABLE:
            if data.startswith(bom):
                return encoding, bom
    return None, None


# w3lib's web-oriented encoding substitutions (keys are python-normalized names).
DEFAULT_ENCODING_TRANSLATION = {
    "ascii": "cp1252",
    "big5": "big5hkscs",
    "euc_kr": "cp949",
    "gb2312": "gb18030",
    "gb_2312_80": "gb18030",
    "gbk": "gb18030",
    "iso8859_11": "cp874",
    "iso8859_9": "cp1254",
    "latin_1": "cp1252",
    "macintosh": "mac_roman",
    "shift_jis": "cp932",
    "tis_620": "cp874",
    "win_1251": "cp1251",
    "windows_31j": "cp932",
    "win_31j": "cp932",
    "windows_874": "cp874",
    "win_874": "cp874",
    "x_sjis": "cp932",
    "zh_cn": "gb18030",
}


def _c18n_encoding(encoding: str) -> str:
    """Canonicalize an encoding name per Python's alias table."""
    normed = encodings.normalize_encoding(encoding).lower()
    return encodings.aliases.aliases.get(normed, normed)


def resolve_encoding(encoding_alias: str) -> str | None:
    """Python codec name for an (HTML-declared) encoding alias, applying the
    web-compat translation table; None if unknown."""
    c18n = _c18n_encoding(encoding_alias)
    translated = DEFAULT_ENCODING_TRANSLATION.get(c18n, c18n)
    try:
        return codecs.lookup(translated).name
    except (LookupError, TypeError):
        return None


_HEADER_ENCODING_RE = re.compile(r"charset=([\w-]+)", re.I)


def http_content_type_encoding(content_type: str | None) -> str | None:
    """Encoding declared in a Content-Type header value, resolved; else None."""
    if content_type:
        match = _HEADER_ENCODING_RE.search(content_type)
        if match:
            return resolve_encoding(match.group(1))
    return None


# Declared-in-body pattern: <meta http-equiv=content-type content="...charset=X">,
# <meta charset="X">, or an XML declaration — matched over the first 4 KiB.
_BODY_ENCODING_PATTERN = (
    r"<\s*(?:meta(?:(?:\s*http-equiv\s*=\s*[\"']?content-type[\"']?\s*content\s*=\s*[\"']?"
    r"(?:[^\"'>]*?)charset=(?P<charset>[\w-]+))|"
    r"(?:\s*content\s*=\s*[\"']?(?:[^\"'>]*?)charset=(?P<charset3>[\w-]+)[\"']?"
    r"\s*http-equiv\s*=\s*[\"']?content-type[\"']?)|"
    r"\s*charset\s*=\s*[\"']?(?P<charset2>[\w-]+))|"
    r"\?xml\s[^>]+encoding\s*=\s*[\"']?(?P<xmlcharset>[\w-]+))"
)
_BODY_ENCODING_STR_RE = re.compile(_BODY_ENCODING_PATTERN, re.I)
_BODY_ENCODING_BYTES_RE = re.compile(_BODY_ENCODING_PATTERN.encode("ascii"), re.I)


def html_body_declared_encoding(html_body_str: str | bytes) -> str | None:
    """Encoding declared inside the document (meta/xml decl), resolved."""
    chunk = html_body_str[:4096]
    if isinstance(chunk, bytes):
        match = _BODY_ENCODING_BYTES_RE.search(chunk)
    else:
        match = _BODY_ENCODING_STR_RE.search(chunk)
    if match:
        encoding = (
            match.group("charset")
            or match.group("charset2")
            or match.group("charset3")
            or match.group("xmlcharset")
        )
        if encoding:
            if isinstance(encoding, bytes):
                encoding = encoding.decode("ascii", errors="replace")
            return resolve_encoding(encoding)
    return None


def _w3lib_replace(exc: UnicodeError) -> tuple[str, int]:
    # one replacement char per undecodable byte (w3lib behavior)
    if isinstance(exc, UnicodeDecodeError):
        return "�" * (exc.end - exc.start), exc.end
    raise exc


codecs.register_error("scrupyst_w3lib_replace", _w3lib_replace)


def to_unicode(data_str: bytes, encoding: str) -> str:
    """Decode with per-byte U+FFFD replacement."""
    return data_str.decode(encoding, "scrupyst_w3lib_replace")


def html_to_unicode(
    content_type_header: str | None,
    html_body_str: bytes,
    default_encoding: str = "utf-8",
    auto_detect_fun: Callable[[bytes], str | None] | None = None,
) -> tuple[str, str]:
    """Return ``(encoding, unicode_body)`` using the w3lib resolution order:

    1. ``charset=`` in *content_type_header* (BOM stripped if it agrees;
       bare utf-16/utf-32 get BOM-derived or big-endian byte order),
    2. encoding declared in the body (meta / xml declaration),
    3. BOM,
    4. *auto_detect_fun*,
    5. *default_encoding*.
    """
    enc = http_content_type_encoding(content_type_header)
    if enc is not None:
        if enc in ("utf-16", "utf-32"):
            bom_enc, bom = read_bom(html_body_str)
            if bom_enc is not None and bom_enc.startswith(enc):
                enc = bom_enc
                html_body_str = html_body_str[len(bom) :]  # type: ignore[arg-type]
            else:
                enc += "-be"
        if enc == "utf-8":
            bom_enc, bom = read_bom(html_body_str)
            if bom_enc == "utf-8":
                html_body_str = html_body_str[len(bom) :]  # type: ignore[arg-type]
        return enc, to_unicode(html_body_str, enc)

    enc = html_body_declared_encoding(html_body_str)
    if enc is None:
        bom_enc, bom = read_bom(html_body_str)
        if bom_enc is not None:
            enc = bom_enc
            html_body_str = html_body_str[len(bom) :]  # type: ignore[arg-type]
    elif enc in ("utf-16", "utf-32"):
        enc += "-be"
    if enc is None and auto_detect_fun is not None:
        enc = auto_detect_fun(html_body_str)
    if enc is None:
        enc = default_encoding
    return enc, to_unicode(html_body_str, enc)
