"""Encoding-detection chain tests mirroring the reference TextResponse
semantics (``scrapy/http/response/text.py:67-141``) over the FIXTURES.md §1
encoding matrix: (a) plain UTF-8, (b) UTF-8 BOM, (c) meta cp1252,
(d) http-equiv gb18030, (e) mis-declared utf-8 with cp1252 bytes,
(f) pure ASCII."""

import pyarrow as pa

from scrupyst_ray.functions.encoding import (
    html_body_declared_encoding,
    http_content_type_encoding,
    read_bom,
    resolve_encoding,
)
from scrupyst_ray.functions.textextract import (
    detect_and_decode,
    extract_text,
    extract_text_batch,
)


def test_resolve_encoding_web_compat():
    assert resolve_encoding("ascii") == "cp1252"
    assert resolve_encoding("latin-1") == "cp1252"
    assert resolve_encoding("gb2312") == "gb18030"
    assert resolve_encoding("UTF8") == "utf-8"
    assert resolve_encoding("no-such-enc") is None


def test_http_content_type_encoding():
    assert http_content_type_encoding("text/html; charset=UTF-8") == "utf-8"
    assert http_content_type_encoding("text/html") is None
    assert http_content_type_encoding(None) is None


def test_read_bom():
    assert read_bom(b"\xef\xbb\xbfhello") == ("utf-8", b"\xef\xbb\xbf")
    assert read_bom(b"\xff\xfeh\x00") == ("utf-16-le", b"\xff\xfe")
    assert read_bom(b"hello") == (None, None)


def test_meta_charset_declared():
    assert (
        html_body_declared_encoding(b'<html><head><meta charset="cp1252">') == "cp1252"
    )
    assert (
        html_body_declared_encoding(
            b'<meta http-equiv="Content-Type" content="text/html; charset=gb18030">'
        )
        == "gb18030"
    )
    assert (
        html_body_declared_encoding(b'<?xml version="1.0" encoding="utf-16"?>')
        == "utf-16"
    )
    assert html_body_declared_encoding(b"<html><body>plain") is None


def test_plain_utf8_body():
    body = "<html><body>héllo 世界</body></html>".encode("utf-8")
    enc, text = detect_and_decode(body)
    assert enc == "utf-8"
    assert text == body.decode("utf-8")


def test_utf8_bom_body():
    raw = "<html><body>héllo</body></html>"
    body = b"\xef\xbb\xbf" + raw.encode("utf-8")
    enc, text = detect_and_decode(body)
    assert enc == "utf-8"
    assert text == raw  # BOM stripped


def test_meta_cp1252_body():
    body = b'<html><head><meta charset="cp1252"></head><body>\x93quoted\x94</body></html>'
    enc, text = detect_and_decode(body)
    assert enc == "cp1252"
    assert "“quoted”" in text


def test_http_equiv_gb18030_body():
    inner = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=gb18030\"></head><body>你好</body></html>"
    body = inner.encode("gb18030")
    enc, text = detect_and_decode(body)
    assert enc == "gb18030"
    assert "你好" in text


def test_misdeclared_utf8_with_cp1252_bytes():
    # declared utf-8 but contains a raw cp1252 quote byte: the bad byte must
    # become exactly one U+FFFD (w3lib per-byte replacement)
    body = b'<html><head><meta charset="utf-8"></head><body>a\x93b</body></html>'
    enc, text = detect_and_decode(body)
    assert enc == "utf-8"
    assert "a�b" in text


def test_pure_ascii_body():
    body = b"<html><body>plain ascii</body></html>"
    enc, text = detect_and_decode(body)
    # ascii auto-detect resolves to cp1252 (w3lib translation), text unchanged
    assert enc == "cp1252"
    assert text == body.decode("ascii")


def test_undeclared_cp1252_bytes():
    # no declaration, not valid utf-8 → auto-detect lands on cp1252
    body = b"<html><body>\x93q\x94</body></html>"
    enc, text = detect_and_decode(body)
    assert enc == "cp1252"
    assert "“q”" in text


def test_batch_kernel_matches_scalar():
    bodies = [
        "<html><body>héllo</body></html>".encode("utf-8"),
        b"\xef\xbb\xbf<html><body>bom</body></html>",
        b'<html><head><meta charset="cp1252"></head><body>\x93q\x94</body></html>',
        b"<html><body>ascii</body></html>",
    ]
    t = pa.table({"html": pa.array(bodies, type=pa.binary())})
    out = extract_text_batch(t)
    assert out["text"].to_pylist() == [extract_text(b) for b in bodies]
