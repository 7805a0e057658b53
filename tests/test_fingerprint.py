"""Golden fingerprint vectors from the reference test suite
(``/root/reference/tests/test_utils_request.py:65-200``): the SHA-1 bytes a
correct canonicalize+fingerprint implementation MUST produce.  These pin our
from-scratch urlnorm/fingerprint kernels to the reference bit-for-bit."""

import pyarrow as pa
import pytest

from scrupyst_ray.functions.fingerprint import fingerprint, fingerprint_batch, fp_to_u64
from scrupyst_ray.functions.urlnorm import canonicalize_url, safe_url_string

KNOWN_HASHES = [
    # (url, method, body, kwargs, expected 20-byte sha1)
    ("http://example.org", "GET", b"", {}, b"xs\xd7\x0c3uj\x15\xfe\xd7d\x9b\xa9\t\xe0d\xbf\x9cXD"),
    ("https://example.org", "GET", b"", {}, b"\xc04\x85P,\xaa\x91\x06\xf8t\xb4\xbd*\xd9\xe9\x8a:m\xc3l"),
    ("https://example.org?a", "GET", b"", {}, b"G\xad\xb8Ck\x19\x1c\xed\x838,\x01\xc4\xde;\xee\xa5\x94a\x0c"),
    ("https://example.org?a=b", "GET", b"", {}, b"\x024MYb\x8a\xc2\x1e\xbc>\xd6\xac*\xda\x9cF\xc1r\x7f\x17"),
    ("https://example.org?a=b&a", "GET", b"", {}, b"t+\xe8*\xfb\x84\xe3v\x1a}\x88p\xc0\xccB\xd7\x9d\xfez\x96"),
    ("https://example.org?a=b&a=c", "GET", b"", {}, b"\xda\x1ec\xd0\x9c\x08s`\xb4\x9b\xe2\xb6R\xf8k\xef\xeaQG\xef"),
    ("https://example.org", "POST", b"", {}, b"\x9d\xcdA\x0fT\x02:\xca\xa0}\x90\xda\x05B\xded\x8aN7\x1d"),
    ("https://example.org", "GET", b"a", {}, b"\xc34z>\xd8\x99\x8b\xda7\x05r\x99I\xa8\xa0x;\xa41_"),
    ("https://example.org", "POST", b"a", {}, b"5`\xe2y4\xd0\x9d\xee\xe0\xbatw\x87Q\xe8O\xd78\xfc\xe7"),
    # fragment dropped by default
    ("https://example.org#a", "GET", b"", {}, b"\xc04\x85P,\xaa\x91\x06\xf8t\xb4\xbd*\xd9\xe9\x8a:m\xc3l"),
    # fragment kept
    (
        "https://example.org#a",
        "GET",
        b"",
        {"keep_fragments": True},
        b"<\x1a\xeb\x85y\xdeW\xfb\xdcq\x88\xee\xaf\x17\xdd\x0c\xbfH\x18\x1f",
    ),
    ("https://example.org/ab", "GET", b"", {}, b"N\xe5l\xb8\x12@iw\xe2\xf3\x1bp\xea\xffp!u\xe2\x8a\xc6"),
    ("https://example.org/a", "GET", b"b", {}, b"_NOv\xbco$6\xfcW\x9f\xb24g\x9f\xbb\xdd\xa82\xc5"),
]


@pytest.mark.parametrize("url,method,body,kwargs,expected", KNOWN_HASHES)
def test_golden_fingerprints(url, method, body, kwargs, expected):
    assert fingerprint(url, method=method, body=body, **kwargs) == expected


def test_include_headers_golden():
    fp = fingerprint(
        "https://example.org#a",
        headers={"A": [b"B"]},
        include_headers=["A"],
    )
    assert fp == b"]\xc7\x1f\xf2\xafG2\xbc\xa4\xfa\x99\n33\xda\x18\x94\x81U."
    fp2 = fingerprint(
        "https://example.org#a",
        headers={"A": [b"B"]},
        include_headers=["A"],
        keep_fragments=True,
    )
    assert fp2 == b"\xc1\xef~\x94\x9bS\xc1\x83\t\xdcz8\x9f\xdc{\x11\x16I.\x11"


def test_query_string_key_order():
    f1 = fingerprint("http://www.example.com/query?id=111&cat=222")
    f2 = fingerprint("http://www.example.com/query?cat=222&id=111")
    assert f1 == f2


def test_query_string_key_without_value():
    f1 = fingerprint("http://www.example.com/hnnoticiaj1.aspx?78132,199")
    f2 = fingerprint("http://www.example.com/hnnoticiaj1.aspx?78160,199")
    assert f1 != f2


def test_headers_ignored_by_default():
    f1 = fingerprint("http://www.example.com/members/offers.html")
    f2 = fingerprint(
        "http://www.example.com/members/offers.html",
        headers={"SESSIONID": [b"somehash"]},
    )
    assert f1 == f2


def test_fragment_sensitivity():
    r1 = "http://www.example.com/test.html"
    r2 = "http://www.example.com/test.html#fragment"
    assert fingerprint(r1) == fingerprint(r2)
    assert fingerprint(r1) == fingerprint(r1, keep_fragments=True)
    assert fingerprint(r2) != fingerprint(r2, keep_fragments=True)


def test_method_body_sensitivity():
    assert fingerprint("http://www.example.com") != fingerprint(
        "http://www.example.com", method="POST"
    )
    assert fingerprint("http://www.example.com", method="POST") != fingerprint(
        "http://www.example.com", method="POST", body=b"request body"
    )


def test_batch_kernel_matches_scalar():
    urls = [u for u, m, b, k, _ in KNOWN_HASHES if m == "GET" and not b and not k]
    t = pa.table({"url": urls})
    out = fingerprint_batch(t, urls_are_safe=False)
    for u, got_fp, got64 in zip(urls, out["fp"].to_pylist(), out["fp64"].to_pylist()):
        want = fingerprint(u)
        assert got_fp == want
        assert got64 == fp_to_u64(want)


def test_canonicalize_basics():
    assert canonicalize_url("http://example.org") == "http://example.org/"
    assert (
        canonicalize_url("http://www.example.com/query?id=111&cat=222")
        == canonicalize_url("http://www.example.com/query?cat=222&id=111")
    )
    assert canonicalize_url("HTTP://Example.ORG/a#frag") == "http://example.org/a"
    assert (
        canonicalize_url("http://example.org/a#frag", keep_fragments=True)
        == "http://example.org/a#frag"
    )
    # uppercase percent-escape normalization, unnecessary escapes decoded
    assert canonicalize_url("http://example.org/r%7ea%2fb") == "http://example.org/r~a%2Fb"


def test_safe_url_string_basics():
    assert safe_url_string("http://example.org/a b") == "http://example.org/a%20b"
    assert safe_url_string("http://example.org/ö") == "http://example.org/%C3%B6"
    assert safe_url_string("  http://example.org/x\n") == "http://example.org/x"
