"""HTTP metadata kernels vs reference semantics (httpcache.py:388-417,
text.py:79-87)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from scrupyst_ray.functions.httpmeta import (
    json_body,
    json_body_batch,
    parse_cachecontrol,
    rfc1123_to_epoch,
    rfc1123_to_epoch_batch,
)


class TestRfc1123:
    def test_rfc1123(self):
        assert rfc1123_to_epoch("Sun, 06 Nov 1994 08:49:37 GMT") == 784111777

    def test_rfc850_and_asctime(self):
        # email.utils parses the full HTTP-date grammar like the reference
        assert rfc1123_to_epoch("Sunday, 06-Nov-94 08:49:37 GMT") == 784111777
        assert rfc1123_to_epoch("Sun Nov  6 08:49:37 1994") == 784111777

    def test_bytes_none_garbage(self):
        assert rfc1123_to_epoch(b"Sun, 06 Nov 1994 08:49:37 GMT") == 784111777
        assert rfc1123_to_epoch(None) is None
        assert rfc1123_to_epoch("not a date") is None

    def test_batch(self):
        col = pa.array(["Sun, 06 Nov 1994 08:49:37 GMT", "nope", None])
        out = rfc1123_to_epoch_batch(col)
        assert out.to_pylist() == [784111777, None, None]


class TestCacheControl:
    def test_directives(self):
        # doctest cases from the reference (httpcache.py:390-403)
        assert parse_cachecontrol(b"public, max-age=3600") == {
            b"public": None,
            b"max-age": b"3600",
        }
        assert parse_cachecontrol(b"") == {}

    def test_case_and_str_input(self):
        assert parse_cachecontrol("No-Cache, Max-Age=0") == {
            b"no-cache": None,
            b"max-age": b"0",
        }


class TestJsonBody:
    def test_loads(self):
        assert json_body(b'{"a": [1, 2]}') == {"a": [1, 2]}

    def test_invalid_raises(self):
        with pytest.raises(Exception):
            json_body(b"<html>")

    def test_batch_routes_bad_rows(self):
        vals, ok = json_body_batch(pa.array([b'{"x":1}', b"nope", None]))
        assert vals == [{"x": 1}, None, None]
        assert ok.to_pylist() == [True, False, False]
