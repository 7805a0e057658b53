"""HTTP metadata scalar kernels: RFC1123 dates, Cache-Control, JSON bodies.

Batch counterparts of the reference's header/body helpers (SURVEY §2.8):

- ``rfc1123_to_epoch`` — ``scrapy/extensions/httpcache.py:412-417``
  (``email.utils`` parse chain covering RFC1123 / RFC850 / asctime, any
  failure → None).
- ``parse_cachecontrol`` — ``scrapy/extensions/httpcache.py:388-409``
  (comma-split directives, lowercase keys, valueless directive → None).
- ``json_body`` — ``TextResponse.json()``, ``scrapy/http/response/text.py:
  79-87`` (``json.loads`` over the raw body bytes).

The batch variants are python-kernel ``map_batches`` fare: per-value stdlib
calls over an Arrow column, returning Arrow arrays (nulls for unparseable
values rather than exceptions, so a bad row can't kill a 100 TB stage).
"""

from __future__ import annotations

import json
from email.utils import mktime_tz, parsedate_tz
from typing import Any

import pyarrow as pa


def rfc1123_to_epoch(date_str: str | bytes | None) -> int | None:
    """Epoch seconds for an HTTP date header value, else None."""
    try:
        if isinstance(date_str, bytes):
            date_str = date_str.decode("ascii")
        return int(mktime_tz(parsedate_tz(date_str)))  # type: ignore[arg-type]
    except Exception:
        return None


def rfc1123_to_epoch_batch(column: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Vector wrapper: string column of HTTP dates → int64 epoch (null on
    unparseable), e.g. for ``Last-Modified`` / ``Expires`` columns."""
    vals = column.to_pylist() if hasattr(column, "to_pylist") else list(column)
    return pa.array([rfc1123_to_epoch(v) for v in vals], pa.int64())


def parse_cachecontrol(header: bytes | str) -> dict[bytes, bytes | None]:
    """Cache-Control directives dict (reference semantics: lowercase keys,
    ``None`` value for valueless directives)."""
    if isinstance(header, str):
        header = header.encode("ascii", "replace")
    directives: dict[bytes, bytes | None] = {}
    for directive in header.split(b","):
        key, sep, val = directive.strip().partition(b"=")
        if key:
            directives[key.lower()] = val if sep else None
    return directives


def json_body(body: bytes | str | None) -> Any:
    """``TextResponse.json()``: deserialize the body, raising on invalid
    JSON exactly like the reference (no silent None — callers that want
    tolerance use :func:`json_body_batch`)."""
    if body is None:
        raise ValueError("no body")
    return json.loads(body)


def json_body_batch(
    column: pa.Array | pa.ChunkedArray | list,
) -> tuple[list[Any], pa.Array]:
    """Batch ``response.json()``: returns (decoded objects with None for
    invalid rows, bool validity array) so pipelines can route bad rows
    instead of failing the stage."""
    vals = column.to_pylist() if hasattr(column, "to_pylist") else list(column)
    out: list[Any] = []
    ok: list[bool] = []
    for v in vals:
        try:
            out.append(json.loads(v))
            ok.append(True)
        except Exception:
            out.append(None)
            ok.append(False)
    return out, pa.array(ok, pa.bool_())
