"""HTTP body decompression (M11) — reference
``scrapy/downloadermiddlewares/httpcompression.py:104-214`` + ``utils/gz.py``.

Transparent gzip/deflate decode with a max-size guard; brotli/zstd behind
import-tries (not in this container).  Batch kernel for corpora that store
compressed html.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pyarrow as pa

try:
    import brotli  # noqa: F401

    _HAVE_BROTLI = True
except ImportError:
    _HAVE_BROTLI = False

try:
    import zstandard  # noqa: F401

    _HAVE_ZSTD = True
except ImportError:
    _HAVE_ZSTD = False


class DecompressionMaxSizeExceeded(ValueError):
    pass


def gunzip(data: bytes, max_size: int = 0) -> bytes:
    """Robust gunzip (reference ``utils/gz.py``: tolerate trailing garbage /
    truncated streams by returning what decoded so far)."""
    f = gzip.GzipFile(fileobj=io.BytesIO(data))
    chunks = []
    total = 0
    try:
        while True:
            chunk = f.read(65536)
            if not chunk:
                break
            total += len(chunk)
            if max_size and total > max_size:
                raise DecompressionMaxSizeExceeded(
                    f"decompressed size over max_size={max_size}"
                )
            chunks.append(chunk)
    except (OSError, EOFError, zlib.error):
        if not chunks:
            raise
    return b"".join(chunks)


def _inflate(data: bytes, max_size: int = 0) -> bytes:
    try:
        out = zlib.decompress(data)
    except zlib.error:
        out = zlib.decompress(data, -15)  # raw deflate (reference fallback)
    if max_size and len(out) > max_size:
        raise DecompressionMaxSizeExceeded(
            f"decompressed size over max_size={max_size}"
        )
    return out


def decode_body(data: bytes, encoding: str, max_size: int = 0) -> bytes:
    """Decode one Content-Encoding token ('gzip'|'x-gzip'|'deflate'|'br'|
    'zstd'|'identity')."""
    if encoding in ("gzip", "x-gzip"):
        return gunzip(data, max_size)
    if encoding == "deflate":
        return _inflate(data, max_size)
    if encoding == "br":
        if not _HAVE_BROTLI:
            raise NotImplementedError("brotli not available in this environment")
        import brotli

        return brotli.decompress(data)
    if encoding == "zstd":
        if not _HAVE_ZSTD:
            raise NotImplementedError("zstandard not available in this environment")
        import zstandard

        return zstandard.ZstdDecompressor().decompress(data)
    return data  # identity / unknown: pass through (reference behavior)


def is_gzipped(data: bytes) -> bool:
    """Magic-byte sniff (reference sitemap gzip handling,
    ``spiders/sitemap.py:101-132``)."""
    return data[:2] == b"\x1f\x8b"


def decompress_batch(
    batch: pa.Table, body_col: str = "html", encoding_col: str | None = None
) -> pa.Table:
    """Decompress a binary column in place (gzip magic-sniffed when no
    encoding column exists)."""
    bodies = batch[body_col].to_pylist()
    encodings = (
        batch[encoding_col].to_pylist() if encoding_col else [None] * len(bodies)
    )
    out = []
    for body, enc in zip(bodies, encodings):
        body = body or b""
        if enc:
            out.append(decode_body(body, enc))
        elif is_gzipped(body):
            out.append(gunzip(body))
        else:
            out.append(body)
    idx = batch.column_names.index(body_col)
    return batch.set_column(idx, body_col, pa.array(out, pa.binary()))
