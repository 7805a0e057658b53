"""WARC (ISO 28500) source + sink — the standard web-archive interchange
format the crawl ecosystem round-trips pages through (Common Crawl dumps,
`scrapy` WARC plugins; cf. reference download/export surfaces at
``scrapy/extensions/feedexport.py`` which this generalizes to an archive
format).

Scale shape
-----------
- **Sink**: one ``.warc.gz`` per input block, rendered INSIDE ``map_batches``
  tasks and written atomically (tmp + rename) — partitioned, resumable
  output; the driver only sees a tiny manifest table (path, records, bytes).
  Records are individually-gzipped members (the standard Common Crawl
  layout: keeps record-level random access for index-based readers) with
  ``mtime=0`` so output bytes are a pure function of the rows.
- **Source**: ``ray.data.read_binary_files`` → per-file flat parse inside
  ``map_batches`` — each archive file is one task's unit of work, so a
  directory of shard files streams with normal backpressure and the payload
  bytes never visit the driver.  (At 100 TB keep shard files ~0.5–1 GB —
  one object-store block each — exactly how Common Crawl segments ship.)
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import os
import zlib

import pyarrow as pa
import ray.data

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"

READ_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("warc_type", pa.string()),
        ("record_id", pa.string()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def _warc_date(ts: dt.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")


def _record_id(url: str, date: str) -> str:
    """Deterministic urn:uuid (md5 of url+date formatted as a UUID) — the
    spec only requires global uniqueness, and a content-derived id keeps
    the sink a pure function of its rows (resume/idempotence)."""
    h = hashlib.md5(f"{url}\n{date}".encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def render_record(
    url: str,
    body: bytes,
    *,
    status: int = 200,
    content_type: str = "text/html",
    ts: dt.datetime | None = None,
    warc_type: str = "response",
) -> bytes:
    """One uncompressed WARC record: WARC headers + an HTTP/1.1 response
    block (``Content-Type: application/http; msgtype=response``)."""
    ts = ts or dt.datetime(2025, 1, 1)
    date = _warc_date(ts)
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Unknown"
    )
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    digest = hashlib.sha1(body).hexdigest()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: " + _record_id(url, date).encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Target-URI: " + url.encode("ascii"),
        b"WARC-Payload-Digest: sha1:" + digest.encode("ascii"),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF


def render_conversion(
    url: str,
    text: bytes,
    *,
    ts: dt.datetime | None = None,
    refers_to: str | None = None,
) -> bytes:
    """One WET-style ``conversion`` record (ISO 28500 §6.8; the layout of
    Common Crawl's ``*.warc.wet.gz`` extracted-text sidecar files):
    plain-text payload, ``WARC-Refers-To`` linking back to the response
    record the text was extracted from."""
    ts = ts or dt.datetime(2025, 1, 1)
    date = _warc_date(ts)
    digest = hashlib.sha1(text).hexdigest()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: conversion",
        b"WARC-Record-ID: "
        + _record_id("conversion:" + url, date).encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Target-URI: " + url.encode("ascii"),
    ]
    if refers_to:
        headers.append(b"WARC-Refers-To: " + refers_to.encode("ascii"))
    headers += [
        b"WARC-Payload-Digest: sha1:" + digest.encode("ascii"),
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(text)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + text + _CRLF + _CRLF


def render_metadata(
    url: str,
    payload: bytes,
    *,
    ts: dt.datetime | None = None,
    refers_to: str | None = None,
    content_type: str = "application/json",
) -> bytes:
    """One WAT-style ``metadata`` record (the layout of Common Crawl's
    ``*.warc.wat.gz`` sidecar files): a JSON payload describing the
    response record the metadata was computed from."""
    ts = ts or dt.datetime(2025, 1, 1)
    date = _warc_date(ts)
    digest = hashlib.sha1(payload).hexdigest()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: metadata",
        b"WARC-Record-ID: "
        + _record_id("metadata:" + url, date).encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Target-URI: " + url.encode("ascii"),
    ]
    if refers_to:
        headers.append(b"WARC-Refers-To: " + refers_to.encode("ascii"))
    headers += [
        b"WARC-Payload-Digest: sha1:" + digest.encode("ascii"),
        b"Content-Type: " + content_type.encode("ascii"),
        b"Content-Length: " + str(len(payload)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def render_warcinfo(filename: str) -> bytes:
    """The file-leading warcinfo record (software/format description)."""
    info = b"software: scrupyst-ray/0.2\r\nformat: WARC File Format 1.0\r\n"
    date = _warc_date(dt.datetime(2025, 1, 1))
    headers = [
        _WARC_VERSION,
        b"WARC-Type: warcinfo",
        b"WARC-Record-ID: "
        + _record_id("warcinfo:" + filename, date).encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Filename: " + filename.encode("ascii"),
        b"Content-Type: application/warc-fields",
        b"Content-Length: " + str(len(info)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + info + _CRLF + _CRLF


def _gzip_member(record: bytes) -> bytes:
    return gzip.compress(record, mtime=0)


def _gzip_members(data: bytes):
    """(offset, length) spans of each gzip member in a multi-member file."""
    spans, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        spans.append((pos, consumed))
        pos += consumed
    return spans


def parse_warc_bytes(
    data: bytes,
    record_types: tuple = ("response",),
    with_offsets: bool = False,
):
    """Parse one WARC file's bytes (plain or multi-member gzip) into dict
    rows matching :data:`READ_SCHEMA`.  Tolerant of warcinfo / request /
    metadata records (skipped unless listed in *record_types*).

    With ``with_offsets=True`` each row also carries ``(offset, length)`` —
    the byte span in the ORIGINAL file that re-parses standalone (the gzip
    member for ``.warc.gz``, the record span for plain ``.warc``): exactly
    what a CDX index stores so :func:`fetch_record` can random-access one
    capture out of a 100 TB archive."""
    if data[:2] == b"\x1f\x8b":
        rows = []
        for off, ln in _gzip_members(data):
            member = zlib.decompressobj(31).decompress(
                data[off : off + ln]
            )
            for r, _s, _e in _parse_records(member, record_types):
                if with_offsets:
                    r["offset"], r["length"] = off, ln
                rows.append(r)
        return rows
    rows = []
    for r, s, e in _parse_records(data, record_types):
        if with_offsets:
            r["offset"], r["length"] = s, e - s
        rows.append(r)
    return rows


def _parse_records(data: bytes, record_types: tuple):
    """Yield (row, start, end) for records in UNCOMPRESSED WARC bytes."""
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        rec_start = pos
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        hdr: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
        clen = int(hdr["content-length"])
        body_start = head_end + 4
        block = data[body_start : body_start + clen]
        pos = body_start + clen
        wtype = hdr.get("warc-type", "")
        if wtype not in record_types:
            continue
        # non-http records (conversion/warcinfo/metadata) carry the WARC
        # block Content-Type (e.g. ``text/plain`` for WET conversion rows)
        status, ctype, body = 0, hdr.get("content-type", ""), block
        if hdr.get("content-type", "").startswith("application/http"):
            split = block.find(_CRLF + _CRLF)
            http_head = block[:split].decode("ascii", "replace")
            body = block[split + 4 :]
            hlines = http_head.split("\r\n")
            status = int(hlines[0].split(" ", 2)[1])
            for line in hlines[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
        rows.append(
            (
                {
                    "url": hdr.get("warc-target-uri", ""),
                    "warc_ts": _parse_warc_date(hdr["warc-date"]),
                    "warc_type": wtype,
                    "record_id": hdr.get("warc-record-id", ""),
                    "http_status": status,
                    "content_type": ctype,
                    "body": body,
                    "n_bytes": len(body),
                },
                rec_start,
                pos,
            )
        )
    return rows


def fetch_record(path: str, offset: int, length: int):
    """Random-access read of ONE capture: seek to the CDX-recorded byte
    span, read *length* bytes, parse the single member/record — the 100 TB
    archive access path (no full-file scan)."""
    with open(path, "rb") as f:
        f.seek(offset)
        chunk = f.read(length)
    rows = parse_warc_bytes(
        chunk, record_types=("response", "request", "metadata", "warcinfo")
    )
    if len(rows) != 1:
        raise ValueError(f"span did not contain exactly one record: {len(rows)}")
    return rows[0]


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in READ_SCHEMA.names}
    return pa.table(cols, schema=READ_SCHEMA)


def _write_shards(ds, out_dir: str, ext: str, url_col: str, render_rows):
    """Shared archive-sink machinery (WARC/WET/WAT): render each input
    block to one ``part-*{ext}`` shard file INSIDE the task (atomic tmp +
    rename), return a tiny manifest table to the driver.  File names derive
    from each block's first url + row count, so a re-run overwrites the
    same shards byte-identically (resumable output).  ``render_rows(batch)``
    returns one rendered record per row."""
    os.makedirs(out_dir, exist_ok=True)
    gz = ext.endswith(".gz")

    def write_block(b: pa.Table) -> pa.Table:
        urls = b[url_col].to_pylist()
        name = (
            "part-"
            + hashlib.md5(
                f"{urls[0]}\n{len(urls)}".encode("utf-8")
            ).hexdigest()[:12]
            + f"-{len(urls)}{ext}"
        )
        path = os.path.join(out_dir, name)
        parts = [render_warcinfo(name)] + render_rows(b)
        if gz:
            blob = b"".join(_gzip_member(p) for p in parts)
        else:
            blob = b"".join(parts)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "records": pa.array([len(urls)], pa.int64()),
                "bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    from scrupyst_ray.pipelines.joins import collect_table

    return collect_table(ds.map_batches(write_block, batch_format="pyarrow"))


def write_warc(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    gzip_members: bool = True,
    status_col: str | None = None,
    ts_col: str | None = None,
    url_col: str = "url",
    body_col: str = "body",
) -> pa.Table:
    """Render *ds* to ``part-*.warc[.gz]`` response-record shard files
    under *out_dir* and return the manifest table (see
    :func:`_write_shards` for the scale/resume contract)."""

    def render_rows(b: pa.Table) -> list[bytes]:
        urls = b[url_col].to_pylist()
        bodies = b[body_col].to_pylist()
        statuses = (
            b[status_col].to_pylist() if status_col else [200] * len(urls)
        )
        tss = b[ts_col].to_pylist() if ts_col else [None] * len(urls)
        return [
            render_record(
                u,
                body if isinstance(body, bytes) else str(body).encode(),
                status=int(st),
                ts=ts,
            )
            for u, body, st, ts in zip(urls, bodies, statuses, tss)
        ]

    ext = ".warc.gz" if gzip_members else ".warc"
    return _write_shards(ds, out_dir, ext, url_col, render_rows)


def write_wet(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    gzip_members: bool = True,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
) -> pa.Table:
    """Render *ds* to ``part-*.warc.wet[.gz]`` extracted-text shard files
    (Common Crawl WET layout: a warcinfo record then one ``conversion``
    record per page) and return the manifest table (scale/resume contract:
    :func:`_write_shards`)."""

    def render_rows(b: pa.Table) -> list[bytes]:
        urls = b[url_col].to_pylist()
        texts = b[text_col].to_pylist()
        tss = b[ts_col].to_pylist() if ts_col else [None] * len(urls)
        return [
            render_conversion(
                u,
                text if isinstance(text, bytes) else str(text).encode("utf-8"),
                ts=ts,
            )
            for u, text, ts in zip(urls, texts, tss)
        ]

    ext = ".warc.wet.gz" if gzip_members else ".warc.wet"
    return _write_shards(ds, out_dir, ext, url_col, render_rows)


def write_wat(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    gzip_members: bool = True,
    url_col: str = "url",
    json_col: str = "wat_json",
    ts_col: str | None = None,
) -> pa.Table:
    """Render *ds* to ``part-*.warc.wat[.gz]`` metadata shard files (Common
    Crawl WAT layout: one JSON ``metadata`` record per page — here the
    extracted link graph and response envelope) and return the manifest
    table (scale/resume contract: :func:`_write_shards`)."""

    def render_rows(b: pa.Table) -> list[bytes]:
        urls = b[url_col].to_pylist()
        payloads = b[json_col].to_pylist()
        tss = b[ts_col].to_pylist() if ts_col else [None] * len(urls)
        return [
            render_metadata(
                u,
                p if isinstance(p, bytes) else str(p).encode("utf-8"),
                ts=ts,
            )
            for u, p, ts in zip(urls, payloads, tss)
        ]

    ext = ".warc.wat.gz" if gzip_members else ".warc.wat"
    return _write_shards(ds, out_dir, ext, url_col, render_rows)


def read_warc(
    path: str,
    record_types: tuple = ("response",),
    with_offsets: bool = False,
) -> ray.data.Dataset:
    """Directory (or single file) of ``.warc``/``.warc.gz`` shards →
    Dataset of :data:`READ_SCHEMA` rows; each file parses inside one task.
    ``with_offsets=True`` appends ``(warc_file, offset, length)`` columns —
    the :func:`fetch_record` coordinates a CDX index persists."""

    if with_offsets:
        # read_binary_files force-gunzips on the ``.gz`` extension
        # (FileBasedDatasource detects compression from the path with no
        # opt-out), which would make the offsets address the DECOMPRESSED
        # stream.  CDX offsets must address the stored file, so distribute
        # over the file LIST (tiny metadata) and read raw bytes in-task.
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(
                    (
                        ".warc",
                        ".warc.gz",
                        ".warc.wet",
                        ".warc.wet.gz",
                        ".warc.wat",
                        ".warc.wat.gz",
                    )
                )
            )
        else:
            paths = [path]

        def parse_raw(b: pa.Table) -> pa.Table:
            rows: list[dict] = []
            for p in b["path"].to_pylist():
                with open(p, "rb") as f:
                    data = f.read()
                got = parse_warc_bytes(data, record_types, True)
                for r in got:
                    r["warc_file"] = p
                rows.extend(got)
            t = _rows_to_table(rows)
            for name, typ in (
                ("warc_file", pa.string()),
                ("offset", pa.int64()),
                ("length", pa.int64()),
            ):
                t = t.append_column(
                    name, pa.array([r[name] for r in rows], typ)
                )
            return t

        files = ray.data.from_arrow(
            pa.table({"path": pa.array(paths, pa.string())})
        )
        return files.map_batches(
            parse_raw, batch_format="pyarrow", batch_size=1
        )

    def parse(b: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for data in b["bytes"].to_pylist():
            rows.extend(parse_warc_bytes(data, record_types))
        return _rows_to_table(rows)

    files = ray.data.read_binary_files(
        path, file_extensions=["warc", "gz", "wet", "wat"]
    )
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
