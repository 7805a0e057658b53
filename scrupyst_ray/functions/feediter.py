"""Feed-record iterators — columnar form of the reference's XML/CSV feed
spiders (M16, SURVEY.md §2.2).

Reference behavior being reproduced (``scrapy/utils/iterators.py:23-230``,
``scrapy/spiders/feed.py:23-161``):

- ``xmliter_lxml(response, nodename)`` — stream the document and yield one
  selector per ``<nodename>`` element (matched by LOCAL tag name at any
  depth, like the reference's default no-namespace iteration).
- ``csviter(response, delimiter, headers, quotechar)`` — parse CSV and yield
  one dict per row keyed by the header row (or the caller-given headers).

Here each becomes a pure function ``bytes -> pyarrow.Table`` that a
``map_batches`` stage applies per document, exploding feed documents into
record rows (see ``pipelines/webops.py``).  Encoding: feeds are decoded with
the same detection chain as pages (``functions/textextract``) unless the
caller passes an explicit encoding — mirroring TextResponse semantics.
"""

from __future__ import annotations

import csv
import io
import xml.etree.ElementTree as ET

import pyarrow as pa

from scrupyst_ray.functions.textextract import detect_and_decode

XML_NODES_SCHEMA = pa.schema(
    [
        ("node_idx", pa.int32()),
        ("node_xml", pa.string()),
        ("node_text", pa.string()),
    ]
)


def _local_name(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if tag.startswith("{") else tag


def xmliter(body: bytes | str, nodename: str) -> pa.Table:
    """All ``<nodename>`` elements of one XML document, document order.

    Returns (node_idx, node_xml — the serialized subtree, node_text — the
    concatenated text content).  Tag match is on the local name so the same
    call works for namespaced feeds (RSS/Atom/sitemap-like), matching the
    reference iterator's common usage.
    """
    if isinstance(body, str):
        body = body.encode("utf-8")
    idxs: list[int] = []
    xmls: list[str] = []
    texts: list[str] = []
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return pa.table({"node_idx": [], "node_xml": [], "node_text": []},
                        schema=XML_NODES_SCHEMA)
    i = 0
    nodes = [root] if _local_name(root.tag) == nodename else []
    nodes += [el for el in root.iter() if el is not root and _local_name(el.tag) == nodename]
    for el in nodes:
        idxs.append(i)
        xmls.append(ET.tostring(el, encoding="unicode"))
        texts.append("".join(el.itertext()))
        i += 1
    return pa.table(
        {
            "node_idx": pa.array(idxs, pa.int32()),
            "node_xml": pa.array(xmls, pa.string()),
            "node_text": pa.array(texts, pa.string()),
        },
        schema=XML_NODES_SCHEMA,
    )


def csviter(
    body: bytes | str,
    delimiter: str = ",",
    headers: list[str] | None = None,
    quotechar: str = '"',
    encoding: str | None = None,
) -> pa.Table:
    """CSV document → one row per record, columns from the header row (or
    *headers*).  Mirrors the reference ``csviter``: the first row is the
    header unless explicit headers are given; short rows pad with empty
    strings, long rows drop extras (dict(zip(...)) semantics)."""
    if isinstance(body, bytes):
        text = body.decode(encoding) if encoding else detect_and_decode(body)[1]
    else:
        text = body
    reader = csv.reader(io.StringIO(text), delimiter=delimiter, quotechar=quotechar)
    rows = [r for r in reader if r]
    if not rows:
        return pa.table({})
    if headers is None:
        headers, rows = rows[0], rows[1:]
    cols: dict[str, list[str]] = {h: [] for h in headers}
    for r in rows:
        for j, h in enumerate(headers):
            cols[h].append(r[j] if j < len(r) else "")
    return pa.table({h: pa.array(v, pa.string()) for h, v in cols.items()})


def xmliter_batch(
    batch: pa.Table, nodename: str, body_col: str = "html", url_col: str = "url"
) -> pa.Table:
    """Explode a batch of XML documents into per-node rows
    ``(src, node_idx, node_xml, node_text)``."""
    srcs: list[str] = []
    parts: list[pa.Table] = []
    for url, body in zip(batch[url_col].to_pylist(), batch[body_col].to_pylist()):
        t = xmliter(body or b"", nodename)
        srcs.extend([url] * t.num_rows)
        if t.num_rows:
            parts.append(t)
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"node_idx": [], "node_xml": [], "node_text": []},
                      schema=XML_NODES_SCHEMA)
    )
    return merged.add_column(0, "src", pa.array(srcs, pa.string()))
