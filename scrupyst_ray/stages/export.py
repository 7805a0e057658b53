"""Feed export (S4) + item exporters (S5) — reference
``scrapy/extensions/feedexport.py:437-739`` / ``scrapy/exporters.py:39-375``.

Ray-Data-native mapping: a feed = (filter, field projection, format writer).
Batch rotation (`FEED_EXPORT_BATCH_ITEM_COUNT`) maps to Ray block files via
``min_rows_per_file``/``max_rows_per_file``; per-feed item filters are
``ds.filter``; ``fields_to_export`` selection/renaming is ``select_columns``
+ rename.  Formats: parquet, jsonl, json-array, csv, xml (small writer for
parity with the reference's nested XML exporter, ``exporters.py:203-221``),
pickle / marshal / pprint (stream-of-records single-file exporters,
``exporters.py:283-375``: one ``pickle.dump``/``marshal.dump``/pformat
block per item appended to the stream).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import marshal
import os
import pickle
from collections.abc import Callable
from pprint import pformat
from xml.sax.saxutils import escape

import pyarrow as pa

FORMATS = ("parquet", "jsonl", "csv", "json", "xml", "pickle", "marshal", "pprint")


def export_dataset(
    ds,
    path: str,
    fmt: str = "parquet",
    fields: list[str] | dict[str, str] | None = None,
    item_filter: str | Callable | None = None,
    batch_item_count: int | None = None,
):
    """Export *ds* to *path* in *fmt*.

    - ``fields``: list (projection) or dict old→new (projection + rename)
      — reference ``fields_to_export`` (``exporters.py:74-110``).
    - ``item_filter``: expr string or row predicate — reference per-feed
      ``ItemFilter`` (``feedexport.py:57-90``).
    - ``batch_item_count``: rows per output file — reference
      ``FEED_EXPORT_BATCH_ITEM_COUNT`` (``feedexport.py:588-652``).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown export format {fmt!r}; use one of {FORMATS}")
    if item_filter is not None:
        ds = ds.filter(expr=item_filter) if isinstance(item_filter, str) else ds.filter(item_filter)
    if fields:
        if isinstance(fields, dict):
            ds = ds.select_columns(list(fields.keys()))
            new_names = list(fields.values())
            ds = ds.map_batches(
                lambda b: b.rename_columns(new_names), batch_format="pyarrow"
            )
        else:
            ds = ds.select_columns(list(fields))
    if fmt in ("jsonl", "json", "csv", "xml", "pprint"):
        # text formats can't carry raw bytes: binary columns export as hex
        # (the reference's exporters see str items; our artifact carries
        # binary fingerprints/order keys)
        ds = ds.map_batches(_binary_to_hex, batch_format="pyarrow")
    os.makedirs(path, exist_ok=True)

    def _rotation_kwargs(writer) -> dict:
        # rows-per-file knobs differ per Ray writer (write_parquet has
        # min+max, write_json/write_csv only min); pass what each accepts
        if not batch_item_count:
            return {}
        import inspect

        params = inspect.signature(writer).parameters
        return {
            k: batch_item_count
            for k in ("min_rows_per_file", "max_rows_per_file")
            if k in params
        }

    if fmt == "parquet":
        ds.write_parquet(path, **_rotation_kwargs(ds.write_parquet))
    elif fmt == "jsonl":
        ds.write_json(path, **_rotation_kwargs(ds.write_json))
    elif fmt == "csv":
        ds.write_csv(path, **_rotation_kwargs(ds.write_csv))
    elif fmt == "json":
        _write_single(ds, os.path.join(path, "items.json"), _json_array_bytes)
    elif fmt == "xml":
        _write_single(ds, os.path.join(path, "items.xml"), _xml_bytes)
    elif fmt == "pickle":
        _write_single(ds, os.path.join(path, "items.pickle"), _pickle_bytes)
    elif fmt == "marshal":
        _write_single(ds, os.path.join(path, "items.marshal"), _marshal_bytes)
    elif fmt == "pprint":
        _write_single(ds, os.path.join(path, "items.pprint"), _pprint_bytes)
    return path


def _binary_to_hex(batch):
    """Binary columns → lowercase hex strings (text-format exports)."""
    import pyarrow as pa

    for i, f in enumerate(batch.schema):
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type) or pa.types.is_fixed_size_binary(f.type):
            vals = batch.column(i).to_pylist()
            hexed = pa.array(
                [v.hex() if v is not None else None for v in vals], pa.string()
            )
            batch = batch.set_column(i, f.name, hexed)
    return batch


def _write_single(ds, file_path: str, render: Callable[[list[dict]], bytes]) -> None:
    """Single-file formats (json array / xml): small-result exporters — the
    reference streams them through one process too; do NOT use for big data
    (use parquet/jsonl, which write per-block)."""
    import ray

    rows: list[dict] = []
    for ref in ds.to_arrow_refs():
        rows.extend(ray.get(ref).to_pylist())
    tmp = file_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(render(rows))
    os.replace(tmp, file_path)


def _json_array_bytes(rows: list[dict]) -> bytes:
    return json.dumps(rows, default=str).encode()


def _pickle_bytes(rows: list[dict]) -> bytes:
    # reference PickleItemExporter (exporters.py:283-296): one
    # pickle.dump(dict, file, protocol=2) per item, appended to the stream
    buf = io.BytesIO()
    for r in rows:
        pickle.dump(r, buf, protocol=2)
    return buf.getvalue()


def _marshal_bytes(rows: list[dict]) -> bytes:
    # reference MarshalItemExporter (exporters.py:299-312); marshal handles
    # only builtin types, so timestamps export as ISO strings
    buf = io.BytesIO()
    for r in rows:
        marshal.dump(
            {
                k: (v.isoformat() if isinstance(v, (_dt.datetime, _dt.date)) else v)
                for k, v in r.items()
            },
            buf,
        )
    return buf.getvalue()


def _pprint_bytes(rows: list[dict]) -> bytes:
    # reference PprintItemExporter (exporters.py:275-280): pformat + newline
    return b"".join(pformat(r).encode() + b"\n" for r in rows)


def _xml_field(name: str, value, parts: list[str]) -> None:
    # nested dict/list → nested elements (reference _export_xml_field,
    # exporters.py:203-221: lists render repeated <value> elements)
    if isinstance(value, dict):
        parts.append(f"<{name}>")
        for k, v in value.items():
            _xml_field(k, v, parts)
        parts.append(f"</{name}>")
    elif isinstance(value, (list, tuple)):
        parts.append(f"<{name}>")
        for v in value:
            _xml_field("value", v, parts)
        parts.append(f"</{name}>")
    else:
        parts.append(f"<{name}>{escape(str(value))}</{name}>")


def _xml_bytes(rows: list[dict]) -> bytes:
    parts = ['<?xml version="1.0" encoding="utf-8"?>\n<items>']
    for row in rows:
        parts.append("<item>")
        for k, v in row.items():
            _xml_field(k, v, parts)
        parts.append("</item>")
    parts.append("</items>")
    return "".join(parts).encode()


def render_csv(
    rows: list[dict],
    fields_to_export: list[str] | None = None,
    include_headers_line: bool = True,
    join_multivalued: str = ",",
    encoding: str = "utf-8",
    errors: str = "strict",
) -> bytes:
    """Reference-conformant CSV item rendering (``exporters.py:231-281``):
    csv-module \\r\\n line endings, header = fields_to_export (else the
    first item's key order), list values joined with *join_multivalued* when
    every element is a string and ``str(list)`` otherwise, all other
    non-strings ``str()``-serialized, configurable encoding with the
    exporter's ``errors`` mode (reference golden: xmlcharrefreplace)."""
    import csv

    if not rows:
        return b""
    fields = fields_to_export or list(rows[0].keys())
    buf = io.StringIO(newline="")
    w = csv.writer(buf, lineterminator="\r\n")
    if include_headers_line:
        w.writerow(fields)

    def ser(v) -> str:
        if v is None:
            # missing/None fields render as empty cells (reference
            # _get_serialized_fields(default_value="", include_empty=True))
            return ""
        if isinstance(v, str):
            return v
        if isinstance(v, (list, tuple)):
            if all(isinstance(x, str) for x in v):
                return join_multivalued.join(v)
            return str(v)
        return str(v)

    for r in rows:
        w.writerow([ser(r.get(f)) for f in fields])
    return buf.getvalue().encode(encoding, errors=errors)


# ---------------------------------------------------------------------------
# resumable partition-per-key parquet sink
# ---------------------------------------------------------------------------


def _partition_dirname(key_col: str, value) -> str:
    """Hive-style ``<col>=<value>`` directory name with percent-encoding so
    hostile key values (slashes, spaces, '') stay one path segment."""
    from urllib.parse import quote

    return f"{key_col}={quote(str(value), safe='')}"


def write_partitioned(ds, out_dir: str, key_col: str):
    """Resumable partitioned Parquet sink: one ``<key_col>=<value>/``
    directory per key, each committed ATOMICALLY (``part.parquet`` written
    to a temp name, renamed, then a ``_COMPLETE`` marker) — a killed run
    re-executed over the same input skips every completed partition, so
    only unfinished keys are recomputed and rewritten (the brief's
    "resumable output, never one giant file" contract, mirroring the crawl
    store's ``_STORE_COMPLETE`` discipline in ``stages/fetch.py``).

    Scale shape: completed keys are discovered with ONE listdir (bounded by
    partition count, not rows) and pruned BEFORE the shuffle, so a resume
    never re-shuffles finished data; the write itself is a key-partitioned
    groupby — each partition's rows land on one writer task.  Rows are
    sorted by the table's first column inside each partition so re-written
    output is byte-deterministic regardless of block arrival order.

    Returns the manifest as a list of ``(key, n_rows, path)`` for newly
    written partitions (skipped ones are absent).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    done_values: list[str] = []
    prefix = f"{key_col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
            os.path.join(out_dir, name, "_COMPLETE")
        ):
            from urllib.parse import unquote

            done_values.append(unquote(name[len(prefix):]))
    if done_values:
        done_arr = pa.array(done_values, pa.string())
        ds = ds.map_batches(
            lambda b: b.filter(
                pc.invert(
                    pc.is_in(
                        pc.cast(b[key_col], pa.string()), value_set=done_arr
                    )
                )
            ),
            batch_format="pyarrow",
        )

    def write_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "path": pa.array([], pa.string()),
                }
            )
        # dirname derives from the ARROW string cast — the same
        # representation the resume prune compares with (ADVICE r2: Python
        # str() disagrees with Arrow cast for bool 'True'/'true' and float
        # formatting, which silently defeated pruning for non-string keys)
        value = pc.cast(g[key_col], pa.string())[0].as_py()
        pdir = os.path.join(out_dir, _partition_dirname(key_col, value))
        os.makedirs(pdir, exist_ok=True)
        marker = os.path.join(pdir, "_COMPLETE")
        final = os.path.join(pdir, "part.parquet")
        if not os.path.exists(marker):  # idempotent vs task retry
            g = g.sort_by(g.column_names[0])
            tmp = final + ".tmp"
            pq.write_table(g, tmp)
            os.replace(tmp, final)  # atomic commit, then marker
            with open(marker, "w") as f:
                f.write(str(g.num_rows))
        return pa.table(
            {
                "key": pa.array([str(value)], pa.string()),
                "n_rows": pa.array([g.num_rows], pa.int64()),
                "path": pa.array([final], pa.string()),
            }
        )

    manifest = (
        ds.groupby(key_col)
        .map_groups(write_partition, batch_format="pyarrow")
        .take_all()
    )
    return sorted(
        ((r["key"], r["n_rows"], r["path"]) for r in manifest),
        key=lambda t: t[0],
    )


def read_partitioned(out_dir: str, key_col: str):
    """Read back a `write_partitioned` directory as one Dataset (part files
    carry all columns, *key_col* included); only COMPLETE partitions are
    read — a half-written partition from a killed run is invisible."""
    from urllib.parse import unquote

    import ray.data

    prefix = f"{key_col}="
    parts = sorted(
        name
        for name in os.listdir(out_dir)
        if name.startswith(prefix)
        and os.path.exists(os.path.join(out_dir, name, "_COMPLETE"))
    )
    paths = [os.path.join(out_dir, p, "part.parquet") for p in parts]
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(paths)
