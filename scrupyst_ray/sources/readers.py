"""Seed-list readers (S2/S3) — scheme/format dispatch for crawl inputs.

The reference keeps a per-scheme download-handler registry
(``scrapy/core/downloader/handlers/__init__.py:32-110``); in the corpus
model only the SEED list needs format dispatch: parquet / csv / jsonl /
plain-text url-per-line, each mapped to the matching reader.  Seeds get a
FIFO ``seq`` (start-request order, FIXTURES.md §2).

Seq assignment must be FILE order.  Ray Data's streaming executor does not
preserve block order by default, so a source without a ``seq`` column is
read driver-side (seed lists are small relative to the corpus — the 10^10
scale lives in the frontier/pages, never the seed file) and the order is
pinned before handing the table to Ray.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _read_table(path: str) -> pa.Table:
    """Driver-side read of one seed source in deterministic file order."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet" or os.path.isdir(path):
        if os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, "*.parquet")))
            tables = [pq.read_table(f) for f in files]
            return pa.concat_tables(tables) if tables else pa.table({"url": pa.array([], pa.string())})
        return pq.read_table(path)
    if ext == ".csv":
        import pyarrow.csv as pacsv

        return pacsv.read_csv(path)
    if ext in (".jsonl", ".json"):
        rows = [json.loads(line) for line in open(path, encoding="utf-8") if line.strip()]
        return pa.Table.from_pylist(rows) if rows else pa.table({"url": pa.array([], pa.string())})
    if ext in (".txt", ".urls"):
        urls = []
        for line in open(path, encoding="utf-8"):
            line = line.strip()
            if line and not line.startswith("#"):
                urls.append(line)
        return pa.table({"url": pa.array(urls, pa.string())})
    raise ValueError(f"unsupported seed format: {path}")


def read_seeds(path: str):
    """→ Dataset with schema (url: string, seq: int64), seq = file order."""
    t = _read_table(path)
    if "url" not in t.column_names:
        raise ValueError(f"seed source must have a 'url' column, got {t.column_names}")
    if "seq" not in t.column_names:
        t = t.append_column("seq", pa.array(range(t.num_rows), pa.int64()))
    return ray.data.from_arrow(t.select(["url", "seq"]))
