"""Curation reporting — the funnel a training-data run actually reads.

``curation_funnel`` composes the individually-tested gates (min-token
length, Gopher repetition thresholds, C4-style char-quality, exact-dup
collapse) into one cumulative survivor count per stage — the acceptance
report a 100 TB curation job prints at the end.

Scale shape: ONE streaming pass over the corpus emits per-batch partial
rows — 4 stage-count rows per batch plus one 32-byte digest row per final-
stage survivor (text never leaves the task) — then a stage-keyed sum and a
digest-keyed distinct count; the driver assembles five rows.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from scrupyst_ray.functions.textstats import ws_tokens
from scrupyst_ray.pipelines.textstats import _repetition_row

STAGES = (
    "0_total",
    "1_min_tokens",
    "2_gopher_repetition",
    "3_quality",
    "4_distinct_text",
)


def curation_funnel(
    sf_dir: str,
    min_tokens: int = 15,
    max_dup_2gram: float = 0.15,
    max_top_2gram: float = 0.10,
    min_chars: int = 100,
    min_alpha: float = 0.5,
):
    """(stage, n_docs) — cumulative survivors through the curation gates;
    stage 4 is COUNT(DISTINCT md5(text)) over stage-3 survivors (what exact
    dedup would keep)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )

    def partials(b: pa.Table) -> pa.Table:
        n0 = b.num_rows
        n1 = n2 = n3 = 0
        digests: list[str] = []
        alpha = pc.count_substring_regex(b["text"], pattern="[A-Za-z]")
        total = pc.utf8_length(b["text"])
        for t, nch, a, tot in zip(
            b["text"].to_pylist(),
            b["n_chars"].to_pylist(),
            alpha.to_pylist(),
            total.to_pylist(),
        ):
            toks = ws_tokens(t)
            if len(toks) < min_tokens:
                continue
            n1 += 1
            d2, t2 = _repetition_row(toks, 2)
            if d2 > max_dup_2gram or t2 > max_top_2gram:
                continue
            n2 += 1
            if nch < min_chars or tot == 0 or a / tot <= min_alpha:
                continue
            n3 += 1
            digests.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        stages = list(STAGES[:4]) + [""] * len(digests)
        ns = [n0, n1, n2, n3] + [0] * len(digests)
        return pa.table(
            {
                "stage": pa.array(stages, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "digest": pa.array([""] * 4 + digests, pa.string()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").materialize()
    counts = {
        r["stage"]: r["sum(n)"]
        for r in parts.filter(expr="stage != ''")
        .groupby("stage")
        .aggregate(Sum("n"))
        .take_all()
    }
    n_distinct = (
        parts.filter(expr="digest != ''").groupby("digest").count()
    ).count()
    rows = [counts.get(s, 0) for s in STAGES[:4]] + [n_distinct]
    return pa.table(
        {
            "stage": pa.array(list(STAGES), pa.string()),
            "n_docs": pa.array(rows, pa.int64()),
        }
    )


def host_page_stats(sf_dir: str):
    """(host, n_pages, html_bytes, first_ts, last_ts) over the synthetic
    page corpus — the per-host coverage report a crawl operator reads after
    a run.  Partial-aggregated per batch (one row per host per batch), so
    the shuffle moves host cardinality, not page cardinality."""
    from scrupyst_ray.pipelines.webops import _pages

    ds = _pages(["url", "warc_ts", "html"])

    def partial(b: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            b["url"], pattern=r"^https?://([^/]+)/.*$", replacement=r"\1"
        )
        t = pa.table(
            {
                "host": host,
                "n_pages": pa.array([1] * b.num_rows, pa.int64()),
                "html_bytes": pc.cast(
                    pc.binary_length(b["html"]), pa.int64()
                ),
                "first_ts": b["warc_ts"],
                "last_ts": b["warc_ts"],
            }
        )
        return (
            t.group_by("host")
            .aggregate(
                [
                    ("n_pages", "sum"),
                    ("html_bytes", "sum"),
                    ("first_ts", "min"),
                    ("last_ts", "max"),
                ]
            )
            .rename_columns(
                ["host", "n_pages", "html_bytes", "first_ts", "last_ts"]
            )
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .map_groups(
            lambda g: pa.table(
                {
                    "host": [g["host"][0].as_py()],
                    "n_pages": [pc.sum(g["n_pages"]).as_py()],
                    "html_bytes": [pc.sum(g["html_bytes"]).as_py()],
                    "first_ts": [pc.min(g["first_ts"]).as_py()],
                    "last_ts": [pc.max(g["last_ts"]).as_py()],
                }
            ),
            batch_format="pyarrow",
        )
    )
    return merged.sort("host")
