"""Text-analysis pipelines over the ``documents`` table (training-data ops):
token counting, quality gating, language ID, document fingerprinting.

DuckDB-matchable ones (token counts, md5 digests, quality filter) use ONLY
operations both sides can express identically; the heuristic ones (lang-id,
rolling-hash fingerprints, quality scores) are rows-only checks.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from scrupyst_ray.functions.textstats import (
    bpe_token_count,
    detect_language,
    doc_fingerprint,
    quality_score,
)


def _docs(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) — whitespace tokens via a pure Arrow regex kernel
    (zero-copy; no Python loop)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], pattern=r"\S+")
        return pa.table(
            {"doc_id": b["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow").sort("doc_id")


def token_stats_by_lang(sf_dir: str):
    """Per-language doc/token totals (partial counts combine inside the
    groupby)."""
    ds = _docs(sf_dir, ["lang", "text"])

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], pattern=r"\S+")
        return pa.table({"lang": b["lang"], "n_tokens": pc.cast(n, pa.int64())})

    out = (
        ds.map_batches(count, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(), Sum("n_tokens"))
    )
    return out.map_batches(
        lambda b: b.rename_columns(["lang", "n_docs", "sum_tokens"]),
        batch_format="pyarrow",
    ).sort("lang")


def doc_digests(sf_dir: str):
    """(doc_id, digest) — md5 hex content fingerprint (exact-dedup key that
    DuckDB can reproduce bit-for-bit)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def digest(b: pa.Table) -> pa.Table:
        d = [hashlib.md5(t.encode()).hexdigest() for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "digest": pa.array(d, pa.string())})

    return ds.map_batches(digest, batch_format="pyarrow").sort("doc_id")


def quality_filter_by_source(sf_dir: str, min_chars: int = 100, min_alpha: float = 0.5):
    """C4-style cheap quality gate, aggregated per source.  The predicate is
    deliberately SQL-expressible: n_chars ≥ min_chars AND ascii-alpha ratio >
    min_alpha."""
    ds = _docs(sf_dir, ["source", "text", "n_chars"])

    def gate(b: pa.Table) -> pa.Table:
        alpha = pc.cast(
            pc.count_substring_regex(b["text"], pattern="[A-Za-z]"), pa.float64()
        )
        total = pc.cast(pc.utf8_length(b["text"]), pa.float64())
        ratio = pc.divide(alpha, total)
        keep = pc.and_(
            pc.greater_equal(b["n_chars"], pa.scalar(min_chars)),
            pc.greater(ratio, pa.scalar(min_alpha)),
        )
        return b.filter(keep).select(["source"])

    out = ds.map_batches(gate, batch_format="pyarrow").groupby("source").aggregate(Count())
    return out.map_batches(
        lambda b: b.rename_columns(["source", "n_kept"]), batch_format="pyarrow"
    ).sort("source")


def doc_quality_metrics(sf_dir: str):
    """(doc_id, n_tokens, mean_token_len, alpha_ratio, punct_ratio,
    stopword_ratio) — the C4/Gopher-style cheap quality features, each
    defined in terms BOTH sides can express identically (DuckDB oracle in
    ``__ray_entry__.oracle_sql``): tokens are ``\\S+`` matches, character
    classes are explicit ASCII/Latin ranges, ratios are int/int divisions
    formatted ``%.4f``."""
    import re

    from scrupyst_ray.functions.textstats import _EN_STOPWORDS

    ds = _docs(sf_dir, ["doc_id", "text"])
    token_re = re.compile(r"\S+")

    def metrics(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        n_tok = pc.count_substring_regex(b["text"], pattern=r"\S+")
        nonws = pc.utf8_length(
            pc.replace_substring_regex(b["text"], pattern=r"\s", replacement="")
        )
        alpha = pc.count_substring_regex(b["text"], pattern=r"[A-Za-zÀ-ɏ]")
        punct = pc.count_substring_regex(b["text"], pattern=r"[!-/:-@\[-`{-~]")
        n_chars = pc.utf8_length(b["text"])
        # stopword hits need exact token-set membership (no Arrow kernel);
        # compiled regex + frozenset per row, inside the batch
        sw_hits = [
            sum(1 for t in token_re.findall(txt.lower()) if t in _EN_STOPWORDS)
            for txt in texts
        ]
        nt = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
        nw = nonws.to_numpy(zero_copy_only=False).astype(np.int64)
        al = alpha.to_numpy(zero_copy_only=False).astype(np.int64)
        pu = punct.to_numpy(zero_copy_only=False).astype(np.int64)
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.int64)

        def ratio(num, den, digits=4):
            return [
                (None if d == 0 else f"{n / d:.{digits}f}")
                for n, d in zip(num, den)
            ]

        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(nt, pa.int64()),
                "mean_token_len": pa.array(ratio(nw, nt), pa.string()),
                "alpha_ratio": pa.array(ratio(al, nc), pa.string()),
                "punct_ratio": pa.array(ratio(pu, nc), pa.string()),
                "stopword_ratio": pa.array(
                    ratio(np.asarray(sw_hits, np.int64), nt), pa.string()
                ),
            }
        )

    return ds.map_batches(metrics, batch_format="pyarrow").sort("doc_id")


def doc_analysis(sf_dir: str):
    """Rows-only per-doc analysis: BPE-ish token count, quality score,
    language-ID prediction, rolling-hash fingerprint — the heuristic kernels
    a data-curation pipeline runs per document."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def analyze(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "bpe_tokens": pa.array(
                    [bpe_token_count(t) for t in texts], pa.int64()
                ),
                "quality": pa.array([quality_score(t) for t in texts], pa.float64()),
                "lang_pred": pa.array([detect_language(t) for t in texts], pa.string()),
                "fingerprint": pa.array(
                    np.array([doc_fingerprint(t) for t in texts], np.uint64),
                    pa.uint64(),
                ),
            }
        )

    return ds.map_batches(analyze, batch_format="pyarrow").sort("doc_id")
