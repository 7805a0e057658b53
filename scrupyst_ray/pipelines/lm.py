"""Bigram-LM perplexity scoring — the CCNet-style corpus quality signal.

A large-scale training-data pipeline buckets documents by language-model
perplexity (CCNet trains a KenLM per language and splits the corpus into
head/middle/tail).  No model binaries exist in this sandbox, so the LM is
trained FROM the corpus itself, distributed, in the same job:

1. count bigrams and unigrams across the corpus (per-batch ``Counter``
   partials — one row per distinct term per batch — combined by a
   key-partitioned ``groupby().sum()``, the combiner pattern);
2. attach the corpus counts back onto each document's bigram rows with the
   size-selected :func:`~scrupyst_ray.pipelines.joins.attach_by_key` (a
   small vocab broadcasts once via ``ray.put``; a web-scale vocab takes the
   distributed hash join — nothing driver-side ever holds the counts);
3. per-document add-one (Laplace) cross-entropy, reduced by a doc_id-keyed
   groupby: ``ppl = exp(-1/n · Σ ln P(w2|w1))`` with
   ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)``.

Tokens are ``\\S+`` runs via the RE2-exact shared tokenizer
(:func:`~scrupyst_ray.functions.textstats.ws_tokens` — Python's unicode
``\\S`` diverges from the DuckDB oracle's RE2 on \\xa0/\\x85/\\v); a
bigram is the two tokens space-joined (unambiguous — tokens contain no
ASCII whitespace).  Documents with fewer than two tokens have no bigrams
and are absent from the output (inner-join semantics, mirrored by the
SQL oracle).

Scale shape: the exploded bigram-row table is the corpus token stream
(~1 row per token) — it is produced, joined, and reduced entirely inside
map_batches/groupby stages; the only driver-side values are V (one int)
and the final per-doc/per-source results.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Mean, Sum

from scrupyst_ray.functions.textstats import ws_tokens
from scrupyst_ray.pipelines.joins import attach_by_key, rename
from scrupyst_ray.pipelines.textstats import _docs


def _bigram_rows(b: pa.Table) -> pa.Table:
    """(doc_id, bg, w1, n) — per-document bigram counts (batch combiner)."""
    ids, bgs, w1s, ns = [], [], [], []
    for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
        toks = ws_tokens(t)
        c = Counter(zip(toks, toks[1:]))
        for (a, bb), n in c.items():
            ids.append(d)
            bgs.append(a + " " + bb)
            w1s.append(a)
            ns.append(n)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "bg": pa.array(bgs, pa.string()),
            "w1": pa.array(w1s, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def _unigram_rows(b: pa.Table) -> pa.Table:
    c: Counter = Counter()
    for t in b["text"].to_pylist():
        c.update(ws_tokens(t))
    return pa.table(
        {
            "w": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def doc_ppl(sf_dir: str):
    """Dataset (doc_id, n_bigrams, ppl_f: float64) — add-one bigram-LM
    perplexity per document, trained on the corpus itself."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    rows = docs.map_batches(_bigram_rows, batch_format="pyarrow").materialize()

    # corpus LM: bigram counts from the exploded rows, unigram counts from
    # a second pass (cheap — Counter partials over the text column)
    c2 = rename(
        rows.select_columns(["bg", "n"]).groupby("bg").sum("n"), ["bg", "c2"]
    ).materialize()
    uni = (
        docs.map_batches(_unigram_rows, batch_format="pyarrow")
        .groupby("w")
        .sum("n")
    )
    c1 = rename(uni, ["w", "c1"]).materialize()
    vocab = c1.count()  # V — the Laplace denominator offset

    scored = attach_by_key(rows, c2, "bg", "c2")
    scored = attach_by_key(scored, c1, "w1", "c1")

    def contrib(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cc2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        cc1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = n * np.log((cc2 + 1.0) / (cc1 + float(vocab)))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n": b["n"],
                "lp": pa.array(lp, pa.float64()),
            }
        )

    per_doc = (
        scored.map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n"), Sum("lp"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = b["sum(lp)"].to_numpy(zero_copy_only=False)
        ppl = np.exp(-lp / n)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": pc.cast(b["sum(n)"], pa.int64()),
                "ppl_f": pa.array(ppl, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def bigram_lm_ppl(sf_dir: str):
    """(doc_id, n_bigrams, ppl) — per-document perplexity, ``%.4f`` strings
    for hash-stable oracle comparison, sorted by doc_id."""

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": b["n_bigrams"],
                "ppl": pa.array(
                    [f"{v:.4f}" for v in b["ppl_f"].to_pylist()], pa.string()
                ),
            }
        )

    return doc_ppl(sf_dir).map_batches(fmt, batch_format="pyarrow").sort("doc_id")


def lm_ppl_by_source(sf_dir: str):
    """(source, n_docs, avg_ppl) — mean per-document perplexity per corpus
    source (the head/middle/tail split signal, aggregated)."""
    src = _docs(sf_dir, ["doc_id", "source"])
    per_doc = attach_by_key(doc_ppl(sf_dir), src, "doc_id", "source")
    agg = per_doc.groupby("source").aggregate(Count(), Mean("ppl_f"))

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": pc.cast(b["count()"], pa.int64()),
                "avg_ppl": pa.array(
                    [f"{v:.4f}" for v in b["mean(ppl_f)"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return agg.map_batches(fmt, batch_format="pyarrow").sort("source")
