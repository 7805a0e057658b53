"""DSIR importance weights — Data Selection via Importance Resampling
(Xie et al., NeurIPS '23, arXiv:2302.03169).

DSIR scores every raw document by how target-like it is: fit two bag-of-
hashed-n-gram distributions — p̂ over a TARGET corpus and q̂ over the RAW
corpus — and weight each raw document by ``log w(x) = Σ_b c_b(x) ·
(log p̂_b − log q̂_b)`` where ``c_b(x)`` counts the document's unigrams +
bigrams hashed into bucket ``b``.  High-weight documents are the ones to
keep when building pretraining data that matches the target domain.

Instantiation here (everything deterministic and DuckDB-recomputable):

- features = whitespace unigrams AND space-joined bigrams, hashed with
  ``int(md5(gram)[:8], 16) % n_buckets`` — md5 so the SQL oracle can
  reproduce the bucket ids exactly (DuckDB ``md5()`` matches hashlib).
- target = documents with ``lang == target_lang`` ('en' by default);
  raw = every other document.  (The paper's target is a quality domain
  like Wikipedia; the synthetic corpus's stable stand-in is a language.)
- add-one (Laplace) smoothing on both sides:
  ``λ_b = ln((t_b + 1)/(T + B)) − ln((r_b + 1)/(R + B))`` with ``t_b``/
  ``r_b`` the per-bucket gram counts, ``T``/``R`` the side totals and
  ``B = n_buckets`` — same convention as the bigram LM (`lm.py`).

Scale shape (100 TB story): the exploded gram-count rows are the corpus
token stream, produced and reduced entirely inside map_batches/groupby
stages.  The only driver-side table is the per-bucket count table, whose
size is FIXED at ``n_buckets`` rows (10k) regardless of corpus size; the
λ vector ships to workers once via ``ray.put`` (broadcast-small-side).
Nothing per-document ever reaches the driver.
"""

from __future__ import annotations

from collections import Counter
from hashlib import md5

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Mean, Sum

from scrupyst_ray.functions.textstats import ws_tokens
from scrupyst_ray.pipelines.textstats import _docs

N_BUCKETS = 10_000  # the paper's hashed-feature dimensionality


def _bucket(gram: str, n_buckets: int) -> int:
    """md5-based feature hash — first 8 hex chars as int, mod n_buckets.
    DuckDB equivalent: CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % B."""
    return int(md5(gram.encode()).hexdigest()[:8], 16) % n_buckets


def _gram_rows(b: pa.Table, target_lang: str, n_buckets: int) -> pa.Table:
    """(doc_id, bucket, n, n_t, n_r) — per-document hashed-gram counts.
    n_t/n_r split the count by whether the OWNING doc is target/raw, so one
    groupby(bucket) later yields both sides' distributions."""
    ids, buckets, ns, nts, nrs = [], [], [], [], []
    for d, lang, t in zip(
        b["doc_id"].to_pylist(), b["lang"].to_pylist(), b["text"].to_pylist()
    ):
        toks = ws_tokens(t)
        if not toks:
            continue  # featureless doc: absent from output (oracle mirrors)
        c: Counter = Counter(_bucket(w, n_buckets) for w in toks)
        c.update(
            _bucket(a + " " + bb, n_buckets) for a, bb in zip(toks, toks[1:])
        )
        is_t = lang == target_lang
        for bk, n in c.items():
            ids.append(d)
            buckets.append(bk)
            ns.append(n)
            nts.append(n if is_t else 0)
            nrs.append(0 if is_t else n)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(buckets, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "n_t": pa.array(nts, pa.int64()),
            "n_r": pa.array(nrs, pa.int64()),
        }
    )


def _lambda_vector(feats, n_buckets: int) -> np.ndarray:
    """λ_b = ln p̂_b − ln q̂_b as a dense float64[n_buckets] vector.

    The bucket-count table is ≤ n_buckets rows BY CONSTRUCTION (fixed 10k,
    corpus-size-independent), so collecting it driver-side is the legal
    small-side broadcast, not a scale leak."""
    from scrupyst_ray.pipelines.joins import collect_table

    bc = collect_table(
        feats.groupby("bucket").aggregate(Sum("n_t"), Sum("n_r"))
    )
    t = np.zeros(n_buckets, np.float64)
    r = np.zeros(n_buckets, np.float64)
    if bc.num_rows:
        idx = bc["bucket"].to_numpy(zero_copy_only=False)
        t[idx] = bc["sum(n_t)"].to_numpy(zero_copy_only=False)
        r[idx] = bc["sum(n_r)"].to_numpy(zero_copy_only=False)
    tt, rr = t.sum(), r.sum()
    return np.log((t + 1.0) / (tt + n_buckets)) - np.log(
        (r + 1.0) / (rr + n_buckets)
    )


def doc_logweights(
    sf_dir: str, target_lang: str = "en", n_buckets: int = N_BUCKETS
):
    """Dataset (doc_id, n_feats:int64, logw_f:float64) — per-document DSIR
    log importance weight.  n_feats = total gram occurrences (2·len − 1)."""
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    feats = docs.map_batches(
        lambda b: _gram_rows(b, target_lang, n_buckets),
        batch_format="pyarrow",
    ).materialize()
    lam_ref = ray.put(_lambda_vector(feats, n_buckets))

    def contrib(b: pa.Table) -> pa.Table:
        lam = ray.get(lam_ref)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n": b["n"],
                "lp": pa.array(n * lam[bk], pa.float64()),
            }
        )

    per_doc = (
        feats.map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n"), Sum("lp"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_feats": pc.cast(b["sum(n)"], pa.int64()),
                "logw_f": pc.cast(b["sum(lp)"], pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def dsir_logweights(sf_dir: str, target_lang: str = "en"):
    """(doc_id, n_feats, logw) — DSIR log importance weight per document,
    ``%.4f`` strings for hash-stable oracle comparison, sorted by doc_id."""

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_feats": b["n_feats"],
                "logw": pa.array(
                    [f"{v:.4f}" for v in b["logw_f"].to_pylist()], pa.string()
                ),
            }
        )

    return (
        doc_logweights(sf_dir, target_lang)
        .map_batches(fmt, batch_format="pyarrow")
        .sort("doc_id")
    )


def dsir_by_lang(sf_dir: str, target_lang: str = "en"):
    """(lang, n_docs, avg_logw) — mean DSIR weight per language.  The
    target language should dominate: its docs ARE the target distribution."""
    from scrupyst_ray.pipelines.joins import attach_by_key

    langs = _docs(sf_dir, ["doc_id", "lang"])
    per_doc = attach_by_key(
        doc_logweights(sf_dir, target_lang), langs, "doc_id", "lang"
    )
    agg = per_doc.groupby("lang").aggregate(Count(), Mean("logw_f"))

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "n_docs": pc.cast(b["count()"], pa.int64()),
                "avg_logw": pa.array(
                    [f"{v:.4f}" for v in b["mean(logw_f)"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return agg.map_batches(fmt, batch_format="pyarrow").sort("lang")


def dsir_top_docs(sf_dir: str, k: int = 50, target_lang: str = "en"):
    """(doc_id, logw) — the k most target-like documents: DSIR's selection
    step made deterministic (the paper resamples ∝ w; a fixed-seed rank
    selection keeps the oracle exact).  Order: rounded weight desc, doc_id
    asc — ties broken on the SAME %.4f value both engines hash."""

    def keyed(b: pa.Table) -> pa.Table:
        w = np.round(b["logw_f"].to_numpy(zero_copy_only=False), 4)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "logw_r": pa.array(w, pa.float64()),
            }
        )

    top = (
        doc_logweights(sf_dir, target_lang)
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["logw_r", "doc_id"], descending=[True, False])
        .limit(k)
    )

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "logw": pa.array(
                    [f"{v:.4f}" for v in b["logw_r"].to_pylist()], pa.string()
                ),
            }
        )

    return top.map_batches(fmt, batch_format="pyarrow")
