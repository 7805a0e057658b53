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
    from scrupyst_ray.functions.textstats import _EN_STOPWORDS, ws_tokens

    ds = _docs(sf_dir, ["doc_id", "text"])

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
            sum(1 for t in ws_tokens(txt.lower()) if t in _EN_STOPWORDS)
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


# ---------------------------------------------------------------------------
# Gopher-style repetition signals + gate, corpus-level term statistics
# ---------------------------------------------------------------------------

from scrupyst_ray.functions.textstats import ws_tokens as _tokens  # noqa: E402
# (RE2-\S-exact tokenizer shared with curation.py — see ws_tokens)


def _repetition_row(toks: list[str], n: int) -> tuple[float, float]:
    """(dup_frac, top_frac) of the word n-grams of one document:
    dup_frac = fraction of n-gram occurrences whose gram occurs more than
    once; top_frac = occurrences of the most frequent gram / total.  Both 0.0
    when the doc has fewer than n tokens (no grams)."""
    total = len(toks) - n + 1
    if total <= 0:
        return 0.0, 0.0
    from collections import Counter

    counts = Counter(
        " ".join(toks[i : i + n]) for i in range(total)
    )
    dup_occ = sum(c for c in counts.values() if c > 1)
    return dup_occ / total, max(counts.values()) / total


def gopher_repetition(sf_dir: str):
    """(doc_id, n_tokens, dup_2gram_frac, top_2gram_frac, dup_3gram_frac,
    top_3gram_frac) — the Gopher (Rae et al. '21, table A1) repeated-n-gram
    quality signals, per document.  Fractions are %.4f strings so the DuckDB
    oracle hashes identically (same convention as ``doc_quality_metrics``)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rep(b: pa.Table) -> pa.Table:
        toks_col = [_tokens(t) for t in b["text"].to_pylist()]
        cols: dict[str, list] = {"d2": [], "t2": [], "d3": [], "t3": []}
        for toks in toks_col:
            d2, t2 = _repetition_row(toks, 2)
            d3, t3 = _repetition_row(toks, 3)
            cols["d2"].append(f"{d2:.4f}")
            cols["t2"].append(f"{t2:.4f}")
            cols["d3"].append(f"{d3:.4f}")
            cols["t3"].append(f"{t3:.4f}")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(
                    [len(t) for t in toks_col], pa.int64()
                ),
                "dup_2gram_frac": pa.array(cols["d2"], pa.string()),
                "top_2gram_frac": pa.array(cols["t2"], pa.string()),
                "dup_3gram_frac": pa.array(cols["d3"], pa.string()),
                "top_3gram_frac": pa.array(cols["t3"], pa.string()),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow").sort("doc_id")


def gopher_quality_gate(
    sf_dir: str,
    min_tokens: int = 15,
    max_dup_2gram: float = 0.15,
    max_top_2gram: float = 0.10,
):
    """doc_ids passing the Gopher repetition thresholds — the filter a
    curation pipeline applies before training.  Thresholds compare the RAW
    fractions (not the formatted strings)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def gate(b: pa.Table) -> pa.Table:
        keep = []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = _tokens(t)
            if len(toks) < min_tokens:
                continue
            d2, t2 = _repetition_row(toks, 2)
            if d2 <= max_dup_2gram and t2 <= max_top_2gram:
                keep.append(d)
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    return ds.map_batches(gate, batch_format="pyarrow").sort("doc_id")


def top_terms_by_lang(sf_dir: str, k: int = 10):
    """(lang, token, n) — the *k* most frequent whitespace tokens per
    language (ties broken by token ascending).

    Scale shape: term counts PRE-AGGREGATE inside each map_batches task
    (one (lang, token) partial row per batch, not one row per token
    occurrence), so the groupby shuffles the distinct-term table rather than
    the corpus; the final per-lang top-k is a tiny map_groups."""
    ds = _docs(sf_dir, ["lang", "text"])

    def partial_counts(b: pa.Table) -> pa.Table:
        from collections import Counter

        counts: dict[str, Counter] = {}
        for lang, t in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            counts.setdefault(lang, Counter()).update(_tokens(t))
        langs, tokens, ns = [], [], []
        for lang, c in counts.items():
            for tok, n in c.items():
                langs.append(lang)
                tokens.append(tok)
                ns.append(n)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "token": pa.array(tokens, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n"))
    )

    def topk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g,
            sort_keys=[("sum(n)", "descending"), ("token", "ascending")],
        )
        t = g.take(order.slice(0, k))
        return pa.table(
            {"lang": t["lang"], "token": t["token"], "n": t["sum(n)"]}
        )

    return (
        totals.groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["lang", "n", "token"], descending=[False, True, False])
    )


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """(doc_id, token, score) — the *k* highest tf-idf tokens per document
    (score = tf × ln(N/df), ties broken by token ascending; %.4f strings for
    hash-stable comparison).

    Scale shape: the document-frequency table is built with per-batch
    Counter partials (one row per distinct token per batch) + a token-keyed
    groupby, then attached to the per-doc term rows via the size-selected
    ``attach_by_key`` (small vocab broadcasts once; a web-scale vocab takes
    the distributed hash join); the per-doc top-k is a doc_id-keyed
    map_groups."""
    from collections import Counter

    from scrupyst_ray.pipelines.joins import attach_by_key, rename

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def term_rows(b: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            for tok, tf in Counter(_tokens(t)).items():
                ids.append(d)
                toks.append(tok)
                tfs.append(tf)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    terms = docs.map_batches(term_rows, batch_format="pyarrow").materialize()

    def df_partials(b: pa.Table) -> pa.Table:
        # each (doc_id, token) row is already distinct per doc → counting
        # rows per token counts documents
        c = Counter(b["token"].to_pylist())
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "df_part": pa.array(list(c.values()), pa.int64()),
            }
        )

    df_tbl = rename(
        terms.map_batches(df_partials, batch_format="pyarrow")
        .groupby("token")
        .sum("df_part"),
        ["token", "df"],
    ).materialize()

    scored = attach_by_key(terms, df_tbl, "token", "df")

    def topk(g: pa.Table) -> pa.Table:
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf * np.log(n_docs / df)
        t = g.append_column("score_f", pa.array(score, pa.float64()))
        order = pc.sort_indices(
            t, sort_keys=[("score_f", "descending"), ("token", "ascending")]
        )
        t = t.take(order.slice(0, k))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "token": t["token"],
                "score": pa.array(
                    [f"{s:.4f}" for s in t["score_f"].to_pylist()], pa.string()
                ),
            }
        )

    return (
        scored.groupby("doc_id")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["doc_id", "token"])
    )


def doc_length_quantiles(sf_dir: str):
    """(source, p50, p90, p99) — discrete token-length quantiles per source
    (the length-filter calibration signal in curation pipelines).

    Token counts come from the pure-Arrow regex kernel; the per-source
    quantile is EXACT via a source-keyed ``map_groups`` (numpy
    ``inverted_cdf`` — bit-identical to DuckDB's ``quantile_disc``).  The
    shuffle is one row per DOCUMENT (two int64-ish columns), not per token;
    exactness requires each source group to fit a worker — for a source
    with billions of docs use :func:`doc_length_quantiles_sketch` (additive
    log-bucket histogram, fixed state per source) at the cost of ≤3.2%
    underestimate vs the SQL-exact oracle."""
    ds = _docs(sf_dir, ["source", "text"])

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], pattern=r"\S+")
        return pa.table({"source": b["source"], "n_tokens": pc.cast(n, pa.int64())})

    def quantiles(g: pa.Table) -> pa.Table:
        v = g["n_tokens"].to_numpy(zero_copy_only=False)
        p = np.quantile(v, [0.5, 0.9, 0.99], method="inverted_cdf")
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "p50": pa.array([int(p[0])], pa.int64()),
                "p90": pa.array([int(p[1])], pa.int64()),
                "p99": pa.array([int(p[2])], pa.int64()),
            }
        )

    return (
        ds.map_batches(count, batch_format="pyarrow")
        .groupby("source")
        .map_groups(quantiles, batch_format="pyarrow")
        .sort("source")
    )


def doc_length_quantiles_sketch(sf_dir: str):
    """(source, p50, p90, p99) — the SKETCH variant of
    :func:`doc_length_quantiles` for groups too large to sort on one worker:
    per-batch partial histograms (HDR-style log buckets,
    ``functions/sketches.py``) combine by an additive
    ``groupby(source, bucket).sum`` — state per source is ≤ a few hundred
    bucket rows regardless of document count, merge order irrelevant.
    Estimates are bucket lower bounds: ≤3.2% below the exact
    ``quantile_disc`` value (pinned by tests), deterministic."""
    from collections import Counter

    from scrupyst_ray.functions.sketches import bucket_of, quantiles_from_hist

    ds = _docs(sf_dir, ["source", "text"])

    def hist_partials(b: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(b["text"], pattern=r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        srcs = b["source"].to_pylist()
        keep = n >= 1  # zero-token docs carry no length signal
        c = Counter(zip(np.asarray(srcs)[keep], bucket_of(n[keep])))
        return pa.table(
            {
                "source": pa.array([k[0] for k in c], pa.string()),
                "bucket": pa.array([int(k[1]) for k in c], pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partials, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .sum("n")
    )

    def finish(g: pa.Table) -> pa.Table:
        est = quantiles_from_hist(
            g["bucket"].to_numpy(zero_copy_only=False),
            g["sum(n)"].to_numpy(zero_copy_only=False),
            [0.5, 0.9, 0.99],
        )
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "p50": pa.array([est[0]], pa.int64()),
                "p90": pa.array([est[1]], pa.int64()),
                "p99": pa.array([est[2]], pa.int64()),
            }
        )

    return hist.groupby("source").map_groups(finish, batch_format="pyarrow").sort(
        "source"
    )


def vocab_by_lang(sf_dir: str):
    """(lang, vocab) — EXACT distinct-token count per language.

    Combiner discipline: each batch emits one row per distinct
    (lang, token) it contains (a set, not the token stream), the keyed
    groupby dedups across batches, and a second tiny groupby counts rows
    per lang.  The shuffle is bounded by the vocabulary, not the corpus."""
    ds = _docs(sf_dir, ["lang", "text"])

    def distinct_rows(b: pa.Table) -> pa.Table:
        seen: set[tuple[str, str]] = set()
        for lang, t in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            for tok in set(_tokens(t)):
                seen.add((lang, tok))
        return pa.table(
            {
                "lang": pa.array([x[0] for x in seen], pa.string()),
                "token": pa.array([x[1] for x in seen], pa.string()),
            }
        )

    distinct = (
        ds.map_batches(distinct_rows, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .count()
    )
    from scrupyst_ray.pipelines.joins import rename

    return rename(
        distinct.map_batches(
            lambda t: t.select(["lang"]), batch_format="pyarrow"
        )
        .groupby("lang")
        .count(),
        ["lang", "vocab"],
    ).sort("lang")


def vocab_by_lang_hll(sf_dir: str):
    """(lang, vocab_est) — the SKETCH variant of :func:`vocab_by_lang`:
    HyperLogLog registers (``functions/sketches.py``, 4 KB per lang) merged
    with a ``groupby(lang, register).max`` — state is constant per lang at
    ANY corpus size, duplicate partials are harmless (max is idempotent),
    estimate ≈1.6% standard error (bounded vs the exact query in tests,
    and the ESTIMATE itself is hash-gated by a full DuckDB twin since
    round 5).

    Token hash: md5 first-8-bytes big-endian (NOT ``stable_hash64``'s
    blake2b, which DuckDB cannot compute) — equally uniform, and it lets
    the SQL oracle re-derive every register (``('0x'||substr(md5(tok),
    1,16))::UBIGINT``), the rho math (bin-length bit twiddling in
    HUGEINT), the exact harmonic denominator, and the linear-counting
    branch, so the estimate is verified end to end rather than merely
    floor-gated."""
    from scrupyst_ray.functions.sketches import hll_estimate, hll_partial

    ds = _docs(sf_dir, ["lang", "text"])

    def register_rows(b: pa.Table) -> pa.Table:
        by_lang: dict[str, set[str]] = {}
        for lang, t in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            by_lang.setdefault(lang, set()).update(_tokens(t))
        langs, idxs, rhos = [], [], []
        for lang, toks in by_lang.items():
            if not toks:
                continue
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
                    )
                    for t in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            idx, rho = hll_partial(h)
            langs.extend([lang] * len(idx))
            idxs.extend(int(i) for i in idx)
            rhos.extend(int(r) for r in rho)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "register": pa.array(idxs, pa.int64()),
                "rho": pa.array(rhos, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(register_rows, batch_format="pyarrow")
        .groupby(["lang", "register"])
        .max("rho")
    )

    def finish(g: pa.Table) -> pa.Table:
        est = hll_estimate(
            g["register"].to_numpy(zero_copy_only=False),
            g["max(rho)"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "lang": pa.array([g["lang"][0].as_py()], pa.string()),
                "vocab_est": pa.array([est], pa.int64()),
            }
        )

    return (
        merged.groupby("lang").map_groups(finish, batch_format="pyarrow").sort("lang")
    )


def vocab_hll_gate(sf_dir: str, tol: float = 0.05):
    """(lang, vocab_exact, hll_ok) — the sketch-accuracy gate for
    :func:`vocab_by_lang_hll`: ``vocab_exact`` is recomputed INDEPENDENTLY
    by the SQL oracle (COUNT(DISTINCT token) per lang — data-dependent, so
    a broken exact pipeline hash-mismatches) and ``hll_ok`` is EARNED by
    running BOTH pipelines and requiring the HLL estimate within *tol* of
    exact (HLL at 2^9 registers ≈ 4.6% standard error bound; measured
    ≤2% on the gate corpora).  Both sides are bounded driver reads: one row
    per lang."""
    exact = {r["lang"]: r["vocab"] for r in vocab_by_lang(sf_dir).take_all()}
    est = {
        r["lang"]: r["vocab_est"]
        for r in vocab_by_lang_hll(sf_dir).take_all()
    }
    langs = sorted(exact)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "vocab_exact": pa.array([exact[l] for l in langs], pa.int64()),
            "hll_ok": pa.array(
                [
                    abs(est.get(l, 0) / exact[l] - 1.0) <= tol
                    if exact[l]
                    else est.get(l, 0) == 0
                    for l in langs
                ],
                pa.bool_(),
            ),
        }
    )


def quantile_sketch_gate(sf_dir: str, rel: float = 0.032):
    """(source, p50, p90, p99, sketch_ok) — the sketch-accuracy gate for
    :func:`doc_length_quantiles_sketch`: the EXACT per-source quantiles are
    recomputed independently by the SQL oracle (``quantile_disc`` —
    data-dependent), and ``sketch_ok`` is EARNED by requiring every
    log-bucket estimate within its documented band: a bucket LOWER bound,
    so ``exact·(1−rel) − 1 ≤ est ≤ exact`` per quantile (the ≤3.2%
    underestimate pinned in tests, now driver-visible)."""
    exact_rows = {
        r["source"]: (r["p50"], r["p90"], r["p99"])
        for r in doc_length_quantiles(sf_dir).take_all()
    }
    est_rows = {
        r["source"]: (r["p50"], r["p90"], r["p99"])
        for r in doc_length_quantiles_sketch(sf_dir).take_all()
    }
    srcs = sorted(exact_rows)
    ok = []
    for s in srcs:
        ex, es = exact_rows[s], est_rows.get(s, (0, 0, 0))
        ok.append(
            all(e * (1.0 - rel) - 1 <= v <= e for e, v in zip(ex, es))
        )
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "p50": pa.array([exact_rows[s][0] for s in srcs], pa.int64()),
            "p90": pa.array([exact_rows[s][1] for s in srcs], pa.int64()),
            "p99": pa.array([exact_rows[s][2] for s in srcs], pa.int64()),
            "sketch_ok": pa.array(ok, pa.bool_()),
        }
    )


def top_terms_by_lang_cms(sf_dir: str, k: int = 10, candidates_per_batch: int = 64):
    """(lang, token, n_est) — the SKETCH variant of :func:`top_terms_by_lang`
    for vocabularies too large to shuffle exactly: each batch contributes
    (a) additive Count-Min cell partials (``functions/sketches.py``, d·w
    counters per lang — constant state) and (b) its LOCAL top candidates
    (bounded per batch).  Cells merge by groupby-sum; the driver sees only
    the two bounded tables (cells ≤ langs·d·w rows, candidates ≤
    batches·langs·candidates_per_batch rows) and ranks candidates by their
    min-over-rows estimate.  CMS never underestimates, so any true top-k
    token that any batch surfaced locally ranks correctly."""
    from collections import Counter

    from scrupyst_ray.functions.hashing import stable_hash64
    from scrupyst_ray.functions.sketches import CMS_D, cms_cells, cms_estimate
    from scrupyst_ray.pipelines.joins import collect_table

    ds = _docs(sf_dir, ["lang", "text"])

    def partials(b: pa.Table) -> pa.Table:
        per_lang: dict[str, Counter] = {}
        for lang, t in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            per_lang.setdefault(lang, Counter()).update(_tokens(t))
        langs, kinds, rows_, cols_, toks, ns = [], [], [], [], [], []
        for lang, c in per_lang.items():
            items = list(c.items())
            hs = np.fromiter(
                (stable_hash64(t) for t, _ in items),
                dtype=np.uint64,
                count=len(items),
            )
            counts = np.fromiter(
                (n for _, n in items), dtype=np.int64, count=len(items)
            )
            cells = cms_cells(hs)
            for r in range(CMS_D):
                flat = cells[:, r] * CMS_D + r  # (col, row) packed
                agg: Counter = Counter()
                for f, n in zip(flat, counts):
                    agg[int(f)] += int(n)
                for f, n in agg.items():
                    langs.append(lang)
                    kinds.append(0)
                    rows_.append(f % CMS_D)
                    cols_.append(f // CMS_D)
                    toks.append("")
                    ns.append(n)
            for tok, n in c.most_common(candidates_per_batch):
                langs.append(lang)
                kinds.append(1)
                rows_.append(0)
                cols_.append(0)
                toks.append(tok)
                ns.append(n)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "kind": pa.array(kinds, pa.int8()),
                "row": pa.array(rows_, pa.int64()),
                "col": pa.array(cols_, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")
    cells_t = collect_table(
        parts.filter(expr="kind == 0")
        .groupby(["lang", "row", "col"])
        .sum("n")
    )
    cand_t = collect_table(
        parts.filter(expr="kind == 1")
        .groupby(["lang", "token"])
        .max("n")
    )

    cells: dict[str, dict[tuple[int, int], int]] = {}
    for lang, r, c, n in zip(
        cells_t["lang"].to_pylist(),
        cells_t["row"].to_pylist(),
        cells_t["col"].to_pylist(),
        cells_t["sum(n)"].to_pylist(),
    ):
        cells.setdefault(lang, {})[(r, c)] = n

    out_lang, out_tok, out_n = [], [], []
    by_lang: dict[str, list[str]] = {}
    for lang, tok in zip(
        cand_t["lang"].to_pylist(), cand_t["token"].to_pylist()
    ):
        by_lang.setdefault(lang, []).append(tok)
    for lang in sorted(by_lang):
        ests = [
            (cms_estimate(cells[lang], stable_hash64(t)), t)
            for t in by_lang[lang]
        ]
        ests.sort(key=lambda x: (-x[0], x[1]))
        for n, t in ests[:k]:
            out_lang.append(lang)
            out_tok.append(t)
            out_n.append(n)
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "token": pa.array(out_tok, pa.string()),
            "n_est": pa.array(out_n, pa.int64()),
        }
    )
