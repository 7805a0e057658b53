"""Similarity search over the ``embeddings`` table (list<float> column).

- Brute-force cosine top-k: the baseline — per-batch numpy matmul against a
  BROADCAST query matrix (``ray.put`` once, zero-copy numpy in every task),
  partial top-k per batch, tiny final merge.  No full materialization of the
  corpus; scales linearly with corpus size.
- IVF top-k: the scale path — deterministic k-means coarse quantizer, batch
  rows assigned to cells, queries probe only ``nprobe`` nearest cells.
- Embedding cosine near-dup pairs: all-pairs above a threshold via blocked
  matmul (batch × broadcast-corpus), emitting (a < b) pairs.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    flat = batch["embedding"].combine_chunks() if isinstance(
        batch["embedding"], pa.ChunkedArray
    ) else batch["embedding"]
    arr = np.asarray(flat.to_pylist(), dtype=np.float64)
    return ids, arr


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def load_query_vectors(sf_dir: str, query_ids: list[int]) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    by_id = {i: v for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())}
    return np.asarray([by_id[q] for q in query_ids], dtype=np.float64)


def brute_force_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10):
    """(query_id, vec_id, cos) global top-k per query.

    Pattern: queries normalized once and broadcast; every batch computes
    cos = Q · Bᵀ (vectorized) and emits only its LOCAL top-k per query; the
    driver merges #batches × k candidate rows — the corpus itself streams.
    """
    query_ids = query_ids or [0]
    q = _normalize(load_query_vectors(sf_dir, query_ids))
    q_ref = ray.put(q)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        sims = qm @ _normalize(m).T  # (n_queries, n_rows)
        out_q, out_v, out_c = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argsort(-row, kind="stable")[:k]
            out_q.extend([int(qid_arr[qi])] * len(top))
            out_v.extend(int(ids[t]) for t in top)
            out_c.extend(float(row[t]) for t in top)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow").take_all()
    # final merge: #batches × k rows — driver-side by design
    best: dict[int, list] = {int(i): [] for i in qid_arr}
    for row in partials:
        heapq.heappush(best[row["query_id"]], (row["cos"], -row["vec_id"]))
        if len(best[row["query_id"]]) > k:
            heapq.heappop(best[row["query_id"]])
    out_q, out_v, out_c = [], [], []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], -t[1]))
        for cos, neg_vid in ranked:
            out_q.append(qid)
            out_v.append(-neg_vid)
            out_c.append(f"{cos:.4f}")  # fixed-decimal string: duckdb printf parity
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos": pa.array(out_c, pa.string()),
        }
    )


def _kmeans(m: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means (fixed-seed init) — the coarse
    quantizer for IVF."""
    rng = np.random.default_rng(7)
    centroids = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    for _ in range(iters):
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            pts = m[assign == c]
            if len(pts):
                centroids[c] = pts.mean(axis=0)
    return centroids


def ivf_topk(
    sf_dir: str,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
):
    """IVF-style ANN: assign rows to k-means cells (one pass), probe only the
    ``nprobe`` cells nearest each query.  At 100 TB the cell assignment is a
    one-time partitioned write (like the page store) and a query touches
    nprobe/n_clusters of the corpus."""
    query_ids = query_ids or [0]
    # train the quantizer on a bounded sample (first block is fine for a
    # deterministic toy corpus; production: ds.random_sample with fixed seed)
    sample = _emb(sf_dir).limit(2048)
    ids, m = _to_matrix(pa.concat_tables(ray.get(sample.to_arrow_refs())))
    mn = _normalize(m)
    centroids = _normalize(_kmeans(mn, n_clusters))
    q = _normalize(load_query_vectors(sf_dir, query_ids))
    probe_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # per query
    cent_ref = ray.put(centroids)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_cells)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def local_topk(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        qm = ray.get(q_ref)
        probes = ray.get(probe_ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        cell = (mn @ cents.T).argmax(axis=1)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qm)):
            mask = np.isin(cell, probes[qi])
            if not mask.any():
                continue
            row = qm[qi] @ mn[mask].T
            sub_ids = ids[mask]
            top = np.argsort(-row, kind="stable")[:k]
            out_q.extend([int(qid_arr[qi])] * len(top))
            out_v.extend(int(sub_ids[t]) for t in top)
            out_c.extend(float(row[t]) for t in top)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = _emb(sf_dir).map_batches(local_topk, batch_format="pyarrow").take_all()
    best: dict[int, list] = {int(i): [] for i in qid_arr}
    for row in partials:
        heapq.heappush(best[row["query_id"]], (row["cos"], -row["vec_id"]))
        if len(best[row["query_id"]]) > k:
            heapq.heappop(best[row["query_id"]])
    out_q, out_v, out_c = [], [], []
    for qid in sorted(best):
        for cos, neg_vid in sorted(best[qid], key=lambda t: (-t[0], -t[1])):
            out_q.append(qid)
            out_v.append(-neg_vid)
            out_c.append(round(cos, 4))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        }
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35):
    """(a, b, cos) pairs with cosine ≥ threshold, a < b — embedding-space
    near-duplicate detection.  Corpus broadcast once (small table); at scale
    the IVF cells above bound the candidate pairs instead."""
    full = pa.concat_tables(ray.get(_emb(sf_dir).to_arrow_refs()))
    all_ids, all_m = _to_matrix(full)
    all_mn = _normalize(all_m)
    ref = ray.put((all_ids, all_mn))

    def pairs(batch: pa.Table) -> pa.Table:
        corpus_ids, corpus = ray.get(ref)
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ corpus.T
        a_out, b_out, c_out = [], [], []
        for r in range(sims.shape[0]):
            hits = np.flatnonzero(sims[r] >= threshold)
            for h in hits:
                if ids[r] < corpus_ids[h]:
                    a_out.append(int(ids[r]))
                    b_out.append(int(corpus_ids[h]))
                    # fixed-decimal string: duckdb printf parity (oracle_sql)
                    c_out.append(f"{float(sims[r, h]):.4f}")
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "cos": pa.array(c_out, pa.string()),
            }
        )

    return _emb(sf_dir).map_batches(pairs, batch_format="pyarrow").sort(["a", "b"])
