"""SemDeDup (`pipelines/ann.py::semdedup_keep`) — within-cluster cosine
pruning properties on a hand-built embeddings table and invariants on the
synthetic corpus."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_emb(d: str, vecs: list[list[float]]):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


@pytest.fixture()
def two_bundle_dir(tmp_path):
    """Two tight direction bundles (near-duplicates within each) plus one
    outlier; 8-dim so k=2 k-means separates them trivially."""
    rng = np.random.default_rng(3)
    base_a = np.zeros(8)
    base_a[0] = 1.0
    base_b = np.zeros(8)
    base_b[4] = 1.0
    vecs = []
    for base in (base_a, base_b):
        for _ in range(5):
            v = base + rng.normal(0, 0.01, 8)  # cos ≈ 0.999 within bundle
            vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
    out = np.ones(8) / np.sqrt(8)  # equidistant outlier
    vecs.append(out.astype(np.float32).tolist())
    _write_emb(str(tmp_path), vecs)
    return str(tmp_path)


def test_bundles_collapse_to_one_each(ray_session, two_bundle_dir):
    from scrupyst_ray.pipelines.ann import semdedup_keep

    kept = [r["vec_id"] for r in semdedup_keep(two_bundle_dir, tau=0.95, k=2).take_all()]
    # each 5-vector bundle keeps exactly one member; the outlier lands in
    # one of the two clusters but is far (cos ≈ 0.35) from both bundles
    assert len(kept) == 3


def test_every_drop_has_a_kept_neighbor(ray_session):
    """Invariant on the real corpus: a dropped vector must have a kept
    vector in ITS cluster with cosine ≥ tau (otherwise it was dropped for
    no reason)."""
    from scrupyst_ray.pipelines.ann import _semdedup_flags

    tau = 0.8
    rows = _semdedup_flags(SF, tau=tau, k=4).take_all()
    emb = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    m = np.stack([np.asarray(v, np.float64) for v in emb["embedding"].to_pylist()])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    vid = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [m[vid[r["vec_id"]]] for r in members if r["kept"]]
        assert kept, f"cluster {cid} kept nothing"
        km = np.stack(kept)
        for r in members:
            if not r["kept"]:
                sims = km @ m[vid[r["vec_id"]]]
                assert sims.max() >= tau, (cid, r["vec_id"], sims.max())


def test_keep_rule_prefers_low_centroid_sim(ray_session, tmp_path):
    """Three near-identical vectors: the kept one must be the member LEAST
    similar to the cluster centroid (the paper's keep rule)."""
    from scrupyst_ray.pipelines.ann import _semdedup_flags, _train_centroids

    base = np.zeros(8)
    base[0] = 1.0
    perturbs = [0.0, 0.03, 0.06]  # increasing distance from the axis
    vecs = []
    for p in perturbs:
        v = base.copy()
        v[1] = p
        vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
    _write_emb(str(tmp_path), vecs)
    rows = {r["vec_id"]: r["kept"] for r in _semdedup_flags(str(tmp_path), 0.95, 1).take_all()}
    cent = _train_centroids(str(tmp_path), 1)[0]
    m = np.stack([np.asarray(v, np.float64) for v in vecs])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    want_keep = int(np.lexsort((np.arange(3), m @ cent))[0])
    assert rows == {i: (i == want_keep) for i in range(3)}


def test_tau_one_keeps_everything_distinct(ray_session, two_bundle_dir):
    from scrupyst_ray.pipelines.ann import semdedup_keep

    kept = semdedup_keep(two_bundle_dir, tau=1.0000001, k=2).take_all()
    assert len(kept) == 11  # nothing reaches an impossible threshold


def test_stats_consistent_and_deterministic(ray_session):
    from scrupyst_ray.pipelines.ann import semdedup_keep, semdedup_stats

    stats = semdedup_stats(SF, tau=0.8, k=4).take_all()
    kept = semdedup_keep(SF, tau=0.8, k=4).take_all()
    assert sum(r["n_vectors"] for r in stats) == 500
    assert sum(r["n_kept"] for r in stats) == len(kept)
    assert kept == semdedup_keep(SF, tau=0.8, k=4).take_all()
