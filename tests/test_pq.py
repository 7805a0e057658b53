"""Product quantization (`pipelines/pq.py`): code shape/determinism, ADC
distance correctness vs a numpy reference, shortlist-rerank recall."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_encode_shape_and_determinism(ray_session):
    from scrupyst_ray.pipelines.pq import encode

    rows = sorted(encode(SF, m=8, n_codes=64).take_all(), key=lambda r: r["vec_id"])
    assert len(rows) == 500
    assert all(len(r["code"]) == 8 for r in rows)
    again = sorted(encode(SF, m=8, n_codes=64).take_all(), key=lambda r: r["vec_id"])
    assert rows == again


def test_adc_matches_numpy_reference(ray_session):
    """ADC distance of a code must equal the lut-sum computed directly
    from the codebooks — checked for the top hit of one query."""
    from scrupyst_ray.pipelines.pq import adc_topk, encode, train_codebooks
    from scrupyst_ray.pipelines.ann import _normalize, load_query_vectors

    m, nc = 8, 64
    books = train_codebooks(SF, m, nc)
    codes = {r["vec_id"]: np.frombuffer(r["code"], np.uint8)
             for r in encode(SF, m, nc).take_all()}
    q = _normalize(load_query_vectors(SF, [0]))[0]
    sub = books.shape[2]
    top = adc_topk(SF, [0], 5, m, nc)
    for vid, dist in zip(top["vec_id"].to_pylist(), top["adc_dist"].to_pylist()):
        want = sum(
            ((q[j * sub : (j + 1) * sub] - books[j][codes[vid][j]]) ** 2).sum()
            for j in range(m)
        )
        assert abs(dist - want) < 1e-3


def test_rerank_hits_exact_topk(ray_session):
    """With a 50-candidate shortlist + exact re-rank, the top-k must equal
    brute-force cosine top-k exactly (recall 1.0 on every probe query)."""
    from scrupyst_ray.pipelines.pq import pq_recall

    r = pq_recall(SF, [0, 7, 23, 41], 10, m=16, n_codes=256, rerank=50)
    assert r["recall_at_k"].to_pylist() == [1.0, 1.0, 1.0, 1.0]


def test_plain_adc_recall_floor(ray_session):
    from scrupyst_ray.pipelines.pq import pq_recall

    r = pq_recall(SF, [0, 7, 23, 41], 10, m=16, n_codes=256)
    assert float(np.mean(r["recall_at_k"].to_pylist())) >= 0.6


def test_code_stats(ray_session):
    from scrupyst_ray.pipelines.pq import pq_code_stats

    t = pq_code_stats(SF, m=16, n_codes=256)
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["n_vectors"] == 500
    assert row["code_bytes"] == 16  # 64 float32 dims → 16 bytes = 16×
    assert 1 < row["distinct_codes"] <= 500
    assert float(row["mean_sq_error"]) < 0.5  # unit vectors: ‖x‖²=1 scale


def test_pq_recall_floor_gate(ray_session):
    """Driver-visible gate: exact id-sums present and the ADC+R recall
    boolean earned at the default (m=16, n_codes=256, R=50) config."""
    from scrupyst_ray.pipelines.pq import pq_recall_floor

    t = pq_recall_floor(SF)
    assert t["query_id"].to_pylist() == [0, 7, 23, 41]
    assert all(t["pq_recall_ok"].to_pylist())
    assert all(s > 0 for s in t["exact_topk_id_sum"].to_pylist())


class TestIvfPq:
    def test_store_partitioned_and_code_bounded(self, ray_session):
        import os

        from scrupyst_ray.pipelines.pq import build_ivfpq_store

        codes_dir, cents, books = build_ivfpq_store(SF)
        cells = [d for d in os.listdir(codes_dir) if d.startswith("cell=")]
        assert 2 <= len(cells) <= 16
        assert cents.shape == (16, 64) and books.shape == (16, 256, 4)

    def test_probe_reads_only_probed_cells(self, ray_session):
        from scrupyst_ray.pipelines.ann import _read_cells
        from scrupyst_ray.pipelines.pq import build_ivfpq_store

        codes_dir, _, _ = build_ivfpq_store(SF)
        part = _read_cells(codes_dir, [0, 1]).take_all()
        assert all(r["cell_id"] in (0, 1) for r in part)
        assert len(part) < 500  # strictly probe-bounded

    def test_recall_floor_and_top1(self, ray_session):
        from scrupyst_ray.pipelines.pq import ivfpq_recall_floor

        t = ivfpq_recall_floor(SF)
        assert all(t["ivfpq_recall_ok"].to_pylist())
        assert all(t["top1_ok"].to_pylist())
        # impossible floor → the boolean reacts to the data
        t2 = ivfpq_recall_floor(SF, [0], floor=1.01)
        assert t2["ivfpq_recall_ok"].to_pylist() == [False]

    def test_full_probe_rerank_is_exact(self, ray_session):
        from scrupyst_ray.pipelines.ann import brute_force_topk
        from scrupyst_ray.pipelines.pq import ivfpq_topk

        full = ivfpq_topk(SF, [0, 7], 10, nprobe=16, rerank=500)
        bf = brute_force_topk(SF, [0, 7], 10)
        assert full["vec_id"].to_pylist() == bf["vec_id"].to_pylist()
