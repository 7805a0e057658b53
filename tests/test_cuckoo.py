"""Cuckoo filter (state/cuckoo.py) + its SeenState integration: the sketch
must never produce a false negative, deletes must restore negatives, and a
cuckoo-configured crawl must be bit-identical to the bloom one."""

from __future__ import annotations

import numpy as np
import pytest

from scrupyst_ray.state.cuckoo import CuckooFilter
from scrupyst_ray.state.seen import SeenState


def _keys(n: int, seed: int = 3) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        1, 1 << 63, size=n, dtype=np.uint64
    )


class TestCuckooFilter:
    def test_no_false_negatives(self):
        cf = CuckooFilter(capacity=8192)
        keys = _keys(5000)
        cf.add_many(keys)
        assert cf.contains_many(keys).all()
        assert len(cf) == 5000

    def test_low_false_positive_rate(self):
        cf = CuckooFilter(capacity=8192)
        cf.add_many(_keys(5000))
        other = _keys(5000, seed=99)
        fp_rate = cf.contains_many(other).mean()
        assert fp_rate < 0.01  # 16-bit fingerprints, 4-way buckets

    def test_delete_restores_negatives(self):
        cf = CuckooFilter(capacity=4096)
        keys = _keys(1000)
        cf.add_many(keys)
        deleted = cf.delete_many(keys[:500])
        assert deleted.all()
        assert not cf.contains_many(keys[:500]).any() or (
            # residual positives can only be fingerprint collisions from the
            # still-present second half
            cf.contains_many(keys[:500]).mean() < 0.01
        )
        assert cf.contains_many(keys[500:]).all()
        assert len(cf) == 500

    def test_deterministic_across_instances(self):
        keys = _keys(3000)
        a, b = CuckooFilter(4096), CuckooFilter(4096)
        a.add_many(keys)
        b.add_many(keys)
        assert np.array_equal(a._table, b._table)
        assert a._stash == b._stash

    def test_overflow_stays_correct(self):
        # tiny table forced past saturation: lookups must still be exact
        cf = CuckooFilter(capacity=1024)
        keys = _keys(5000, seed=5)
        cf.add_many(keys)
        assert cf.contains_many(keys).all()


class TestSeenStateSketches:
    def test_cuckoo_and_bloom_agree(self):
        fps = [bytes([i % 256, (i >> 8) % 256]) * 10 for i in range(2000)]
        fp64 = np.fromiter(
            (int.from_bytes(fp[:8], "big") for fp in fps),
            dtype=np.uint64,
            count=len(fps),
        )
        out = {}
        for sketch in ("bloom", "cuckoo"):
            st = SeenState(0, sketch=sketch)
            first = st.check_and_add(1, fps, fp64)
            again = st.check_and_add(2, fps, fp64)
            out[sketch] = (first.tolist(), again.tolist(), len(st))
        assert out["bloom"] == out["cuckoo"]
        assert all(out["cuckoo"][0]) and not any(out["cuckoo"][1])

    def test_forget_readmits(self):
        fps = [bytes([i]) * 20 for i in range(100)]
        fp64 = np.fromiter(
            (int.from_bytes(fp[:8], "big") for fp in fps),
            dtype=np.uint64,
            count=len(fps),
        )
        st = SeenState(0, sketch="cuckoo")
        st.check_and_add(1, fps, fp64)
        assert st.forget(fps[:10]) == 10
        fresh = st.check_and_add(2, fps[:20], fp64[:20])
        # forgotten fps are fresh again; the rest are still seen
        assert fresh.tolist() == [True] * 10 + [False] * 10

    def test_unknown_sketch_rejected(self):
        with pytest.raises(ValueError):
            SeenState(0, sketch="xor")


@pytest.mark.usefixtures("ray_session")
class TestCuckooCrawlParity:
    def test_cuckoo_crawl_identical_to_bloom(self, smoke_corpus, tmp_path):
        import os

        from scrupyst_ray.config import CrawlConfig
        from scrupyst_ray.pipelines.crawl import CrawlEngine

        orders = {}
        for sketch in ("bloom", "cuckoo"):
            cfg = CrawlConfig(
                seen_shards=4,
                fetch_buckets=4,
                concurrent_requests_per_domain=4,
                seen_sketch=sketch,
            )
            wd = str(tmp_path / f"wd_{sketch}")
            eng = CrawlEngine.for_corpus(
                os.path.join(smoke_corpus, "pages"), wd, cfg
            )
            eng.init_frontier(os.path.join(smoke_corpus, "seeds.parquet"))
            res = eng.run(max_rounds=4)
            t = res.crawl_order_table()
            orders[sketch] = list(
                zip(t["round"].to_pylist(), t["url"].to_pylist())
            )
        assert orders["bloom"] == orders["cuckoo"]
        assert len(orders["cuckoo"]) > 0
