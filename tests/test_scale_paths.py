"""Force the 100 TB execution paths at test scale: with the broadcast
thresholds zeroed, every size-selected join/anti-join takes the DISTRIBUTED
hash-join branch.  Results must be bit-identical to the (default) broadcast
branch — proving the scale path is exercised, correct, and not dead code."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _rows(ds):
    out = ds.take_all()
    return [tuple(sorted(r.items())) for r in out]


@pytest.fixture()
def force_distributed(monkeypatch):
    import scrupyst_ray.pipelines.joins as joins

    monkeypatch.setattr(joins, "BROADCAST_MAX_ROWS", 0)
    return joins


@pytest.mark.usefixtures("ray_session")
class TestForcedDistributedJoins:
    def test_minhash_pairs_identical(self, force_distributed):
        from scrupyst_ray.pipelines.dedup import minhash_pairs

        forced = _rows(minhash_pairs(SF))
        force_distributed.BROADCAST_MAX_ROWS = 200_000
        default = _rows(minhash_pairs(SF))
        assert forced == default and len(forced) > 0

    def test_minhash_dedup_keep_identical(self, force_distributed):
        from scrupyst_ray.pipelines.dedup import minhash_dedup_keep

        forced = _rows(minhash_dedup_keep(SF))
        force_distributed.BROADCAST_MAX_ROWS = 200_000
        default = _rows(minhash_dedup_keep(SF))
        assert forced == default and len(forced) > 100

    def test_ngram_jaccard_identical(self, force_distributed):
        from scrupyst_ray.pipelines.dedup import ngram_jaccard_pairs

        forced = _rows(ngram_jaccard_pairs(SF))
        force_distributed.BROADCAST_MAX_ROWS = 200_000
        default = _rows(ngram_jaccard_pairs(SF))
        assert forced == default and len(forced) > 0

    def test_jaccard_allpairs_exact_identical(self, force_distributed):
        from scrupyst_ray.pipelines.dedup import jaccard_allpairs_exact

        forced = _rows(jaccard_allpairs_exact(SF))
        force_distributed.BROADCAST_MAX_ROWS = 200_000
        default = _rows(jaccard_allpairs_exact(SF))
        assert forced == default and len(forced) > 0

    def test_neardup_cluster_sizes_identical(self, force_distributed):
        from scrupyst_ray.pipelines.cluster import neardup_cluster_sizes

        forced = _rows(neardup_cluster_sizes(SF))
        force_distributed.BROADCAST_MAX_ROWS = 200_000
        default = _rows(neardup_cluster_sizes(SF))
        assert forced == default and len(forced) > 0
