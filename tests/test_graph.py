"""Distributed PageRank (pipelines/graph.py): local numpy parity, rank-mass
conservation, and the forced-distributed join branch."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from scrupyst_ray.pipelines import joins
from scrupyst_ray.pipelines.graph import edges_store, pagerank
from scrupyst_ray.pipelines.joins import collect_table


def _local_pagerank(src, dst, iters=5, d=0.85):
    nodes = sorted(set(src) | set(dst))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u in src:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.zeros(n)
        for u, v in zip(src, dst):
            s[idx[v]] += r[idx[u]] / deg[idx[u]]
        dang = 1.0 - s.sum()
        r = (1 - d) / n + d * (s + dang / n)
    return nodes, r * n


@pytest.fixture(scope="module")
def pr_table(ray_session):
    return collect_table(pagerank("/root/testdata/sf0.001"))


class TestPageRank:
    def test_matches_local_numpy(self, pr_table):
        edges = pq.read_table(edges_store())
        nodes, ref = _local_pagerank(
            edges["src"].to_pylist(), edges["dst"].to_pylist()
        )
        got = dict(
            zip(pr_table["url"].to_pylist(), pr_table["pr"].to_pylist())
        )
        assert len(got) == len(nodes)
        for u, r in zip(nodes, ref):
            assert abs(float(got[u]) - r) <= 2e-4, (u, got[u], r)

    def test_mass_conserved(self, pr_table):
        n = pr_table.num_rows
        total = sum(float(v) for v in pr_table["pr"].to_pylist()) / n
        assert abs(total - 1.0) < 1e-2

    def test_most_linked_page_outranks_average(self, pr_table):
        from collections import Counter

        edges = pq.read_table(edges_store())
        top_dst, _ = Counter(edges["dst"].to_pylist()).most_common(1)[0]
        got = dict(
            zip(pr_table["url"].to_pylist(), pr_table["pr"].to_pylist())
        )
        assert float(got[top_dst]) > 1.0  # average page is ~1.0

    def test_forced_distributed_branch(self, ray_session, monkeypatch):
        monkeypatch.setattr(joins, "BROADCAST_MAX_ROWS", 0)
        forced = collect_table(pagerank("/root/testdata/sf0.001"))
        monkeypatch.undo()
        normal = collect_table(pagerank("/root/testdata/sf0.001"))
        a = sorted(
            zip(forced["url"].to_pylist(), forced["pr"].to_pylist())
        )
        b = sorted(
            zip(normal["url"].to_pylist(), normal["pr"].to_pylist())
        )
        assert a == b


class TestDegreeDistribution:
    def test_matches_local(self, ray_session):
        from collections import Counter

        from scrupyst_ray.pipelines.graph import degree_distribution

        t = collect_table(degree_distribution("/root/testdata/sf0.001"))
        edges = pq.read_table(edges_store())
        outd = Counter(Counter(edges["src"].to_pylist()).values())
        ind = Counter(Counter(edges["dst"].to_pylist()).values())
        got = {
            (d, deg): n
            for d, deg, n in zip(
                t["direction"].to_pylist(),
                t["degree"].to_pylist(),
                t["n_nodes"].to_pylist(),
            )
        }
        want = {("out", deg): n for deg, n in outd.items()}
        want.update({("in", deg): n for deg, n in ind.items()})
        assert got == want


class TestHITS:
    def test_matches_local_numpy(self, ray_session):
        from scrupyst_ray.pipelines.graph import hits

        t = collect_table(hits("/root/testdata/sf0.001"))
        edges = pq.read_table(edges_store())
        src = edges["src"].to_pylist()
        dst = edges["dst"].to_pylist()
        nodes = sorted(set(src) | set(dst))
        idx = {u: i for i, u in enumerate(nodes)}
        n = len(nodes)
        h = np.full(n, 1.0 / n)
        for _ in range(5):
            a = np.zeros(n)
            for u, v in zip(src, dst):
                a[idx[v]] += h[idx[u]]
            a /= a.sum()
            h = np.zeros(n)
            for u, v in zip(src, dst):
                h[idx[u]] += a[idx[v]]
            h /= h.sum()
        got = {
            u: (float(hb), float(ab))
            for u, hb, ab in zip(
                t["url"].to_pylist(),
                t["hub"].to_pylist(),
                t["auth"].to_pylist(),
            )
        }
        assert len(got) == n
        for u in nodes:
            gh, ga = got[u]
            assert abs(gh - h[idx[u]] * n) <= 2e-4, u
            assert abs(ga - a[idx[u]] * n) <= 2e-4, u
