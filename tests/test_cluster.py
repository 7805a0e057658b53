"""Connected-components clustering: unit tests on hand-built graphs plus
DuckDB recursive-CTE oracle parity for the near-dup cluster queries."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _cc(edge_pairs, vertex_ids):
    import ray.data

    from scrupyst_ray.pipelines.cluster import connected_components

    edges = ray.data.from_items(
        [{"a": a, "b": b} for a, b in edge_pairs]
    )
    if not edge_pairs:
        # from_items([]) has no schema; build an empty typed dataset instead
        import pyarrow as pa
        import ray.data as rd

        edges = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    verts = ray.data.from_items([{"v": v} for v in vertex_ids])
    out = connected_components(edges, verts)
    return dict(
        (r["v"], r["l"]) for r in out.take_all()
    )


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_two_components_and_singleton(self):
        # 0-1-2 chained, 3-4 pair, 5 isolated
        labels = _cc([(0, 1), (1, 2), (3, 4)], range(6))
        assert labels == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}

    def test_long_chain_converges(self):
        # a 40-vertex path exercises the pointer-jumping (log rounds)
        n = 40
        labels = _cc([(i, i + 1) for i in range(n - 1)], range(n))
        assert all(l == 0 for l in labels.values())
        assert len(labels) == n

    def test_no_edges_identity(self):
        labels = _cc([], [7, 9, 11])
        assert labels == {7: 7, 9: 9, 11: 11}

    def test_min_label_not_first_label(self):
        # the smallest id joins LAST via the edge list order; min must win
        labels = _cc([(5, 6), (4, 5), (0, 4)], [0, 4, 5, 6])
        assert set(labels.values()) == {0}


@pytest.mark.usefixtures("ray_session")
class TestNeardupClusters:
    def _oracle_pairs_cte(self):
        return f"""
            WITH s AS (
                SELECT doc_id, source,
                       list_distinct([substr(text, i, 3)
                           for i in range(1, greatest(length(text) - 1, 2))])
                           AS sh
                FROM read_parquet('{SF}/documents.parquet')
            ),
            p AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
                WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
                      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ),
            e AS (
                SELECT a AS src, b AS dst FROM p
                UNION ALL SELECT b AS src, a AS dst FROM p
            )
        """

    def test_clusters_match_recursive_cte(self):
        from scrupyst_ray.pipelines.cluster import neardup_clusters

        ours = [
            (r["doc_id"], r["cluster_id"])
            for r in neardup_clusters(SF).take_all()
        ]
        theirs = duckdb.sql(
            "WITH RECURSIVE "
            + self._oracle_pairs_cte().split("WITH", 1)[1]
            + f""",
            reach(v, l) AS (
                SELECT doc_id, doc_id
                FROM read_parquet('{SF}/documents.parquet')
                UNION
                SELECT e.dst, r.l FROM reach r JOIN e ON e.src = r.v
            )
            SELECT v, MIN(l) FROM reach GROUP BY v ORDER BY v
            """
        ).fetchall()
        assert ours == theirs
        # every document is labeled; at least one real multi-doc cluster
        sizes = {}
        for _, c in ours:
            sizes[c] = sizes.get(c, 0) + 1
        assert max(sizes.values()) >= 2

    def test_cluster_sizes_partition_the_corpus(self):
        from scrupyst_ray.pipelines.cluster import neardup_cluster_sizes

        rows = neardup_cluster_sizes(SF).take_all()
        n_docs = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        assert sum(r["n_docs"] for r in rows) == n_docs
        # cluster_id is always the smallest member, hence a real doc_id
        assert all(r["cluster_id"] >= 0 for r in rows)
