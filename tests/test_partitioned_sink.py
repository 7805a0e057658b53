"""Resumable partition-per-key parquet sink (`stages/export.py::
write_partitioned` / `read_partitioned`): atomic commit, kill-resume skip,
hostile key values, byte-determinism."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


ROWS = [(0, "a"), (1, "b"), (2, "a"), (3, "c"), (4, "b"), (5, "a")]


@pytest.mark.usefixtures("ray_session")
class TestWritePartitioned:
    def test_layout_and_manifest(self, tmp_path):
        from scrupyst_ray.stages.export import write_partitioned

        out = str(tmp_path / "sink")
        manifest = write_partitioned(_ds(ROWS), out, "source")
        assert manifest == [
            ("a", 3, os.path.join(out, "source=a", "part.parquet")),
            ("b", 2, os.path.join(out, "source=b", "part.parquet")),
            ("c", 1, os.path.join(out, "source=c", "part.parquet")),
        ]
        for key in "abc":
            assert os.path.exists(os.path.join(out, f"source={key}", "_COMPLETE"))

    def test_resume_skips_complete_partitions(self, tmp_path):
        from scrupyst_ray.stages.export import write_partitioned

        out = str(tmp_path / "sink")
        write_partitioned(_ds(ROWS), out, "source")
        # simulate a kill after 'a' and 'c' committed: partition 'b' is gone
        b_dir = os.path.join(out, "source=b")
        os.remove(os.path.join(b_dir, "_COMPLETE"))
        os.remove(os.path.join(b_dir, "part.parquet"))
        mtimes = {
            k: os.path.getmtime(os.path.join(out, f"source={k}", "part.parquet"))
            for k in "ac"
        }
        manifest = write_partitioned(_ds(ROWS), out, "source")
        # only 'b' rewritten; 'a'/'c' untouched on disk and absent from manifest
        assert [m[0] for m in manifest] == ["b"]
        for k in "ac":
            assert (
                os.path.getmtime(os.path.join(out, f"source={k}", "part.parquet"))
                == mtimes[k]
            )
        got = pq.read_table(os.path.join(b_dir, "part.parquet"))
        assert got["doc_id"].to_pylist() == [1, 4]

    def test_rewrite_is_byte_identical(self, tmp_path):
        from scrupyst_ray.stages.export import write_partitioned

        out = str(tmp_path / "sink")
        write_partitioned(_ds(ROWS), out, "source")
        a_file = os.path.join(out, "source=a", "part.parquet")
        first = open(a_file, "rb").read()
        os.remove(os.path.join(out, "source=a", "_COMPLETE"))
        os.remove(a_file)
        write_partitioned(_ds(ROWS), out, "source")
        assert open(a_file, "rb").read() == first

    def test_second_run_writes_nothing(self, tmp_path):
        from scrupyst_ray.stages.export import write_partitioned

        out = str(tmp_path / "sink")
        write_partitioned(_ds(ROWS), out, "source")
        assert write_partitioned(_ds(ROWS), out, "source") == []

    def test_hostile_key_values(self, tmp_path):
        from scrupyst_ray.stages.export import (
            read_partitioned,
            write_partitioned,
        )

        rows = [(0, "a/b"), (1, ""), (2, "x y"), (3, "a/b")]
        out = str(tmp_path / "sink")
        manifest = write_partitioned(_ds(rows), out, "source")
        assert [m[0] for m in manifest] == ["", "a/b", "x y"]
        back = read_partitioned(out, "source").take_all()
        assert sorted(r["doc_id"] for r in back) == [0, 1, 2, 3]
        assert {r["source"] for r in back} == {"a/b", "", "x y"}

    def test_read_ignores_incomplete_partition(self, tmp_path):
        from scrupyst_ray.stages.export import (
            read_partitioned,
            write_partitioned,
        )

        out = str(tmp_path / "sink")
        write_partitioned(_ds(ROWS), out, "source")
        os.remove(os.path.join(out, "source=c", "_COMPLETE"))
        back = read_partitioned(out, "source").take_all()
        assert sorted(r["source"] for r in back) == ["a", "a", "a", "b", "b"]

    def test_nonstring_keys_prune_on_resume(self, tmp_path):
        """bool/int/float keys: the dirname and the resume prune must share
        one string representation (ADVICE r2 — Python str(True)='True' vs
        Arrow cast 'true' silently defeated pruning), so a second run over
        the same input writes NOTHING for any key type."""
        import ray.data

        from scrupyst_ray.stages.export import (
            read_partitioned,
            write_partitioned,
        )

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "flag": pa.array([True, False, True, False], pa.bool_()),
                "ratio": pa.array([1.5, 2.0, 1.5, 2.0], pa.float64()),
            }
        )
        for key in ("flag", "ratio"):
            out = str(tmp_path / f"sink_{key}")
            m1 = write_partitioned(ray.data.from_arrow(t), out, key)
            assert len(m1) == 2
            m2 = write_partitioned(ray.data.from_arrow(t), out, key)
            assert m2 == []  # resume pruned every completed partition
            back = read_partitioned(out, key).take_all()
            assert sorted(r["doc_id"] for r in back) == [0, 1, 2, 3]
