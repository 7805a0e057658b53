"""Shared distributed-join / broadcast-lookup helpers for the pipelines.

Two join strategies, chosen by side size (SURVEY.md §2.4 guidance):

- :func:`dist_join` — Ray Data hash join; both sides shuffle on the key, so
  per-task state is bounded by partition size.  Fan-out scales with cluster
  CPUs; aggregator actors use fractional CPUs so chained joins don't
  reserve the whole cluster up front (a full-CPU pool per join DEADLOCKS a
  cluster smaller than joins×partitions — observed at num_cpus=4).
- :func:`broadcast_lookup` / :func:`attach_from_lookup` — the SMALL-side
  pattern: ``ray.put`` the (key, value) arrays once, ``pc.index_in`` +
  ``take`` inside every batch (vectorized — no per-row dict.get loop).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def join_partitions() -> int:
    n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(64, n // 2))


JOIN_AGG_ARGS = {"num_cpus": 0.25}


def dist_join(left, right, how: str, on: tuple, right_on: tuple | None = None):
    return left.join(
        right,
        how,
        num_partitions=join_partitions(),
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args=JOIN_AGG_ARGS,
    )


def rename(ds, names: list[str]):
    """Zero-copy column rename (metadata-only map_batches)."""
    return ds.map_batches(lambda t: t.rename_columns(names), batch_format="pyarrow")


def attach_by_key(pairs, side, key_col: str, payload_as: str):
    """Hash-join ``side``'s second column onto rows of ``pairs`` matching on
    *key_col* (side must have exactly (key, payload) columns)."""
    side2 = rename(side, [f"__k_{key_col}", payload_as])
    out = dist_join(pairs, side2, "inner", (key_col,), (f"__k_{key_col}",))
    k = f"__k_{key_col}"
    return out.map_batches(
        lambda t: t.drop_columns([k]) if k in t.column_names else t,
        batch_format="pyarrow",
    )


def broadcast_lookup(ds_small, key_col: str, val_col: str):
    """Collect a SMALL dataset's (key, value) columns once and ``ray.put``
    them as plain Arrow arrays (zero-copy reads in every task)."""
    t = pa.concat_tables(ray.get(ds_small.select_columns([key_col, val_col]).to_arrow_refs()))
    return ray.put((t[key_col].combine_chunks(), t[val_col].combine_chunks()))


def attach_from_lookup(batch: pa.Table, key_col: str, out_col: str, ref, fill=None):
    """Vectorized broadcast-join attach: ``pc.index_in`` + ``take`` (no
    per-row Python dict lookups)."""
    keys, vals = ray.get(ref)
    idx = pc.index_in(batch[key_col], value_set=keys)
    out = pc.take(vals, idx)
    if fill is not None:
        out = pc.fill_null(out, fill)
    return batch.append_column(out_col, out)
