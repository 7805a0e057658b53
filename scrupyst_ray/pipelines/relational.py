"""Relational pipelines over the driver-provided TPC-H-ish tables.

These exercise the engine's generic operator surface — partial-then-final
aggregation, broadcast hash join (small side via ``ray.put``), sort+limit
top-k, tumbling-window aggregation — each with a DuckDB-matchable output
(column names aligned with ``__ray_entry__.oracle_sql``).

Scale notes: aggregations pre-combine inside ``map_batches`` implicitly via
Ray Data's partial groupby; the customer⨝orders join deliberately broadcasts
the SMALL side once (``ray.put``) instead of shuffling both tables — the
pattern SURVEY.md §2.4 mandates for the robots lookup.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _round_cols(batch: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Replace derived float columns with fixed-decimal STRINGS.

    Arrow's ``pc.round`` and DuckDB's ``ROUND`` can differ by one ulp in the
    double they produce for the same decimal — a value-hash trap.  C-style
    ``%.Nf`` formatting (python f-string here, ``printf`` in the oracle SQL)
    is bit-identical on both sides."""
    for name, digits in cols.items():
        idx = batch.column_names.index(name)
        vals = batch[name].to_pylist()
        fmt = [("" if v is None else f"{v:.{digits}f}") for v in vals]
        batch = batch.set_column(idx, name, pa.array(fmt, pa.string()))
    return batch


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: grouped pricing aggregates over lineitem with the
    disc-price expression computed vectorized before the (pre-combined)
    groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_disc_price(b: pa.Table) -> pa.Table:
        disc = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return b.append_column("disc_price", disc)

    out = (
        ds.map_batches(add_disc_price, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity"),
            Sum("l_extendedprice"),
            Sum("disc_price"),
            Mean("l_quantity"),
            Count(),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "avg_qty",
                "count_order",
            ]
        )
        return _round_cols(
            b, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4}
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def orders_by_segment(sf_dir: str):
    """orders ⨝ customer via BROADCAST of the small side (customer is ~1/10
    the rows of orders; at 100 TB the same pattern ships the dict once per
    node via the object store instead of shuffling orders)."""
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_table = pa.concat_tables(ray.get(customer.to_arrow_refs()))
    seg_map = dict(
        zip(cust_table["c_custkey"].to_pylist(), cust_table["c_mktsegment"].to_pylist())
    )
    seg_ref = ray.put(seg_map)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def attach(batch: pa.Table, *, seg=None) -> pa.Table:
        m = ray.get(seg_ref)
        segs = [m.get(k, "") for k in batch["o_custkey"].to_pylist()]
        return batch.append_column("c_mktsegment", pa.array(segs, pa.string()))

    out = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(), Sum("o_totalprice"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["c_mktsegment", "n_orders", "sum_totalprice"])
        return _round_cols(b, {"sum_totalprice": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


def top10_orders(sf_dir: str):
    """Global top-k = sort + limit (distributed sample-partition sort on the
    shuffle path; k rows leave it)."""
    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def events_by_type(sf_dir: str):
    out = (
        _read(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .aggregate(Count(), Sum("value"), Mean("value"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["event_type", "n_events", "sum_value", "avg_value"])
        return _round_cols(b, {"sum_value": 4, "avg_value": 6})

    return out.map_batches(finish, batch_format="pyarrow").sort("event_type")


def events_minutely(sf_dir: str):
    """Tumbling 1-minute window aggregate (streaming-style windowed count,
    SURVEY.md §2.9 — the reference has no windows; this is the batch analog)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def add_minute(b: pa.Table) -> pa.Table:
        return b.append_column("minute", pc.floor_temporal(b["ts"], unit="minute"))

    out = (
        ds.map_batches(add_minute, batch_format="pyarrow")
        .groupby("minute")
        .aggregate(Count(), Sum("value"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["minute", "n_events", "sum_value"])
        return _round_cols(b, {"sum_value": 4})

    return out.map_batches(finish, batch_format="pyarrow").sort("minute")


def supplier_part_join(sf_dir: str):
    """part ⨝ lineitem broadcast join → revenue per part brand."""
    part = _read(sf_dir, "part", None)
    cols = part.schema().names
    key_col = "p_partkey"
    brand_col = "p_brand" if "p_brand" in cols else cols[1]
    pt = pa.concat_tables(ray.get(part.select_columns([key_col, brand_col]).to_arrow_refs()))
    brand_map = dict(zip(pt[key_col].to_pylist(), pt[brand_col].to_pylist()))
    ref = ray.put(brand_map)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def attach(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        brands = [m.get(k, "") for k in b["l_partkey"].to_pylist()]
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table(
            {"brand": pa.array(brands, pa.string()), "revenue": rev}
        )

    out = (
        li.map_batches(attach, batch_format="pyarrow")
        .groupby("brand")
        .aggregate(Count(), Sum("revenue"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["brand", "n_items", "revenue"])
        return _round_cols(b, {"revenue": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort("brand")
