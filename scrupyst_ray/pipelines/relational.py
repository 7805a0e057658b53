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

from scrupyst_ray.pipelines.joins import (
    attach_from_lookup,
    broadcast_lookup,
    dist_join,
)


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
        col = batch[name]
        vals = col.to_numpy(zero_copy_only=False)
        fmt = np.char.mod(f"%.{digits}f", vals)  # vectorized C formatting
        arr = pa.array(fmt, pa.string())
        nulls = col.is_null().combine_chunks() if isinstance(
            col, pa.ChunkedArray
        ) else col.is_null()
        if pc.any(nulls).as_py():
            arr = pc.if_else(nulls, pa.scalar(None, pa.string()), arr)
        batch = batch.set_column(idx, name, arr)
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
    seg_ref = broadcast_lookup(customer, "c_custkey", "c_mktsegment")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def attach(batch: pa.Table) -> pa.Table:
        # vectorized broadcast-join: pc.index_in + take (no per-row dict.get)
        return attach_from_lookup(
            batch, "o_custkey", "c_mktsegment", seg_ref, fill=""
        )

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


def events_sliding_window(sf_dir: str, window_min: int = 5, slide_min: int = 1):
    """Sliding-window aggregate (window 5 min, slide 1 min): each event is
    flat-mapped into the ``window/slide`` windows containing it (a
    vectorized ×5 expansion — concat of shifted copies, no row loop), then
    a partial-agg groupby on window_start.  This is the batch form of the
    streaming sliding window (SURVEY.md §2.9); the expansion factor is
    window/slide, constant per event, so the shuffle stays proportional to
    the input at any scale."""
    import datetime as dt

    ds = _read(sf_dir, "events", ["ts", "value"])
    k = window_min // slide_min

    def expand(b: pa.Table) -> pa.Table:
        minute = pc.floor_temporal(b["ts"], unit="minute")
        parts = []
        for j in range(k):
            start = pc.subtract(
                minute, pa.scalar(dt.timedelta(minutes=j * slide_min))
            )
            parts.append(
                pa.table({"window_start": start, "value": b["value"]})
            )
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(), Sum("value"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["window_start", "n_events", "sum_value"])
        return _round_cols(b, {"sum_value": 4})

    return out.map_batches(finish, batch_format="pyarrow").sort("window_start")


def supplier_part_join(sf_dir: str):
    """part ⨝ lineitem broadcast join → revenue per part brand."""
    part = _read(sf_dir, "part", None)
    cols = part.schema().names
    key_col = "p_partkey"
    brand_col = "p_brand" if "p_brand" in cols else cols[1]
    ref = broadcast_lookup(part, key_col, brand_col)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def attach(b: pa.Table) -> pa.Table:
        b = attach_from_lookup(b, "l_partkey", "brand", ref, fill="")
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"brand": b["brand"], "revenue": rev})

    out = (
        li.map_batches(attach, batch_format="pyarrow")
        .groupby("brand")
        .aggregate(Count(), Sum("revenue"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["brand", "n_items", "revenue"])
        return _round_cols(b, {"revenue": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort("brand")


def q3_shipping_priority(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1997-06-01"
):
    """TPC-H Q3 shape: filtered customer semi-join → orders ⨝ lineitem via a
    DISTRIBUTED hash join → revenue per order, top 10.

    The mid-size⨝large join uses ``Dataset.join`` (both sides shuffle on the
    order key — partition-bounded state); the tiny customer side is a
    broadcast ``is_in`` filter pushed into the orders scan."""
    import datetime as dt

    cut = dt.datetime.fromisoformat(cutoff)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_keys(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["c_mktsegment"], segment)).select(["c_custkey"])

    keys = pa.concat_tables(
        ray.get(cust.map_batches(seg_keys, batch_format="pyarrow").to_arrow_refs())
    )["c_custkey"].combine_chunks()
    keys_ref = ray.put(keys)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(b: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        keep = pc.and_(
            pc.less(b["o_orderdate"], pa.scalar(cut)),
            pc.is_in(b["o_custkey"], value_set=k),
        )
        return b.filter(keep).select(["o_orderkey", "o_orderdate"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def filt_li(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["l_shipdate"], pa.scalar(cut))
        b = b.filter(keep)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": rev})

    joined = dist_join(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        li.map_batches(filt_li, batch_format="pyarrow"),
        "inner",
        ("o_orderkey",),
        ("l_orderkey",),
    )
    out = (
        joined.map_batches(
            lambda t: t.select(["o_orderkey", "o_orderdate", "revenue"]),
            batch_format="pyarrow",
        )
        .groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue"))
        .map_batches(
            lambda t: t.rename_columns(["o_orderkey", "o_orderdate", "revenue"]),
            batch_format="pyarrow",
        )
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(10)
    )
    return out.map_batches(
        lambda t: _round_cols(t, {"revenue": 2}), batch_format="pyarrow"
    )


def revenue_by_nation(sf_dir: str):
    """lineitem ⨝ supplier ⨝ nation → revenue per nation name.  The two dim
    tables are tiny: composed driver-side into one (s_suppkey → n_name)
    lookup, broadcast once, attached vectorized per batch."""
    sup = pa.concat_tables(
        ray.get(
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_arrow_refs()
        )
    )
    nat = pa.concat_tables(
        ray.get(_read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_arrow_refs())
    )
    idx = pc.index_in(sup["s_nationkey"], value_set=nat["n_nationkey"].combine_chunks())
    sup_nation = pc.take(nat["n_name"].combine_chunks(), idx.combine_chunks())
    ref = ray.put((sup["s_suppkey"].combine_chunks(), sup_nation))

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def attach(b: pa.Table) -> pa.Table:
        b = attach_from_lookup(b, "l_suppkey", "nation", ref, fill="")
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"nation": b["nation"], "revenue": rev})

    out = (
        li.map_batches(attach, batch_format="pyarrow")
        .groupby("nation")
        .aggregate(Count(), Sum("revenue"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["nation", "n_items", "revenue"])
        return _round_cols(b, {"revenue": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort("nation")


def user_event_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization (SURVEY.md §2.9 streaming analog): per-user event
    stream split where the inter-event gap exceeds *gap_minutes* →
    (user_id, session_id, n_events, session_start, session_end).

    Scale shape: ``groupby(user_id).map_groups`` — state is bounded by one
    user's events; the session split inside the group is vectorized
    (np.diff over int64 timestamps)."""
    gap_us = np.int64(gap_minutes) * 60_000_000

    def sessions(g: pa.Table) -> pa.Table:
        user = g["user_id"][0].as_py()
        ts = np.sort(g["ts"].to_numpy(zero_copy_only=False)).astype(
            "datetime64[us]"
        )
        tsi = ts.view(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], np.diff(tsi) > gap_us))
        )
        ends = np.append(starts[1:], len(tsi))
        return pa.table(
            {
                "user_id": pa.array([user] * len(starts), pa.int64()),
                "session_id": pa.array(np.arange(len(starts)), pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "session_end": pa.array(ts[ends - 1], pa.timestamp("us")),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
        .sort(["user_id", "session_id"])
    )


def asof_prior_event(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
):
    """AS-OF JOIN: for every *left_type* event, the most recent
    *right_type* event by the SAME user at or before its timestamp
    (``prior_event_id``/``gap_us`` NULL when none exists).

    Ray Data has no asof join operator; this is the composition the brief
    prescribes: union both sides with a side tag → ONE hash shuffle keyed
    by the equality key (user_id) → per-group vectorized sorted merge
    (``np.searchsorted``).  Partitioning assumption (documented per brief):
    the equality key bounds each group — a pure time-range asof with no
    equality key would instead range-partition on ts and replicate one
    boundary row per partition.  Oracle: DuckDB's native ``ASOF LEFT JOIN``.
    Tie rule: among right rows sharing the greatest ts ≤ left ts, the
    HIGHEST event_id wins (deterministic; DuckDB's pick among exact-ts ties
    is unspecified, so oracle parity assumes distinct right timestamps —
    true of the microsecond-resolution events table).
    """
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"],
            value_set=pa.array([left_type, right_type], pa.string()),
        )
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    def merge_group(g: pa.Table) -> pa.Table:
        # secondary event_id key: equal-ts rows otherwise keep shuffle
        # arrival order, making the picked prior_event_id nondeterministic
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        left_mask = g["is_left"].to_numpy(zero_copy_only=False)
        l_ts, l_ids = ts[left_mask], ids[left_mask]
        r_ts, r_ids = ts[~left_mask], ids[~left_mask]
        # index of the last right row with ts <= each left ts
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        matched = pos >= 0
        safe = np.clip(pos, 0, None)
        prior = r_ids[safe] if len(r_ids) else np.zeros(len(l_ids), np.int64)
        gap = l_ts - (r_ts[safe] if len(r_ts) else 0)
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "event_id": pa.array(l_ids, pa.int64()),
                "user_id": pa.array(np.full(len(l_ids), uid), pa.int64()),
                "prior_event_id": pa.array(
                    [int(p) if ok else None for p, ok in zip(prior, matched)],
                    pa.int64(),
                ),
                "gap_us": pa.array(
                    [int(x) if ok else None for x, ok in zip(gap, matched)],
                    pa.int64(),
                ),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge_group, batch_format="pyarrow")
        .sort("event_id")
    )


def clicks_before_purchase(sf_dir: str, window_s: int = 300):
    """RANGE JOIN: per purchase event, how many clicks the same user made in
    the *window_s* seconds strictly before it (``(ts - window, ts)``,
    half-open: the purchase instant itself is excluded).

    Same composition as :func:`asof_prior_event` (the equality key bounds
    the range): one user_id-keyed shuffle, then a vectorized two-sided
    ``np.searchsorted`` per group.  Oracle: a plain inequality join."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"],
            value_set=pa.array(["purchase", "click"], pa.string()),
        )
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], "purchase"),
            }
        )

    win_us = window_s * 1_000_000

    def count_group(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        left_mask = g["is_left"].to_numpy(zero_copy_only=False)
        l_ts, l_ids = ts[left_mask], ids[left_mask]
        r_ts = ts[~left_mask]
        lo = np.searchsorted(r_ts, l_ts - win_us, side="right")
        hi = np.searchsorted(r_ts, l_ts, side="left")
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "event_id": pa.array(l_ids, pa.int64()),
                "user_id": pa.array(np.full(len(l_ids), uid), pa.int64()),
                "n_clicks": pa.array(hi - lo, pa.int64()),
            }
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(count_group, batch_format="pyarrow")
        .sort("event_id")
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: pure filter + global aggregate.  The predicate is
    pushed INTO the parquet read (pyarrow dataset filter → row-group/page
    pruning), so only qualifying rows ever enter the object store — with
    the column prune, the scan ships 4 of 11 lineitem columns and skips
    row groups whose shipdate stats miss the year window."""
    from datetime import datetime

    import pyarrow.dataset as pds

    flt = (
        (pds.field("l_shipdate") >= datetime(1996, 1, 1))
        & (pds.field("l_shipdate") < datetime(1997, 1, 1))
        & (pds.field("l_discount") >= 0.05)
        & (pds.field("l_discount") <= 0.07)
        & (pds.field("l_quantity") < 24)
    )
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=flt,
    )

    def rev(b: pa.Table) -> pa.Table:
        r = pc.sum(pc.multiply(b["l_extendedprice"], b["l_discount"]))
        return pa.table({"rev": pa.array([r.as_py() or 0.0], pa.float64())})

    total = sum(
        r["rev"] for r in ds.map_batches(rev, batch_format="pyarrow").take_all()
    )
    return pa.table({"revenue": pa.array([f"{total:.2f}"], pa.string())})


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: month-windowed lineitem ⨝ part (small side
    broadcast once via ``ray.put``), conditional aggregate → one row:
    the PROMO share of discounted revenue for 1996, ``%.4f``."""
    from datetime import datetime

    import pyarrow.dataset as pds

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    type_ref = broadcast_lookup(part, "p_partkey", "p_type")
    flt = (pds.field("l_shipdate") >= datetime(1996, 1, 1)) & (
        pds.field("l_shipdate") < datetime(1997, 1, 1)
    )
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=flt,
    )

    def partials(b: pa.Table) -> pa.Table:
        b = attach_from_lookup(b, "l_partkey", "p_type", type_ref)
        disc = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        promo = pc.if_else(
            pc.equal(b["p_type"], pa.scalar("PROMO")), disc, pa.scalar(0.0)
        )
        return pa.table(
            {
                "promo": pa.array([pc.sum(promo).as_py() or 0.0], pa.float64()),
                "total": pa.array([pc.sum(disc).as_py() or 0.0], pa.float64()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").take_all()
    promo = sum(r["promo"] for r in parts)
    total = sum(r["total"] for r in parts)
    share = 100.0 * promo / total if total else 0.0
    return pa.table({"promo_revenue": pa.array([f"{share:.4f}"], pa.string())})


def customers_without_big_orders(sf_dir: str, threshold: float = 300_000.0):
    """(c_custkey, c_name, c_mktsegment) — customers with NO order above
    *threshold*: the distributed LEFT ANTI join surfaced as a query.

    The orders side is filtered AT THE READ (predicate pushdown — only
    qualifying custkeys leave storage) and pre-deduplicated per batch
    before the anti-join, so the drop-set the join sees is bounded by the
    distinct big-spender count, not the order count.  The join itself is
    size-selected (:func:`~scrupyst_ray.pipelines.joins.anti_join_by_key`):
    a small drop-set broadcasts once via ``ray.put``; a large one takes
    the shuffling left-anti hash join."""
    import pyarrow.dataset as pds

    from scrupyst_ray.pipelines.joins import anti_join_by_key

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    big = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pds.field("o_totalprice") > threshold,
    ).map_batches(
        # batch-local dedup (combiner): one row per distinct custkey per batch
        lambda b: pa.table({"o_custkey": pc.unique(b["o_custkey"])}),
        batch_format="pyarrow",
    )
    return anti_join_by_key(cust, big, "c_custkey").sort("c_custkey")


def customer_big_order_counts(sf_dir: str, threshold: float = 400_000.0):
    """(c_custkey, c_mktsegment, n_big_orders) — every customer with their
    count of orders above *threshold*, INCLUDING zero-count customers: the
    distributed LEFT OUTER join surfaced as a query.

    The orders side pre-aggregates to one (custkey, count) row per customer
    BEFORE the join (the combiner rule — the join never sees order rows),
    and the order scan pushes the price predicate into the parquet read."""
    import pyarrow.dataset as pds

    from ray.data.aggregate import Count as _Count

    from scrupyst_ray.pipelines.joins import rename as _rename

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    counts = _rename(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"],
            filter=pds.field("o_totalprice") > threshold,
        )
        .groupby("o_custkey")
        .aggregate(_Count()),
        ["o_custkey", "n"],
    )
    joined = dist_join(
        cust, counts, "left_outer", ("c_custkey",), ("o_custkey",)
    )

    def finish(b: pa.Table) -> pa.Table:
        n = pc.coalesce(pc.cast(b["n"], pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_mktsegment": b["c_mktsegment"],
                "n_big_orders": n,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


def q4_order_priority(
    sf_dir: str,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    min_discount: float = 0.05,
):
    """TPC-H Q4 shape: order counts per priority for orders that HAVE at
    least one qualifying line — the EXISTS pattern as a distributed
    LEFT SEMI hash join (``Dataset.join(how="left_semi")``: the probe side
    keeps rows with ≥1 match and emits them once, no payload attach).

    Q3 shows the broadcast ``is_in`` small-side alternative; this one
    exercises the shuffle semi join, the right shape when the inner side
    (lineitem keys) is too large to broadcast."""
    import datetime as dt

    lo = dt.datetime.fromisoformat(date_from)
    hi = dt.datetime.fromisoformat(date_to)

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    li_keys = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_discount"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater(b["l_discount"], pa.scalar(min_discount))
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    semi = dist_join(
        orders, li_keys, "left_semi", ("o_orderkey",), ("l_orderkey",)
    )
    return (
        semi.groupby("o_orderpriority")
        .aggregate(Count())
        .map_batches(
            lambda t: t.rename_columns(["o_orderpriority", "order_count"]),
            batch_format="pyarrow",
        )
        .sort("o_orderpriority")
    )


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
):
    """TPC-H Q5: revenue per nation from lineitems where the supplier and
    the ordering customer share a nation inside *region*, one year window.

    Join plan (sized like a real optimizer would):
    - region⨝nation and supplier are TINY → broadcast lookups
      (``ray.put`` once, ``pc.index_in`` per batch);
    - customer's (custkey → nationkey) attaches onto orders via the
      size-selected :func:`attach_by_key` (broadcast at bench scale, hash
      join at corpus scale);
    - the only big⨝big edge — filtered orders ⨝ lineitem — is the
      distributed hash join on the order key.
    """
    import datetime as dt

    lo = dt.datetime.fromisoformat(date_from)
    hi = dt.datetime.fromisoformat(date_to)

    from scrupyst_ray.pipelines.joins import attach_by_key, rename

    # nation keys inside the region + their names (driver-side: ≤25 rows)
    from scrupyst_ray.pipelines.joins import collect_table

    nat = collect_table(_read(sf_dir, "nation"))
    reg = collect_table(_read(sf_dir, "region"))
    rkeys = {
        k
        for k, name in zip(
            reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()
        )
        if name == region
    }
    nat_keys = [
        k
        for k, rk in zip(
            nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()
        )
        if rk in rkeys
    ]
    nat_names = dict(
        zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    )
    nat_key_arr = pa.array(nat_keys, pa.int64())

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pc.is_in(b["c_nationkey"], value_set=nat_key_arr)),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    orders = attach_by_key(orders, cust, "o_custkey", "c_nationkey")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_ref = broadcast_lookup(supp, "s_suppkey", "s_nationkey")

    def li_prep(b: pa.Table) -> pa.Table:
        b = attach_from_lookup(b, "l_suppkey", "s_nationkey", supp_ref)
        b = b.filter(pc.is_in(b["s_nationkey"], value_set=nat_key_arr))
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s_nationkey": b["s_nationkey"],
                "revenue": rev,
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = dist_join(li, orders, "inner", ("l_orderkey",), ("o_orderkey",))
    local = joined.map_batches(
        lambda t: t.filter(
            pc.equal(t["s_nationkey"], t["c_nationkey"])
        ).select(["s_nationkey", "revenue"]),
        batch_format="pyarrow",
    )
    out = (
        local.groupby("s_nationkey")
        .aggregate(Sum("revenue"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n_name": pa.array(
                        [
                            nat_names[k]
                            for k in t["s_nationkey"].to_pylist()
                        ],
                        pa.string(),
                    ),
                    "revenue": t["sum(revenue)"],
                }
            ),
            batch_format="pyarrow",
        )
        .sort("n_name")
    )
    return out.map_batches(
        lambda t: _round_cols(t, {"revenue": 2}), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# TPC-H-pattern additions: each surfaces one distributed-join/agg shape the
# engine relies on at corpus scale, with a DuckDB-matchable output.


def _nation_names(sf_dir: str) -> dict[int, str]:
    from scrupyst_ray.pipelines.joins import collect_table

    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    return dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))


def _map_names(col: pa.ChunkedArray | pa.Array, names: dict[int, str]) -> pa.Array:
    """Vectorized key→name map for FINAL (post-aggregate, tiny) tables."""
    keys = pa.array(list(names.keys()), pa.int64())
    vals = pa.array(list(names.values()), pa.string())
    idx = pc.index_in(pc.cast(col, pa.int64()), value_set=keys)
    return pc.take(vals, idx.combine_chunks() if isinstance(idx, pa.ChunkedArray) else idx)


def q7_volume_shipping(sf_dir: str, n1: int = 1, n2: int = 2):
    """TPC-H Q7 shape: revenue shipped between two nations (supplier in one,
    customer in the other), grouped by (supp_nation, cust_nation, ship year).

    Join plan: supplier→nation is a broadcast lookup folded into the
    lineitem scan; customer's nationkey attaches onto orders size-selected
    (:func:`attach_by_key`); the one big⨝big edge — filtered lineitem ⨝
    filtered orders — is the distributed hash join on the order key.  Both
    scans drop non-pair nations BEFORE the shuffle, so the join moves only
    qualifying rows.

    Empty-side guard: an ALL-empty dataset reaches the hash-join
    aggregator as schema-less blocks and fails (the known Ray Data
    empty-block behavior the repo's join helpers guard elsewhere); both
    pair filters derive from tiny dims, so a provably-empty side
    short-circuits driver-side using counts the size-selected attach needs
    anyway."""
    from scrupyst_ray.pipelines.joins import attach_by_key, collect_table, rename

    names = _nation_names(sf_dir)
    pair64 = pa.array([n1, n2], pa.int64())
    empty = pa.table(
        {
            "supp_nation": pa.array([], pa.string()),
            "cust_nation": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.string()),
        }
    )

    supp = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    if (
        supp.filter(
            pc.is_in(pc.cast(supp["s_nationkey"], pa.int64()), value_set=pair64)
        ).num_rows
        == 0
    ):
        return empty

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "cust_nation_key": pc.cast(b["c_nationkey"], pa.int64()),
            }
        ).filter(
            pc.is_in(pc.cast(b["c_nationkey"], pa.int64()), value_set=pair64)
        ),
        batch_format="pyarrow",
    )
    cust_rows = cust.count()
    if cust_rows == 0:
        return empty
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = attach_by_key(
        orders, cust, "o_custkey", "cust_nation_key", side_rows=cust_rows
    )

    supp_ref = ray.put(
        (supp["s_suppkey"].combine_chunks(), supp["s_nationkey"].combine_chunks())
    )

    def li_prep(b: pa.Table) -> pa.Table:
        b = attach_from_lookup(b, "l_suppkey", "s_nationkey", supp_ref)
        key = pc.cast(b["s_nationkey"], pa.int64())
        b = b.append_column("supp_nation_key", key).filter(
            pc.is_in(key, value_set=pair64)
        )
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "supp_nation_key": b["supp_nation_key"],
                "l_year": pc.year(b["l_shipdate"]),
                "revenue": rev,
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = dist_join(li, orders, "inner", ("l_orderkey",), ("o_orderkey",))
    cross = joined.map_batches(
        lambda t: t.filter(
            pc.not_equal(t["supp_nation_key"], t["cust_nation_key"])
        ).select(["supp_nation_key", "cust_nation_key", "l_year", "revenue"]),
        batch_format="pyarrow",
    )
    out = rename(
        cross.groupby(["supp_nation_key", "cust_nation_key", "l_year"]).aggregate(
            Sum("revenue")
        ),
        ["supp_nation_key", "cust_nation_key", "l_year", "revenue"],
    )

    def finish(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "supp_nation": _map_names(b["supp_nation_key"], names),
                "cust_nation": _map_names(b["cust_nation_key"], names),
                "l_year": b["l_year"],
                "revenue": b["revenue"],
            }
        )
        return _round_cols(b, {"revenue": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


def q9_product_profit(sf_dir: str, name_like: str = "red"):
    """TPC-H Q9 shape (adapted — no partsupp table in the star schema):
    discounted revenue from parts whose name contains *name_like*, grouped
    by (supplier nation, order year), year descending.

    The part filter reduces to a broadcast key set pushed into the lineitem
    scan (``pc.is_in``); supplier→nation folds into the same scan; the
    big⨝big lineitem ⨝ orders edge (orders carries the year) is the
    distributed hash join."""
    from scrupyst_ray.pipelines.joins import collect_table, rename

    names = _nation_names(sf_dir)
    part = collect_table(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    keep = pc.match_substring(part["p_name"], name_like)
    pkeys = part.filter(keep)["p_partkey"].combine_chunks()
    if len(pkeys) == 0:
        # empty-side guard: no matching part ⇒ provably-empty result (an
        # all-empty join side would fail in the hash aggregator)
        return pa.table(
            {
                "nation": pa.array([], pa.string()),
                "o_year": pa.array([], pa.int64()),
                "sum_profit": pa.array([], pa.string()),
            }
        )
    pkeys_ref = ray.put(pkeys)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_ref = broadcast_lookup(supp, "s_suppkey", "s_nationkey")

    def li_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=ray.get(pkeys_ref)))
        b = attach_from_lookup(b, "l_suppkey", "s_nationkey", supp_ref)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "nation_key": pc.cast(b["s_nationkey"], pa.int64()),
                "profit": rev,
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b["o_orderkey"], "o_year": pc.year(b["o_orderdate"])}
        ),
        batch_format="pyarrow",
    )
    joined = dist_join(li, orders, "inner", ("l_orderkey",), ("o_orderkey",))
    out = rename(
        joined.map_batches(
            lambda t: t.select(["nation_key", "o_year", "profit"]),
            batch_format="pyarrow",
        )
        .groupby(["nation_key", "o_year"])
        .aggregate(Sum("profit")),
        ["nation_key", "o_year", "sum_profit"],
    )

    def finish(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "nation": _map_names(b["nation_key"], names),
                "o_year": b["o_year"],
                "sum_profit": b["sum_profit"],
            }
        )
        return _round_cols(b, {"sum_profit": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["nation", "o_year"], descending=[False, True]
    )


def q10_returned_items(
    sf_dir: str, date_from: str = "1997-01-01", date_to: str = "1997-04-01"
):
    """TPC-H Q10 shape: top 20 customers by revenue lost to returned items
    (``l_returnflag = 'R'``) for orders placed in one quarter.

    Both scans push their predicates into the parquet read (row-group
    pruning); the orders ⨝ lineitem edge is the distributed hash join; the
    per-customer aggregate is small, so customer attributes attach onto IT
    (never the other way round)."""
    import datetime as dt

    import pyarrow.dataset as pds

    from scrupyst_ray.pipelines.joins import rename

    lo = dt.datetime.fromisoformat(date_from)
    hi = dt.datetime.fromisoformat(date_to)
    names = _nation_names(sf_dir)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pds.field("o_orderdate") >= lo) & (pds.field("o_orderdate") < hi),
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R",
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue": pc.multiply(
                    b["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), b["l_discount"]),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = dist_join(orders, li, "inner", ("o_orderkey",), ("l_orderkey",))
    per_cust = rename(
        joined.map_batches(
            lambda t: t.select(["o_custkey", "revenue"]), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(Sum("revenue")),
        ["o_custkey", "revenue"],
    )
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    joined2 = dist_join(per_cust, cust, "inner", ("o_custkey",), ("c_custkey",))
    top = joined2.sort(["revenue", "o_custkey"], descending=[True, False]).limit(20)

    def finish(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "c_custkey": b["o_custkey"],
                "c_name": b["c_name"],
                "revenue": b["revenue"],
                "c_acctbal": b["c_acctbal"],
                "n_name": _map_names(b["c_nationkey"], names),
            }
        )
        return _round_cols(b, {"revenue": 2, "c_acctbal": 2})

    return top.map_batches(finish, batch_format="pyarrow")


def q12_late_shipment_priority(sf_dir: str, days: int = 90):
    """TPC-H Q12 shape (adapted — no shipmode column): per returnflag, how
    many lineitems shipped more than *days* after their order date, split
    into urgent (1-URGENT / 2-HIGH) and non-urgent order priorities.

    One distributed hash join (lineitem ⨝ orders), then a vectorized
    conditional before a 3-row groupby — the classic join + conditional
    aggregate."""
    from scrupyst_ray.pipelines.joins import rename

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_returnflag"])
    joined = dist_join(li, orders, "inner", ("l_orderkey",), ("o_orderkey",))
    lateness_us = days * 86_400_000_000

    def classify(t: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(t["l_shipdate"], pa.int64()),
            pc.cast(t["o_orderdate"], pa.int64()),
        )
        t = t.filter(pc.greater(gap, pa.scalar(lateness_us, pa.int64())))
        urgent = pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        )
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "high": pc.if_else(urgent, one, zero),
                "low": pc.if_else(urgent, zero, one),
            }
        )

    return rename(
        joined.map_batches(classify, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("high"), Sum("low")),
        ["l_returnflag", "high_line_count", "low_line_count"],
    ).sort("l_returnflag")


def q18_large_volume_customers(sf_dir: str, threshold: float = 250.0):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    *threshold*, with the ordering customer, top 100 by order value.

    The HAVING pre-aggregate (lineitem → one quantity row per order) runs
    BEFORE any join, so the join inputs are one row per qualifying order;
    customer names attach onto the (small) qualifying set size-selected."""
    from scrupyst_ray.pipelines.joins import attach_by_key, rename

    qty = rename(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity")),
        ["l_orderkey", "sum_qty"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b["sum_qty"], pa.scalar(threshold))),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    joined = dist_join(orders, qty, "inner", ("o_orderkey",), ("l_orderkey",))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    named = attach_by_key(joined, cust, "o_custkey", "c_name")
    top = named.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(100)

    def finish(b: pa.Table) -> pa.Table:
        b = b.select(
            ["c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
        )
        return _round_cols(b, {"o_totalprice": 2, "sum_qty": 2})

    return top.map_batches(finish, batch_format="pyarrow")


def q21_waiting_suppliers(sf_dir: str, days: int = 90, topk: int = 25):
    """TPC-H Q21 shape (adapted to the star schema's dates): suppliers who
    were the ONLY late supplier (shipdate > orderdate + *days*) on a
    multi-supplier order, ranked by how many such orders they held up.

    Decomposition avoids any per-order row loop AND any big⨝big join:
    orders' (orderkey → orderdate) attaches onto lineitem size-selected
    (broadcast here, hash join at corpus scale); a MAP-SIDE combiner
    pre-dedupes (orderkey, suppkey, late) within each batch before the
    global pair groupby; the per-order stage computes everything in one
    aggregate — the sole late supplier is recovered algebraically as
    ``Sum(late·suppkey)`` (exact when ``Sum(late) = 1``), so no join back
    is needed.  Every stage is a keyed aggregate; nothing order-wise ever
    reaches the driver."""
    from ray.data.aggregate import Max

    from scrupyst_ray.pipelines.joins import attach_by_key, rename

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    li = attach_by_key(li, orders, "l_orderkey", "o_orderdate")
    lateness_us = days * 86_400_000_000

    def flag_and_combine(t: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(t["l_shipdate"], pa.int64()),
            pc.cast(t["o_orderdate"], pa.int64()),
        )
        late = pc.cast(
            pc.greater(gap, pa.scalar(lateness_us, pa.int64())), pa.int64()
        )
        pairs = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "late": late,
            }
        )
        # combiner: one (orderkey, suppkey) row per batch — the global
        # groupby then shuffles distinct pairs, not lineitems
        return pairs.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")]
        )

    per_pair = rename(
        li.map_batches(flag_and_combine, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("late_max")),
        ["l_orderkey", "l_suppkey", "late"],
    )

    def weight(b: pa.Table) -> pa.Table:
        return b.append_column(
            "late_supp", pc.multiply(b["late"], b["l_suppkey"])
        )

    per_order = rename(
        per_pair.map_batches(weight, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Count(), Sum("late"), Sum("late_supp")),
        ["l_orderkey", "n_supp", "n_late", "late_supp_sum"],
    )
    culprit = per_order.map_batches(
        lambda b: pa.table(
            {
                "l_suppkey": b.filter(
                    pc.and_(
                        pc.greater_equal(b["n_supp"], pa.scalar(2, pa.int64())),
                        pc.equal(b["n_late"], pa.scalar(1, pa.int64())),
                    )
                )["late_supp_sum"]
            }
        ),
        batch_format="pyarrow",
    )
    counts = rename(
        culprit.groupby("l_suppkey").aggregate(Count()),
        ["l_suppkey", "numwait"],
    )
    named = attach_by_key(
        counts, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "l_suppkey", "s_name",
    )
    return (
        named.sort(["numwait", "s_name"], descending=[True, False])
        .limit(topk)
        .map_batches(
            lambda t: t.select(["s_name", "numwait"]), batch_format="pyarrow"
        )
    )


def q22_idle_rich_customers(sf_dir: str, cutoff: str = "2000-06-01"):
    """TPC-H Q22 shape (adapted — every synthetic customer has orders):
    customers with an above-average account balance and NO order since
    *cutoff*, counted per nation.

    Pattern: a global scalar aggregate (the mean balance) gates the
    customer scan; the "no recent order" side is a size-selected anti-join
    whose drop-set was pre-deduplicated per batch; the result is a tiny
    per-nation groupby."""
    import datetime as dt

    import pyarrow.dataset as pds

    from scrupyst_ray.pipelines.joins import anti_join_by_key, rename

    names = _nation_names(sf_dir)
    cut = dt.datetime.fromisoformat(cutoff)

    avg_bal = _read(sf_dir, "customer", ["c_acctbal"]).mean("c_acctbal")

    rich = _read(
        sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], pa.scalar(avg_bal))),
        batch_format="pyarrow",
    )
    recent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pds.field("o_orderdate") >= cut,
    ).map_batches(
        lambda b: pa.table({"o_custkey": pc.unique(b["o_custkey"])}),
        batch_format="pyarrow",
    )
    idle = anti_join_by_key(rich, recent, "c_custkey")
    out = rename(
        idle.map_batches(
            lambda b: pa.table(
                {
                    "nation_key": pc.cast(b["c_nationkey"], pa.int64()),
                    "c_acctbal": b["c_acctbal"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("nation_key")
        .aggregate(Count(), Sum("c_acctbal")),
        ["nation_key", "numcust", "totacctbal"],
    )

    def finish(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "n_name": _map_names(b["nation_key"], names),
                "numcust": b["numcust"],
                "totacctbal": b["totacctbal"],
            }
        )
        return _round_cols(b, {"totacctbal": 2})

    return out.map_batches(finish, batch_format="pyarrow").sort("n_name")


# --------------------------------------------------------------------------
# TPC-H completion set.  The driver tables have no PARTSUPP, so Q2/Q11/Q16/
# Q20 are re-grounded on lineitem-derived supply facts (each docstring names
# the substitution); Q8/Q13/Q15/Q17/Q19 follow the spec shape directly.
# Float-threshold notes: l_quantity is integer-valued, so quantity sums /
# means are EXACT doubles on both engines; extendedprice sums are printf-
# rounded for display and only ever compared across gaps ≫ 1 ulp.


def q13_customer_distribution(sf_dir: str, exclude_priority: str = "1-URGENT"):
    """TPC-H Q13: distribution of per-customer order counts, including
    zero-order customers (the LEFT OUTER join shape).

    Orders pre-aggregate to one (custkey, count) row BEFORE the join — the
    outer join moves customer-cardinality rows only — then the histogram is
    a tiny second groupby."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b.filter(
            pc.not_equal(b["o_orderpriority"], pa.scalar(exclude_priority))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    from scrupyst_ray.pipelines.joins import rename as _rename

    counts = _rename(
        orders.groupby("o_custkey").aggregate(Count()), ["o_custkey", "n"]
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = dist_join(cust, counts, "left_outer", ("c_custkey",), ("o_custkey",))
    hist = (
        joined.map_batches(
            lambda b: pa.table(
                {
                    "c_count": pc.coalesce(
                        pc.cast(b["n"], pa.int64()), pa.scalar(0, pa.int64())
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .aggregate(Count())
    )
    from scrupyst_ray.pipelines.joins import rename

    return rename(hist, ["c_count", "custdist"]).sort(
        ["custdist", "c_count"], descending=[True, True]
    )


def q15_top_supplier(sf_dir: str, date_from: str = "1997-01-01"):
    """TPC-H Q15: the supplier(s) with maximum revenue in one quarter.

    Revenue per supplier is a keyed aggregate (supplier-cardinality rows);
    the max is a driver scalar over that aggregate; the winners attach their
    names from the broadcast supplier table.  The view/MAX subquery becomes
    aggregate → scalar → filter — no self-join."""
    import datetime as dt

    lo = dt.datetime.fromisoformat(date_from)
    hi_month = lo.month + 3
    hi = lo.replace(
        year=lo.year + (hi_month - 1) // 12, month=(hi_month - 1) % 12 + 1
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi)),
        )
        b = b.filter(m)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"s_suppkey": b["l_suppkey"], "revenue": rev})

    per_supp = (
        _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("revenue"))
        .materialize()
    )
    best = per_supp.max("sum(revenue)")
    winners = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b["sum(revenue)"], pa.scalar(best))),
        batch_format="pyarrow",
    )
    from scrupyst_ray.pipelines.joins import attach_by_key

    named = attach_by_key(
        winners,
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey",
        "s_name",
    )
    return named.map_batches(
        lambda b: _round_cols(
            pa.table(
                {
                    "s_suppkey": b["s_suppkey"],
                    "s_name": b["s_name"],
                    "total_revenue": b["sum(revenue)"],
                }
            ),
            {"total_revenue": 2},
        ),
        batch_format="pyarrow",
    ).sort("s_suppkey")


def q8_market_share(
    sf_dir: str,
    ptype: str = "PROMO",
    nation: str = "NATION_7",
    region: str = "ASIA",
):
    """TPC-H Q8: *nation*'s share of *region*-customer revenue for parts of
    one type, per order year.

    All dimension edges (part-type keys, supplier nation, customer nation ∈
    region) broadcast; the single big⨝big edge — filtered lineitem ⨝
    filtered orders — is the distributed hash join.  The share is a ratio of
    two per-year sums (one CASE-masked), finished on the 2-row aggregate."""
    import datetime as dt

    from scrupyst_ray.pipelines.joins import (
        attach_by_key,
        collect_table,
        rename,
    )

    nat = collect_table(_read(sf_dir, "nation"))
    reg = collect_table(_read(sf_dir, "region"))
    rkeys = {
        k
        for k, name in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if name == region
    }
    region_nat = pa.array(
        [
            k
            for k, rk in zip(
                nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()
            )
            if rk in rkeys
        ],
        pa.int64(),
    )
    nation_key = dict(
        zip(nat["n_name"].to_pylist(), nat["n_nationkey"].to_pylist())
    )[nation]

    part_keys_t = collect_table(
        _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            lambda b: b.filter(pc.equal(b["p_type"], pa.scalar(ptype))).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
    )
    part_keys = ray.put(part_keys_t["p_partkey"].combine_chunks())
    supp_ref = broadcast_lookup(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey",
        "s_nationkey",
    )

    lo = dt.datetime(1996, 1, 1)
    hi = dt.datetime(1998, 1, 1)

    # region customers' (custkey → nationkey), attached onto 2-year orders
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pc.is_in(b["c_nationkey"], value_set=region_nat)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: (
            lambda f: pa.table(
                {
                    "o_orderkey": f["o_orderkey"],
                    "o_custkey": f["o_custkey"],
                    "o_year": pc.year(f["o_orderdate"]),
                }
            )
        )(
            b.filter(
                pc.and_(
                    pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)),
                )
            )
        ),
        batch_format="pyarrow",
    )
    orders = dist_join(
        orders,
        rename(cust, ["__c_custkey"]),
        "inner",
        ("o_custkey",),
        ("__c_custkey",),
    )

    def li_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=ray.get(part_keys)))
        b = attach_from_lookup(b, "l_suppkey", "s_nationkey", supp_ref)
        vol = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        national = pc.if_else(
            pc.equal(
                pc.cast(b["s_nationkey"], pa.int64()),
                pa.scalar(nation_key, pa.int64()),
            ),
            vol,
            pa.scalar(0.0),
        )
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "volume": vol, "national": national}
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = dist_join(li, orders, "inner", ("l_orderkey",), ("o_orderkey",))
    agg = (
        joined.map_batches(
            lambda t: t.select(["o_year", "volume", "national"]),
            batch_format="pyarrow",
        )
        .groupby("o_year")
        .aggregate(Sum("national"), Sum("volume"))
    )

    def finish(b: pa.Table) -> pa.Table:
        share = pc.divide(b["sum(national)"], b["sum(volume)"])
        return _round_cols(
            pa.table(
                {
                    "o_year": pc.cast(b["o_year"], pa.int64()),
                    "mkt_share": share,
                }
            ),
            {"mkt_share": 6},
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("o_year")


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#11"):
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (quantity < 20% of the part's average) of one brand went unfilled.

    The correlated AVG subquery becomes a two-pass plan: pass 1 is a
    per-part keyed mean over the brand's lineitems; pass 2 re-streams the
    same rows, attaches the mean (size-selected join) and sums the
    qualifying prices.  Quantity means are exact (integer-valued doubles),
    so the < threshold compare matches SQL bit-for-bit."""
    from scrupyst_ray.pipelines.joins import attach_by_key, collect_table, rename

    pk = collect_table(
        _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
            lambda b: b.filter(pc.equal(b["p_brand"], pa.scalar(brand))).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
    )
    keys = ray.put(pk["p_partkey"].combine_chunks())

    def li_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["l_partkey"], value_set=ray.get(keys)))

    def li(cols):
        return _read(sf_dir, "lineitem", cols).map_batches(
            li_filter, batch_format="pyarrow"
        )

    avg_qty = rename(
        li(["l_partkey", "l_quantity"]).groupby("l_partkey").aggregate(
            Mean("l_quantity")
        ),
        ["l_partkey", "avg_qty"],
    )
    priced = attach_by_key(
        li(["l_partkey", "l_quantity", "l_extendedprice"]),
        avg_qty,
        "l_partkey",
        "avg_qty",
    )
    small = priced.map_batches(
        lambda b: b.filter(
            pc.less(b["l_quantity"], pc.multiply(b["avg_qty"], pa.scalar(0.2)))
        ).select(["l_extendedprice"]),
        batch_format="pyarrow",
    )
    total = small.sum("l_extendedprice")
    out = pa.table({"avg_yearly": pa.array([(total or 0.0) / 7.0], pa.float64())})
    return _round_cols(out, {"avg_yearly": 2})


# Q19 disjunct grid: (brand, max p_size, qty lo, qty hi) — brands are
# disjoint so each part maps to at most one quantity window.
_Q19_DISJUNCTS = [
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#3", 15, 20.0, 30.0),
]


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19: revenue from three OR'd (brand, size, quantity-window)
    predicates.

    The disjunction is evaluated ONCE on the part table (driver-side tiny)
    to produce a partkey → (qty_lo, qty_hi) window map; lineitem then needs
    a single broadcast lookup + one vectorized between-mask per batch —
    the OR never touches the big side."""
    from scrupyst_ray.pipelines.joins import collect_table

    part = collect_table(_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]))
    pkeys, plo, phi = [], [], []
    for k, brand, size in zip(
        part["p_partkey"].to_pylist(),
        part["p_brand"].to_pylist(),
        part["p_size"].to_pylist(),
    ):
        for b_, smax, qlo, qhi in _Q19_DISJUNCTS:
            if brand == b_ and 1 <= size <= smax:
                pkeys.append(k)
                plo.append(qlo)
                phi.append(qhi)
                break
    ref = ray.put(
        (
            pa.array(pkeys, pa.int64()),
            pa.array(plo, pa.float64()),
            pa.array(phi, pa.float64()),
        )
    )

    def prep(b: pa.Table) -> pa.Table:
        keys, lo, hi = ray.get(ref)
        idx = pc.index_in(b["l_partkey"], value_set=keys)
        qlo = pc.take(lo, idx)
        qhi = pc.take(hi, idx)
        m = pc.and_(
            pc.greater_equal(b["l_quantity"], qlo),
            pc.less_equal(b["l_quantity"], qhi),
        )
        m = pc.fill_null(m, False)
        b = b.filter(m)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table({"revenue": rev})

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(prep, batch_format="pyarrow")
    total = ds.sum("revenue")
    return _round_cols(
        pa.table({"revenue": pa.array([total or 0.0], pa.float64())}),
        {"revenue": 2},
    )


def _supplier_keys_in_region(sf_dir: str, region: str) -> pa.Array:
    """Suppkeys of suppliers whose nation lies in *region* (dimension-only:
    supplier/nation/region are all broadcast-sized)."""
    from scrupyst_ray.pipelines.joins import collect_table

    nat = collect_table(_read(sf_dir, "nation"))
    reg = collect_table(_read(sf_dir, "region"))
    rkeys = {
        k
        for k, name in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if name == region
    }
    nkeys = {
        k
        for k, rk in zip(
            nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()
        )
        if rk in rkeys
    }
    supp = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    return pa.array(
        [
            k
            for k, nk in zip(
                supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()
            )
            if nk in nkeys
        ],
        pa.int64(),
    )


def q2_min_cost_supplier(
    sf_dir: str,
    size_lo: int = 10,
    size_hi: int = 20,
    ptype: str = "LARGE",
    region: str = "EUROPE",
):
    """TPC-H Q2 shape (no PARTSUPP table — supply cost is re-grounded as
    ``min(l_extendedprice)`` observed per (part, supplier) in lineitem):
    for each part of one size+type, the *region* supplier(s) offering the
    minimum cost, ranked by supplier balance.

    The correlated MIN subquery becomes: (part,supp)-keyed MIN aggregate →
    part-keyed MIN aggregate → size-selected equality join back.  MIN over
    doubles is order-free, so the equality compare is exact on both
    engines."""
    from scrupyst_ray.pipelines.joins import (
        attach_by_key,
        collect_table,
        rename,
    )

    part = collect_table(
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_type"])
    )
    sel = [
        (k, n)
        for k, n, s, t in zip(
            part["p_partkey"].to_pylist(),
            part["p_name"].to_pylist(),
            part["p_size"].to_pylist(),
            part["p_type"].to_pylist(),
        )
        if size_lo <= s <= size_hi and t == ptype
    ]
    part_keys = ray.put(pa.array([k for k, _ in sel], pa.int64()))
    part_names = dict(sel)
    supp_keys = ray.put(_supplier_keys_in_region(sf_dir, region))

    def li_prep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_in(b["l_partkey"], value_set=ray.get(part_keys)),
                pc.is_in(b["l_suppkey"], value_set=ray.get(supp_keys)),
            )
        )
        return b.select(["l_partkey", "l_suppkey", "l_extendedprice"])

    from ray.data.aggregate import Min

    offers = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_prep, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("l_extendedprice"))
    )
    offers = rename(offers, ["l_partkey", "l_suppkey", "supply_cost"]).materialize()
    best = rename(
        offers.groupby("l_partkey").aggregate(Min("supply_cost")),
        ["l_partkey", "best_cost"],
    )
    winners = attach_by_key(offers, best, "l_partkey", "best_cost").map_batches(
        lambda b: b.filter(pc.equal(b["supply_cost"], b["best_cost"])).drop_columns(
            ["best_cost"]
        ),
        batch_format="pyarrow",
    )

    supp = collect_table(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    )
    nat_names = _nation_names(sf_dir)
    s_name = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist()))
    s_bal = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_acctbal"].to_pylist()))
    s_nat = dict(
        zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist())
    )

    def finish(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_pylist()
        out = pa.table(
            {
                "s_acctbal": pa.array([s_bal[k] for k in sk], pa.float64()),
                "s_name": pa.array([s_name[k] for k in sk], pa.string()),
                "n_name": pa.array([nat_names[s_nat[k]] for k in sk], pa.string()),
                "p_partkey": b["l_partkey"],
                "p_name": pa.array(
                    [part_names[k] for k in b["l_partkey"].to_pylist()], pa.string()
                ),
                "supply_cost": b["supply_cost"],
                "bal_sort": pa.array(
                    [-s_bal[k] for k in sk], pa.float64()
                ),
            }
        )
        return out

    out = (
        winners.map_batches(finish, batch_format="pyarrow")
        .sort(["bal_sort", "n_name", "s_name", "p_partkey"])
        .limit(100)
    )
    return out.map_batches(
        lambda b: _round_cols(
            b.drop_columns(["bal_sort"]), {"s_acctbal": 2, "supply_cost": 2}
        ),
        batch_format="pyarrow",
    )


def q11_important_parts(
    sf_dir: str, nation: str = "NATION_3", mult: float = 1.5
):
    """TPC-H Q11 shape (no PARTSUPP — a part's "stock value" held by
    *nation* is re-grounded as the sum of that nation's suppliers' lineitem
    extendedprice for the part): parts whose value exceeds *mult* × the
    nation's MEAN per-part value (spec uses a fixed fraction of the total,
    which degenerates to ∅ as part count grows; the mean-multiple keeps the
    heavy-tail semantics scale-invariant).

    The HAVING > scalar-subquery becomes a part-keyed SUM aggregate gated by
    a driver scalar (the same aggregate averaged once more)."""
    from scrupyst_ray.pipelines.joins import collect_table, rename

    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nkey = dict(zip(nat["n_name"].to_pylist(), nat["n_nationkey"].to_pylist()))[
        nation
    ]
    supp = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    skeys = ray.put(
        pa.array(
            [
                k
                for k, nk in zip(
                    supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()
                )
                if nk == nkey
            ],
            pa.int64(),
        )
    )

    per_part = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(
            lambda b: b.filter(
                pc.is_in(b["l_suppkey"], value_set=ray.get(skeys))
            ).select(["l_partkey", "l_extendedprice"]),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .aggregate(Sum("l_extendedprice"))
    )
    per_part = rename(per_part, ["p_partkey", "value"]).materialize()
    cut = (per_part.mean("value") or 0.0) * mult
    out = per_part.map_batches(
        lambda b: b.filter(pc.greater(b["value"], pa.scalar(cut))),
        batch_format="pyarrow",
    ).sort(["value", "p_partkey"], descending=[True, False])
    return out.map_batches(
        lambda b: _round_cols(b, {"value": 2}), batch_format="pyarrow"
    )


def q16_part_supplier_counts(
    sf_dir: str,
    exclude_brand: str = "Brand#5",
    exclude_type: str = "PROMO",
    sizes: tuple = (1, 5, 9, 13, 17, 21, 25, 29),
):
    """TPC-H Q16 shape (no PARTSUPP — "can supply" is re-grounded as "has a
    lineitem for the part"): distinct supplier counts per (brand, type,
    size) over filtered parts, excluding negative-balance suppliers (the
    "customer complaints" NOT IN analog).

    COUNT(DISTINCT) distributes as: dedup (brand,type,size,suppkey) keys via
    a first groupby (per-batch combiners shrink the shuffle), then a COUNT
    per (brand,type,size)."""
    from scrupyst_ray.pipelines.joins import collect_table, rename

    part = collect_table(
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    )
    size_set = set(sizes)
    sel = {
        k: (b_, t, s)
        for k, b_, t, s in zip(
            part["p_partkey"].to_pylist(),
            part["p_brand"].to_pylist(),
            part["p_type"].to_pylist(),
            part["p_size"].to_pylist(),
        )
        if b_ != exclude_brand and t != exclude_type and s in size_set
    }
    pk = ray.put(pa.array(list(sel), pa.int64()))
    supp = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]))
    bad = ray.put(
        pa.array(
            [
                k
                for k, bal in zip(
                    supp["s_suppkey"].to_pylist(), supp["s_acctbal"].to_pylist()
                )
                if bal < 0
            ],
            pa.int64(),
        )
    )
    attrs = ray.put(
        (
            pa.array(list(sel), pa.int64()),
            pa.array([v[0] for v in sel.values()], pa.string()),
            pa.array([v[1] for v in sel.values()], pa.string()),
            pa.array([v[2] for v in sel.values()], pa.int32()),
        )
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(b["l_partkey"], value_set=ray.get(pk)),
            pc.invert(pc.is_in(b["l_suppkey"], value_set=ray.get(bad))),
        )
        b = b.filter(m)
        keys, brands, types, sz = ray.get(attrs)
        idx = pc.index_in(b["l_partkey"], value_set=keys)
        t = pa.table(
            {
                "p_brand": pc.take(brands, idx),
                "p_type": pc.take(types, idx),
                "p_size": pc.cast(pc.take(sz, idx), pa.int64()),
                "s_suppkey": b["l_suppkey"],
            }
        )
        # per-batch combiner: distinct quads only leave the task
        return t.group_by(["p_brand", "p_type", "p_size", "s_suppkey"]).aggregate([])

    quads = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
        .aggregate(Count())
    )
    counts = (
        quads.map_batches(
            lambda b: b.select(["p_brand", "p_type", "p_size"]),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count())
    )
    return rename(
        counts, ["p_brand", "p_type", "p_size", "supplier_cnt"]
    ).sort(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        descending=[True, False, False, False],
    )


def q20_excess_suppliers(
    sf_dir: str, color: str = "red", nation: str = "NATION_3", year: int = 1997
):
    """TPC-H Q20 shape (no PARTSUPP — "excess availability" is re-grounded
    on shipment history): *nation* suppliers who, for some part named
    ``<color> …``, shipped more than half their lifetime quantity of that
    part during *year* alone.

    The nested semi-join chain distributes as: partkey broadcast filter →
    (supp, part)-keyed twin SUM aggregate (lifetime + CASE-masked year) →
    ratio filter (exact: integer-valued quantities) → distinct-suppkey
    semi-join against the nation's broadcast supplier list."""
    import datetime as dt

    from scrupyst_ray.pipelines.joins import collect_table, rename

    part = collect_table(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    pk = ray.put(
        pa.array(
            [
                k
                for k, n in zip(
                    part["p_partkey"].to_pylist(), part["p_name"].to_pylist()
                )
                if n.startswith(color + " ")
            ],
            pa.int64(),
        )
    )
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nkey = dict(zip(nat["n_name"].to_pylist(), nat["n_nationkey"].to_pylist()))[
        nation
    ]
    supp = collect_table(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    )
    nation_supp = {
        k: n
        for k, n, nk in zip(
            supp["s_suppkey"].to_pylist(),
            supp["s_name"].to_pylist(),
            supp["s_nationkey"].to_pylist(),
        )
        if nk == nkey
    }
    nation_keys = ray.put(pa.array(list(nation_supp), pa.int64()))
    lo = dt.datetime(year, 1, 1)
    hi = dt.datetime(year + 1, 1, 1)

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(b["l_partkey"], value_set=ray.get(pk)),
            pc.is_in(b["l_suppkey"], value_set=ray.get(nation_keys)),
        )
        b = b.filter(m)
        in_year = pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi)),
        )
        return pa.table(
            {
                "l_suppkey": b["l_suppkey"],
                "l_partkey": b["l_partkey"],
                "qty": b["l_quantity"],
                "qty_year": pc.if_else(in_year, b["l_quantity"], pa.scalar(0.0)),
            }
        )

    per_sp = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Sum("qty"), Sum("qty_year"))
    )
    excess = per_sp.map_batches(
        lambda b: b.filter(
            pc.greater(b["sum(qty_year)"], pc.multiply(b["sum(qty)"], pa.scalar(0.5)))
        ).select(["l_suppkey"]),
        batch_format="pyarrow",
    )
    distinct = excess.groupby("l_suppkey").aggregate(Count())

    def finish(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_pylist()
        return pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pa.array([nation_supp[k] for k in sk], pa.string()),
            }
        )

    return distinct.map_batches(finish, batch_format="pyarrow").sort("s_suppkey")
