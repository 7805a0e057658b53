"""As-of join: hand-built event logs with exactly known prior-event answers."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

T0 = dt.datetime(2024, 1, 1)


def _write_events(path: str, rows: list[tuple[int, int, int, str]]) -> str:
    """rows = (event_id, seconds_after_t0, user_id, event_type)."""
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [T0 + dt.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(path, "events.parquet"),
    )
    return path


@pytest.mark.usefixtures("ray_session")
class TestAsofPriorEvent:
    def test_latest_prior_click_per_user(self, tmp_path):
        sf = _write_events(
            str(tmp_path),
            [
                (0, 10, 1, "click"),
                (1, 20, 1, "click"),
                (2, 30, 1, "purchase"),  # → click 1, gap 10s
                (3, 25, 2, "click"),
                (4, 24, 2, "purchase"),  # click at 25 is AFTER → no match
                (5, 25, 3, "purchase"),  # user 3 has no clicks at all
                (6, 40, 1, "purchase"),  # → still click 1 (latest ≤ 40)
            ],
        )
        from scrupyst_ray.pipelines.relational import asof_prior_event

        rows = asof_prior_event(sf).take_all()
        got = {
            r["event_id"]: (r["prior_event_id"], r["gap_us"]) for r in rows
        }
        assert got == {
            2: (1, 10_000_000),
            4: (None, None),
            5: (None, None),
            6: (1, 20_000_000),
        }

    def test_equal_timestamp_matches(self, tmp_path):
        # ts >= semantics: a click at the same microsecond matches
        sf = _write_events(
            str(tmp_path), [(0, 5, 1, "click"), (1, 5, 1, "purchase")]
        )
        from scrupyst_ray.pipelines.relational import asof_prior_event

        rows = asof_prior_event(sf).take_all()
        assert rows == [
            {"event_id": 1, "user_id": 1, "prior_event_id": 0, "gap_us": 0}
        ]

    def test_other_event_types_ignored(self, tmp_path):
        sf = _write_events(
            str(tmp_path),
            [
                (0, 1, 1, "signup"),
                (1, 2, 1, "error"),
                (2, 3, 1, "purchase"),
            ],
        )
        from scrupyst_ray.pipelines.relational import asof_prior_event

        rows = asof_prior_event(sf).take_all()
        assert rows[0]["prior_event_id"] is None


@pytest.mark.usefixtures("ray_session")
class TestClicksBeforePurchase:
    def test_window_bounds_half_open(self, tmp_path):
        sf = _write_events(
            str(tmp_path),
            [
                (0, 0, 1, "click"),     # exactly window_s before → EXCLUDED
                (1, 100, 1, "click"),   # inside
                (2, 300, 1, "click"),   # at the purchase instant → EXCLUDED
                (3, 300, 1, "purchase"),
                (4, 299, 2, "purchase"),  # user 2 has no clicks
            ],
        )
        from scrupyst_ray.pipelines.relational import clicks_before_purchase

        rows = clicks_before_purchase(sf, window_s=300).take_all()
        got = {r["event_id"]: r["n_clicks"] for r in rows}
        assert got == {3: 1, 4: 0}

    def test_counts_only_same_user(self, tmp_path):
        sf = _write_events(
            str(tmp_path),
            [
                (0, 10, 1, "click"),
                (1, 10, 2, "click"),
                (2, 11, 2, "click"),
                (3, 20, 2, "purchase"),
            ],
        )
        from scrupyst_ray.pipelines.relational import clicks_before_purchase

        rows = clicks_before_purchase(sf).take_all()
        assert rows == [{"event_id": 3, "user_id": 2, "n_clicks": 2}]
