"""M4/M5/M6 candidate filter chain: the shared ``candidate_filter_reasons``
kernel (precedence + each branch) and the driver-visible
``frontier_filter_decisions`` query built on it."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrupyst_ray.config import CrawlConfig
from scrupyst_ray.stages.frontier import (
    DROP_BADURL,
    DROP_DEPTH,
    DROP_NOFOLLOW,
    DROP_OFFSITE,
    DROP_URLLENGTH,
    EDGE_META_SCHEMA,
    KEEP,
    candidate_filter_reasons,
)


def _edges(rows):
    return pa.table(
        {
            "dst": pa.array([r[0] for r in rows], pa.string()),
            "nofollow": pa.array([r[1] for r in rows], pa.bool_()),
            "link_idx": pa.array([0] * len(rows), pa.int32()),
            "parent_depth": pa.array(
                [r[2] for r in rows], pa.int32()
            ),
            "parent_order_key": pa.array([b""] * len(rows), pa.binary()),
        },
        schema=EDGE_META_SCHEMA,
    )


class TestCandidateFilterReasons:
    CFG = CrawlConfig(
        urllength_limit=40,
        depth_limit=2,
        allowed_domains=["good.test"],
    )

    def test_each_branch_and_precedence(self):
        rows = [
            ("http://good.test/ok", False, 0),  # kept
            ("http://good.test/nf", True, 0),  # nofollow
            ("http://good.test/" + "x" * 40, True, 0),  # nofollow wins
            ("http://good.test/" + "x" * 40, False, 0),  # urllength
            ("mailto:a@b", False, 0),  # badurl
            ("http://evil.test/x", False, 0),  # offsite
            ("http://sub.good.test/x", False, 0),  # subdomain allowed
            ("http://good.test/deep", False, 2),  # depth 3 > 2
        ]
        reason, hosts, depths = candidate_filter_reasons(
            _edges(rows), self.CFG
        )
        assert reason.tolist() == [
            KEEP,
            DROP_NOFOLLOW,
            DROP_NOFOLLOW,
            DROP_URLLENGTH,
            DROP_BADURL,
            DROP_OFFSITE,
            KEEP,
            DROP_DEPTH,
        ]
        assert hosts.to_pylist()[0] == "good.test"
        assert depths.tolist() == [1, 1, 1, 1, 1, 1, 1, 3]

    def test_no_limits_keeps_everything_valid(self):
        cfg = CrawlConfig()
        rows = [("http://any.test/x", False, 5), ("http:///bad", False, 0)]
        reason, _, _ = candidate_filter_reasons(_edges(rows), cfg)
        assert reason.tolist() == [KEEP, DROP_BADURL]


def test_frontier_filter_decisions_distribution(ray_session):
    """Every decision class is exercised and the injected bad candidates
    land as badurl (full value parity vs SQL is the driver/validate gate)."""
    from collections import Counter

    from scrupyst_ray.pipelines.webops import frontier_filter_decisions

    t = frontier_filter_decisions("/root/testdata/sf0.001")
    rows = t.take_all()
    c = Counter(r["decision"] for r in rows)
    assert c["badurl"] == 2
    for k in ("kept", "nofollow", "urllength/filtered", "offsite/filtered",
              "depth/filtered"):
        assert c[k] >= 1, (k, c)
