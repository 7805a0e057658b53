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


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _edge_case(draw):
    host = draw(st.sampled_from(
        ["good.test", "sub.good.test", "evil.test", "x.y.test"]))
    path = draw(st.text(
        alphabet="abcdefgh/", min_size=0, max_size=60))
    scheme = draw(st.sampled_from(["http://", "https://", "mailto:", ""]))
    url = f"{scheme}{host}/{path}" if scheme.endswith("//") else scheme + path
    return (
        url,
        draw(st.booleans()),
        draw(st.integers(min_value=0, max_value=5)),
    )


@settings(max_examples=100, deadline=None)
@given(rows=st.lists(_edge_case(), min_size=1, max_size=12))
def test_filter_chain_matches_per_row_reference(rows):
    """Vectorized candidate_filter_reasons == the per-row reference
    precedence (nofollow → urllength → badurl → offsite → depth)."""
    from scrupyst_ray.functions.urlnorm import (
        host_is_from_any_domain,
        parse_host,
    )

    cfg = CrawlConfig(
        urllength_limit=30, depth_limit=3, allowed_domains=["good.test"]
    )

    def ref(url, nofollow, parent_depth):
        if nofollow:
            return DROP_NOFOLLOW
        if len(url) > 30:
            return DROP_URLLENGTH
        if not parse_host(url):
            return DROP_BADURL
        if not host_is_from_any_domain(url, ["good.test"]):
            return DROP_OFFSITE
        if parent_depth + 1 > 3:
            return DROP_DEPTH
        return KEEP

    reason, _, _ = candidate_filter_reasons(_edges(rows), cfg)
    assert reason.tolist() == [ref(*r) for r in rows]
