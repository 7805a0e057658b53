"""User middleware chains (SURVEY §2.10): ordering semantics of the
reference's component priority dicts (scrapy/utils/conf.py:20-80,
core/downloader/middleware.py:34-43) re-expressed as batch transforms,
plus end-to-end wiring through the crawl engine's FetchParse stage."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from scrupyst_ray.stages.middleware import (
    MiddlewareContext,
    MiddlewarePipeline,
    build_component_list,
)


class Tagger:
    """Appends its tag to a log column on every hook it implements."""

    def __init__(self, tag, hooks=("process_candidates",)):
        self.tag = tag
        for h in hooks:
            setattr(self, h, self._apply)

    def _apply(self, table: pa.Table, ctx: MiddlewareContext) -> pa.Table:
        log = [s + self.tag for s in table["log"].to_pylist()]
        return table.set_column(
            table.column_names.index("log"), "log", pa.array(log, pa.string())
        )


def _t():
    return pa.table({"log": [""]})


class TestOrdering:
    def test_priority_sort_and_none_disables(self):
        a, b, c = object(), object(), object()
        assert build_component_list({a: 500, b: 100, c: None}) == [b, a]

    def test_insertion_order_breaks_ties(self):
        a, b = object(), object()
        assert build_component_list({a: 100, b: 100}) == [a, b]

    def test_bad_priority_raises(self):
        with pytest.raises(ValueError):
            build_component_list({object(): "high"})

    def test_request_side_ascending(self):
        # process_candidates runs low-priority-first (closer to engine last
        # on the way out; reference .append order)
        mw = MiddlewarePipeline({Tagger("a"): 200, Tagger("b"): 100})
        out = mw.run("process_candidates", _t())
        assert out["log"].to_pylist() == ["ba"]

    def test_response_side_descending(self):
        # process_fetched mirrors the reference appendleft: high priority
        # (outermost) runs first on the way back in
        mw = MiddlewarePipeline(
            {
                Tagger("a", ["process_fetched"]): 200,
                Tagger("b", ["process_fetched"]): 100,
            }
        )
        out = mw.run("process_fetched", _t())
        assert out["log"].to_pylist() == ["ab"]

    def test_empty_pipeline_is_falsy_noop(self):
        mw = MiddlewarePipeline()
        assert not mw
        t = _t()
        assert mw.run("process_edges", t) is t

    def test_non_table_return_raises(self):
        class Bad:
            def process_items(self, table, ctx):
                return None

        mw = MiddlewarePipeline({Bad(): 0})
        with pytest.raises(TypeError):
            mw.run("process_items", _t())

    def test_empty_table_short_circuits(self):
        calls = []

        class Drop:
            def process_candidates(self, table, ctx):
                calls.append("drop")
                return table.slice(0, 0)

        class After:
            def process_candidates(self, table, ctx):
                calls.append("after")
                return table

        mw = MiddlewarePipeline({Drop(): 0, After(): 1})
        out = mw.run("process_candidates", _t())
        assert out.num_rows == 0
        assert calls == ["drop"]


@pytest.mark.usefixtures("ray_session")
def test_engine_wiring(smoke_corpus, tmp_path):
    """A candidate-blocking middleware keeps its URL out of the crawl and
    its counters reach RoundStats.mw_counts via the fetch sidecars."""
    import pyarrow.parquet as pq

    from scrupyst_ray.config import CrawlConfig
    from scrupyst_ray.pipelines.crawl import CrawlEngine

    class BlockPage:
        """Downloader-mw analogue: drop one exact URL pre-fetch + count it.

        Defined inside the test so cloudpickle ships it by value (a real
        user's component would live in an importable module)."""

        def __init__(self, url):
            self.url = url

        def process_candidates(self, table, ctx):
            mask = pc.not_equal(table["url"], self.url)
            dropped = table.num_rows - pc.sum(mask).as_py()
            if dropped:
                ctx.inc("blockpage/dropped", dropped)
            return table.filter(mask)

    seeds = pq.read_table(os.path.join(smoke_corpus, "seeds.parquet"))
    blocked = seeds.sort_by("seq")["url"][0].as_py()
    cfg = CrawlConfig(
        seen_shards=4,
        fetch_buckets=4,
        concurrent_requests_per_domain=4,
        middlewares={BlockPage(blocked): 100},
    )
    eng = CrawlEngine.for_corpus(
        os.path.join(smoke_corpus, "pages"), str(tmp_path / "wd"), cfg
    )
    eng.init_frontier(os.path.join(smoke_corpus, "seeds.parquet"))
    res = eng.run(max_rounds=3)
    eng.shutdown_actors()

    assert res.total_fetched > 0
    assert sum(r.mw_counts.get("blockpage/dropped", 0) for r in res.rounds) >= 1
    for rnd in res.rounds:
        fdir = os.path.join(
            str(tmp_path / "wd"), "rounds", f"round-{rnd.round:06d}", "fetched"
        )
        if not os.path.isdir(fdir):
            continue
        for f in os.listdir(fdir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(fdir, f), columns=["url"])
                assert blocked not in t["url"].to_pylist()
