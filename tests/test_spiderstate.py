"""ST7 spider-state persistence — reference ``extensions/spiderstate.py``
open/close round-trip, expressed against the engine's workdir."""

import os

from scrupyst_ray.state.spiderstate import SpiderState


class TestSpiderState:
    def test_fresh_state_is_empty(self, tmp_path):
        st = SpiderState(str(tmp_path))
        assert st.state == {}
        assert st.get("cursor") is None

    def test_roundtrip_across_instances(self, tmp_path):
        st = SpiderState(str(tmp_path))
        st["cursor"] = {"page": 7, "token": "abc"}
        st["count"] = 42
        st.save()
        st2 = SpiderState(str(tmp_path))
        assert st2["cursor"] == {"page": 7, "token": "abc"}
        assert st2["count"] == 42

    def test_save_is_atomic(self, tmp_path):
        st = SpiderState(str(tmp_path))
        st["k"] = "v"
        st.save()
        assert not os.path.exists(st.path + ".tmp")

    def test_engine_persists_state_across_resume(self, ray_session, smoke_corpus, tmp_path):
        from scrupyst_ray.config import CrawlConfig
        from scrupyst_ray.pipelines.crawl import CrawlEngine

        cfg = CrawlConfig(seen_shards=2, fetch_buckets=2)
        wd = str(tmp_path / "wd")
        eng = CrawlEngine.for_corpus(
            os.path.join(smoke_corpus, "pages"), wd, cfg
        )
        eng.init_frontier(os.path.join(smoke_corpus, "seeds.parquet"))
        eng.spider_state["notes"] = "first-run"
        eng.run(max_rounds=2)
        eng.shutdown_actors()

        eng2 = CrawlEngine.for_corpus(
            os.path.join(smoke_corpus, "pages"), wd, cfg
        )
        assert eng2.spider_state["notes"] == "first-run"
