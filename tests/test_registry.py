"""Pluggable-class registry tests — mirrors the reference's load_object /
build_component_list contracts (``tests/test_utils_misc/__init__.py`` and
``tests/test_utils_conf.py`` scenarios, re-expressed for this engine)."""

import pytest

from scrupyst_ray.registry import (
    build_component_list,
    class_from_settings,
    components_from_settings,
    instantiate,
    load_object,
)


class TestLoadObject:
    def test_dotted_path(self):
        from scrupyst_ray.functions.fingerprint import fingerprint

        assert (
            load_object("scrupyst_ray.functions.fingerprint.fingerprint")
            is fingerprint
        )

    def test_callable_passthrough(self):
        assert load_object(len) is len

    def test_not_full_path(self):
        with pytest.raises(ValueError, match="not a full path"):
            load_object("justaname")

    def test_missing_module(self):
        with pytest.raises(ImportError):
            load_object("scrupyst_ray.nosuchmod.X")

    def test_missing_attr(self):
        with pytest.raises(NameError, match="doesn't define"):
            load_object("scrupyst_ray.registry.NoSuchThing")

    def test_non_callable_non_string(self):
        with pytest.raises(TypeError):
            load_object(42)


class TestComponentList:
    def test_priority_order_and_disable(self):
        comps = build_component_list(
            {
                "scrupyst_ray.functions.fingerprint.fingerprint": 200,
                "scrupyst_ray.functions.hashing.stable_hash64": 100,
                "scrupyst_ray.functions.urlnorm.safe_url_string": None,
            }
        )
        from scrupyst_ray.functions.fingerprint import fingerprint
        from scrupyst_ray.functions.hashing import stable_hash64

        assert comps == [stable_hash64, fingerprint]

    def test_duplicate_rejected(self):
        from scrupyst_ray.functions.fingerprint import fingerprint

        with pytest.raises(ValueError, match="duplicate"):
            build_component_list(
                {
                    "scrupyst_ray.functions.fingerprint.fingerprint": 1,
                    fingerprint: 2,
                }
            )


class _FromSettings:
    def __init__(self, tag):
        self.tag = tag

    @classmethod
    def from_settings(cls, tag="fs"):
        return cls(tag)


class _Plain:
    def __init__(self, tag="plain"):
        self.tag = tag


class TestInstantiate:
    def test_from_settings_preferred(self):
        obj = instantiate(_FromSettings)
        assert isinstance(obj, _FromSettings) and obj.tag == "fs"

    def test_plain_class(self):
        assert instantiate(_Plain).tag == "plain"

    def test_instance_passthrough(self):
        inst = _Plain("x")
        assert instantiate(inst) is inst


class TestSettingsWiring:
    def test_class_from_settings_default(self):
        from scrupyst_ray.state.seen import SeenState

        cls = class_from_settings(
            {}, "DUPEFILTER_CLASS", default="scrupyst_ray.state.seen.SeenState"
        )
        assert cls is SeenState

    def test_class_from_settings_override(self):
        cls = class_from_settings(
            {"DUPEFILTER_CLASS": "tests.test_registry._Plain"},
            "DUPEFILTER_CLASS",
            default="scrupyst_ray.state.seen.SeenState",
        )
        # pytest imports this module twice (top-level and package path), so
        # compare by qualified name rather than object identity
        assert (cls.__module__, cls.__qualname__) == (
            "tests.test_registry",
            "_Plain",
        )

    def test_middleware_chain_runs_in_pipeline(self):
        """A string-keyed ITEM_PIPELINES settings dict builds a working
        MiddlewarePipeline chain (the registry is how a driver ships the
        chain to workers without pickling instances)."""
        import pyarrow as pa

        from scrupyst_ray.stages.middleware import MiddlewarePipeline

        settings = {
            "ITEM_PIPELINES": {
                "tests.test_registry.DropShort": 100,
                "tests.test_registry.AddLen": 200,
                "tests.test_registry.Disabled": None,
            }
        }
        chain = components_from_settings(settings, "ITEM_PIPELINES")
        assert len(chain) == 2
        mw = MiddlewarePipeline(chain)
        t = pa.table({"text": ["ab", "abcdef", "xyzzy"]})
        out = mw.run("process_items", t)
        assert out["text"].to_pylist() == ["abcdef", "xyzzy"]
        assert out["n"].to_pylist() == [6, 5]


class TestFromSettings:
    def test_reference_setting_names_and_addons_compose(self):
        from scrupyst_ray.config import CrawlConfig

        settings = {
            "DOWNLOAD_DELAY": 2.0,
            "DEPTH_LIMIT": 3,
            "ROBOTSTXT_OBEY": False,
            "ALLOWED_DOMAINS": ["example.test"],
            "ITEM_PIPELINES": {"tests.test_registry.AddLen": 100},
            "ADDONS": {"tests.test_registry.DelayBump": 100},
            "UNKNOWN_SETTING": "ignored",
        }
        cfg = CrawlConfig.from_settings(settings)
        # the addon ran first and bumped the delay
        assert cfg.download_delay == 3.5
        assert cfg.depth_limit == 3 and cfg.robotstxt_obey is False
        assert cfg.allowed_domains == ["example.test"]
        assert len(cfg.middlewares) == 1


class DelayBump:
    def update_settings(self, settings):
        settings["DOWNLOAD_DELAY"] = settings.get("DOWNLOAD_DELAY", 0) + 1.5


class TestAddons:
    def test_addons_update_settings_in_priority_order(self):
        from scrupyst_ray.registry import apply_addons

        settings = {
            "ADDONS": {
                "tests.test_registry.AddonB": 200,
                "tests.test_registry.AddonA": 100,
                "tests.test_registry.AddonOff": 150,
            },
            "trace": [],
        }
        enabled = apply_addons(settings)
        # ascending priority; NotConfigured addon skipped
        assert settings["trace"] == ["A", "B"]
        assert len(enabled) == 2


class AddonA:
    def update_settings(self, settings):
        settings["trace"].append("A")


class AddonB:
    def update_settings(self, settings):
        settings["trace"].append("B")


class AddonOff:
    def update_settings(self, settings):
        from scrupyst_ray.registry import NotConfigured

        raise NotConfigured("disabled in this environment")


class DropShort:
    def process_items(self, table, ctx):
        import pyarrow.compute as pc

        return table.filter(pc.greater_equal(pc.utf8_length(table["text"]), 5))


class AddLen:
    def process_items(self, table, ctx):
        import pyarrow.compute as pc

        return table.append_column(
            "n", pc.cast(pc.utf8_length(table["text"]), "int64")
        )


class Disabled:
    def process_items(self, table, ctx):  # pragma: no cover
        raise AssertionError("disabled component must not run")
