"""Pluggable-class registry (X7/X6 in SURVEY.md §2.10) — the reference's
string-keyed component wiring re-expressed for the columnar engine.

Reference semantics reproduced:

- ``load_object(path)`` — ``scrapy/utils/misc.py:47-77``: resolve a dotted
  import path to the named object; non-string callables pass through.
- ``build_component_list(compdict)`` — ``scrapy/utils/conf.py:28-57``:
  a ``{path_or_class: priority}`` mapping (None ⇒ disabled) ordered by
  ascending priority, duplicate objects rejected.
- Class-name settings (``DUPEFILTER_CLASS``, ``REQUEST_FINGERPRINTER_CLASS``,
  ``SCHEDULER_*_QUEUE``, ``DOWNLOADER_MIDDLEWARES``, ``ITEM_PIPELINES`` … —
  ``scrapy/settings/default_settings.py:69-190``) become entries in a
  settings dict consumed by :func:`components_from_settings`, which builds
  the instantiated, priority-ordered chains that
  ``stages.middleware.MiddlewarePipeline`` runs inside ``map_batches``.

Keeping the registry string-keyed matters at cluster scale: a settings dict
of dotted paths is msgpack/JSON-serializable, so a driver can ship ONE small
config to every worker/actor instead of pickling live middleware instances
into each task closure.
"""

from __future__ import annotations

from importlib import import_module
from typing import Any


def load_object(path: Any) -> Any:
    """Resolve a dotted path (``pkg.mod.Name``) to the object it names.

    Mirrors the reference loader: callables (classes, functions) pass
    through unchanged; a path without a dot, a missing module, or a missing
    attribute raise ``ValueError`` / ``ImportError`` / ``NameError`` with
    the reference's messages.
    """
    if not isinstance(path, str):
        if callable(path):
            return path
        raise TypeError(
            f"Unexpected argument type, expected string or object, got: {type(path)}"
        )
    try:
        dot = path.rindex(".")
    except ValueError:
        raise ValueError(f"Error loading object '{path}': not a full path")
    module, name = path[:dot], path[dot + 1 :]
    mod = import_module(module)
    try:
        return getattr(mod, name)
    except AttributeError:
        raise NameError(f"Module '{module}' doesn't define any object named '{name}'")


def build_component_list(compdict: dict[Any, float | int | None]) -> list[Any]:
    """``{path_or_class: priority}`` → resolved objects ordered by ascending
    priority; ``None`` priority disables the entry (reference
    ``build_component_list`` semantics, ``utils/conf.py:28-57``).  String
    keys are resolved with :func:`load_object`; ordering (insertion-order
    tie-break included) is the middleware chain's."""
    from scrupyst_ray.stages.middleware import (
        build_component_list as _order_components,
    )

    resolved: dict[Any, float | None] = {}
    for key, prio in compdict.items():
        obj = load_object(key) if prio is not None else key
        if prio is not None and obj in resolved:
            raise ValueError(f"duplicate component: {key}")
        resolved[obj] = prio
    return _order_components(resolved)


def instantiate(cls_or_obj: Any, *args: Any, **kwargs: Any) -> Any:
    """Build an instance the reference way (``create_instance`` without the
    crawler machinery): classes with ``from_settings`` use it, plain classes
    are called, instances pass through."""
    if isinstance(cls_or_obj, type):
        fs = getattr(cls_or_obj, "from_settings", None)
        if fs is not None:
            return fs(*args, **kwargs)
        return cls_or_obj(*args, **kwargs)
    return cls_or_obj


def components_from_settings(
    settings: dict[str, Any], key: str, *init_args: Any, **init_kwargs: Any
) -> dict[Any, float]:
    """Instantiated ``{component: priority}`` chain for a middleware-style
    settings entry (``DOWNLOADER_MIDDLEWARES`` / ``SPIDER_MIDDLEWARES`` /
    ``ITEM_PIPELINES``), ready for ``MiddlewarePipeline``."""
    compdict: dict[Any, float | int | None] = dict(settings.get(key) or {})
    out: dict[Any, float] = {}
    for key_, prio in compdict.items():
        if prio is None:
            continue
        obj = instantiate(load_object(key_), *init_args, **init_kwargs)
        out[obj] = float(prio)
    return out


class NotConfigured(Exception):
    """An addon/component opts out of being enabled (reference
    ``scrapy/exceptions.py`` NotConfigured semantics)."""


def apply_addons(settings: dict[str, Any]) -> list[Any]:
    """Load the ``ADDONS`` setting (``{path_or_class: priority}``) and run
    each addon's ``update_settings(settings)`` in ascending-priority order
    (reference ``AddonManager.load_settings``, ``scrapy/addons.py:25-47``).
    An addon raising :class:`NotConfigured` is skipped.  Returns the enabled
    addon instances."""
    enabled: list[Any] = []
    for cls in build_component_list(dict(settings.get("ADDONS") or {})):
        try:
            addon = instantiate(cls)
            if hasattr(addon, "update_settings"):
                addon.update_settings(settings)
            enabled.append(addon)
        except NotConfigured:
            continue
    return enabled


def class_from_settings(
    settings: dict[str, Any], key: str, default: Any = None
) -> Any:
    """Resolve a single-class setting (``DUPEFILTER_CLASS``-style): the
    settings value wins, else *default* (itself a path or class)."""
    value = settings.get(key, default)
    if value is None:
        return None
    return load_object(value)
