"""Spider state (ST7) — JOBDIR-persisted user key/value dict, reference
``scrapy/extensions/spiderstate.py:18-52``.

The reference pickles ``spider.state`` into ``<JOBDIR>/spider.state`` on
close and restores it on open, so user callbacks can carry counters or
cursors across a kill/resume.  Here the workdir IS the jobdir; the engine
loads the dict at construction and persists it atomically (tmp+rename, like
every other checkpoint artifact) whenever :meth:`save` runs — the write is
idempotent and crash-safe, matching the engine's resume contract.

JSON is used instead of pickle: the state crosses the driver/worker
boundary in a multi-node deployment, and JSON keeps it language-neutral and
injection-safe (the reference's pickle is a single-process convenience).
Values must therefore be JSON-serializable — same restriction the reference
docs place on persistable spider state in practice.
"""

from __future__ import annotations

import json
import os
from typing import Any


class SpiderState:
    """A dict persisted in the crawl workdir across runs/resumes."""

    def __init__(self, workdir: str):
        self.path = os.path.join(workdir, "spider.state.json")
        self.state: dict[str, Any] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self.path)

    # dict-ish conveniences (spider.state usage shape)
    def __getitem__(self, k: str) -> Any:
        return self.state[k]

    def __setitem__(self, k: str, v: Any) -> None:
        self.state[k] = v

    def get(self, k: str, default: Any = None) -> Any:
        return self.state.get(k, default)
