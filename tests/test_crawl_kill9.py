"""Hard-kill (SIGKILL) mid-round, then resume — the strongest form of the
resumability claim: every file write is tmp+rename and a round without a
MANIFEST re-runs from its frontier, so a kill at ANY instant must resume to
a bit-identical artifact (crawl.py module docstring; FIXTURES.md §5).

The boundary-"kill" tests (test_crawl_e2e) stop the engine BETWEEN rounds;
this one SIGKILLs a CLI subprocess the moment a round directory appears —
landing inside the round's execution with partial files on disk."""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq


def _order(wd: str):
    from scrupyst_ray.pipelines.crawl import CrawlResult

    t = CrawlResult(wd, [], "").crawl_order_table()
    return list(zip(t["round"].to_pylist(), t["url"].to_pylist()))


def _seen(wd: str) -> set[bytes]:
    fps: set[bytes] = set()
    for f in glob.glob(os.path.join(wd, "seen", "*", "round=*.parquet")):
        fps.update(pq.read_table(f)["fp"].to_pylist())
    return fps


def _cli(pages: str, seeds: str, wd: str, rounds: int) -> list[str]:
    return [
        sys.executable,
        "-m",
        "scrupyst_ray",
        "crawl",
        "--pages",
        pages,
        "--seeds",
        seeds,
        "--workdir",
        wd,
        "--max-rounds",
        str(rounds),
    ]


def test_sigkill_mid_round_resumes_identically(smoke_corpus, tmp_path):
    pages = os.path.join(smoke_corpus, "pages")
    seeds = os.path.join(smoke_corpus, "seeds.parquet")
    env = dict(os.environ, RAY_ADDRESS="local")

    # clean reference run
    full_wd = str(tmp_path / "full")
    subprocess.run(
        _cli(pages, seeds, full_wd, 5),
        env=env,
        check=True,
        capture_output=True,
        timeout=180,
    )

    # victim run: SIGKILL the moment round 2's directory appears (round 2
    # is then in flight — its MANIFEST is written last, so partial files
    # without a manifest are on disk)
    kill_wd = str(tmp_path / "killed")
    proc = subprocess.Popen(
        _cli(pages, seeds, kill_wd, 5),
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    target = os.path.join(kill_wd, "rounds", "round-000002")
    deadline = time.monotonic() + 120
    killed_mid_run = False
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume is a no-op below
        if os.path.isdir(target):
            os.kill(proc.pid, signal.SIGKILL)
            killed_mid_run = True
            break
        time.sleep(0.01)
    proc.wait(timeout=60)
    assert killed_mid_run, "crawl finished before the kill window — slow the corpus down"
    # round 2 must NOT be committed (manifest written last)
    assert not os.path.exists(os.path.join(target, "MANIFEST.json"))

    # resume with the same CLI command (run-or-resume)
    subprocess.run(
        _cli(pages, seeds, kill_wd, 5),
        env=env,
        check=True,
        capture_output=True,
        timeout=180,
    )

    assert _order(kill_wd) == _order(full_wd) != []
    assert _seen(kill_wd) == _seen(full_wd) != set()
