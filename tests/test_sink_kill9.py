"""SIGKILL DURING the resumable partitioned sink write (round-5 verdict
item 6) — the companion to ``test_crawl_kill9``: that test kills inside a
crawl round; this one lands the kill inside ``stages/export.py::
write_partitioned`` itself, with some partitions already committed
(``_COMPLETE`` on disk) and at least one still in flight.

The helper subprocess writes a skewed dataset — seven small partitions plus
one deliberately heavy partition whose parquet write takes orders of
magnitude longer — so the small partitions' markers appear while the heavy
one is still writing.  The test SIGKILLs the moment two markers exist,
then re-runs the same job and asserts:

- the completed partitions were SKIPPED (same inode + mtime: the resume
  prune really prevented a rewrite, not just produced equal bytes);
- the resumed output is BYTE-identical, file for file, to an uninterrupted
  clean run (the sink sorts rows inside each partition, so output is
  deterministic regardless of block arrival order — the module's
  "re-written output is byte-deterministic" claim, now kill-tested);
- the resume manifest contains only the partitions that were unfinished at
  kill time.
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

_HELPER = r"""
import json, os, sys, time
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import pyarrow as pa
import ray.data

from scrupyst_ray.stages.export import write_partitioned

out = sys.argv[1]
rows = []
for i in range(70):  # seven quick partitions
    rows.append({"uid": i, "key": f"s{i % 7}", "payload": "x" * 64})
for i in range(9000):  # one heavy partition: ~90 MB of parquet pages —
    # must outlast the small writes even when scheduled in the first wave
    rows.append({"uid": 1000 + i, "key": "zbig",
                 "payload": ("%06d" % i) * 1700})
ds = ray.data.from_items(rows).repartition(8)
manifest = write_partitioned(ds, out, "key")
print("MANIFEST" + json.dumps(sorted(k for k, _, _ in manifest)))
ray.shutdown()
"""


def _run(tmp_path, name: str):
    script = tmp_path / "sink_job.py"
    script.write_text(_HELPER)
    out = str(tmp_path / name)
    env = dict(os.environ, RAY_ADDRESS="local", PYTHONPATH=os.getcwd())
    return out, [sys.executable, str(script), out], env


def _digests(out: str) -> dict[str, str]:
    got = {}
    for d in sorted(os.listdir(out)):
        p = os.path.join(out, d, "part.parquet")
        assert os.path.exists(os.path.join(out, d, "_COMPLETE")), d
        got[d] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return got


def test_sigkill_mid_sink_write_resumes_identically(tmp_path):
    # clean reference run
    clean_out, cmd, env = _run(tmp_path, "clean")
    subprocess.run(cmd, env=env, check=True, capture_output=True, timeout=300)

    # victim run: kill as soon as TWO partitions have committed (the heavy
    # 'big' partition is still writing then — its parquet is ~3 orders of
    # magnitude more bytes than a small one)
    kill_out, cmd, env = _run(tmp_path, "killed")
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    deadline = time.monotonic() + 240
    killed_mid_sink = False
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            break  # job finished before 2 markers — see assert below
        done = (
            [
                d
                for d in os.listdir(kill_out)
                if os.path.exists(os.path.join(kill_out, d, "_COMPLETE"))
            ]
            if os.path.isdir(kill_out)
            else []
        )
        if len(done) >= 2:
            os.kill(proc.pid, signal.SIGKILL)
            killed_mid_sink = True
            break
        time.sleep(0.001)
    proc.wait(timeout=60)
    assert killed_mid_sink, "sink finished before the kill window"
    completed_at_kill = {
        d
        for d in os.listdir(kill_out)
        if os.path.exists(os.path.join(kill_out, d, "_COMPLETE"))
    }
    assert "key=zbig" not in completed_at_kill, (
        "heavy partition finished first — skew the helper heavier"
    )
    pre_stat = {
        d: os.stat(os.path.join(kill_out, d, "part.parquet"))
        for d in completed_at_kill
    }

    # resume: same command, same output dir
    res = subprocess.run(
        cmd, env=env, check=True, capture_output=True, timeout=300, text=True
    )
    manifest_line = [
        ln for ln in res.stdout.splitlines() if ln.startswith("MANIFEST")
    ][0]
    rewritten = set(json.loads(manifest_line[len("MANIFEST"):]))

    # completed partitions were genuinely skipped, not rewritten
    for d in completed_at_kill:
        st = os.stat(os.path.join(kill_out, d, "part.parquet"))
        assert (st.st_ino, st.st_mtime_ns) == (
            pre_stat[d].st_ino,
            pre_stat[d].st_mtime_ns,
        ), f"completed partition {d} was rewritten on resume"
        assert d.split("=", 1)[1] not in rewritten
    assert "zbig" in rewritten

    # final output byte-identical to the uninterrupted run
    assert _digests(kill_out) == _digests(clean_out) != {}
