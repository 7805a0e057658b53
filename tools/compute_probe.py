"""Pure-compute host probe for the scaling appendix (VERDICT r2 item 6).

Measures per-core compute throughput with N worker PROCESSES pinned to the
first N cores (taskset), doing fixed numpy work with zero coordination —
no Ray, no I/O, no shared state.  If per-core throughput at 32 procs is
substantially below 8 procs, the host (all-core turbo / SMT / neighbor
load / memory bandwidth) caps any same-box 8→32 scaling measurement at
that ratio BEFORE engine overhead; run this adjacent to each bench.py
--scaling leg to quantify the ceiling in the same window.

    python tools/compute_probe.py [n_procs ...]   # default: 8 32

Prints one JSON line: per-proc and aggregate ops/s at each level, plus the
implied same-box efficiency cap for the pair.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _work(args) -> float:
    """Fixed CPU-bound kernel: repeated 256x256 matmuls + a sha256 mix —
    hits both FP units and integer pipes, fits in L2 (no memory-bandwidth
    confound).  Returns ops/s for this process."""
    core, seconds = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import hashlib

    import numpy as np

    rng = np.random.default_rng(core)
    a = rng.random((256, 256))
    b = rng.random((256, 256))
    end = time.monotonic() + seconds
    ops = 0
    h = b"seed"
    while time.monotonic() < end:
        a = a @ b
        a /= np.abs(a).max() + 1.0
        h = hashlib.sha256(h).digest()
        ops += 1
    return ops / seconds


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(v) for v in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0, sum(vals))


def probe(n_procs: int, seconds: float = 6.0) -> dict:
    st0, tot0 = _steal()
    with mp.get_context("spawn").Pool(n_procs) as pool:
        rates = pool.map(_work, [(i, seconds) for i in range(n_procs)])
    st1, tot1 = _steal()
    return {
        "n_procs": n_procs,
        "per_proc_ops_s": round(sum(rates) / len(rates), 1),
        "total_ops_s": round(sum(rates), 1),
        "hypervisor_steal_pct": round(
            100.0 * (st1 - st0) / max(1, tot1 - tot0), 2
        ),
    }


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["8", "32"])]
    out = {"levels": [probe(n) for n in levels]}
    if len(levels) == 2:
        lo, hi = out["levels"]
        # the host's ceiling on same-box scaling efficiency: even a
        # perfectly-scaling engine cannot beat the per-core slowdown
        out["host_efficiency_cap"] = round(
            hi["total_ops_s"] / ((hi["n_procs"] / lo["n_procs"]) * lo["total_ops_s"]),
            3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
