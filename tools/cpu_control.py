"""Hardware-scaling control for the N-vs-4N criterion (BASELINE.json).

Measures how far THIS BOX's cores scale on pure CPU work with zero
framework overhead: the same single-core regex loop bench.py uses as its
calibration anchor, run as K independent OS processes (no shared state,
no locks, no shuffle — embarrassingly parallel by construction). Any
sublinearity at K procs is therefore the hardware's (per-core clock
drops as more cores go busy on this shared VM), not a property of the
job under test.

This bounds what any Spark job can show at local[K]: a pipeline whose
8->32 efficiency equals the control's 8->32 efficiency is scaling
perfectly modulo the silicon. Results go to BENCH/cpu_control.json and
are cited next to BENCH/scaling.json in BENCH/BASELINE.md.

Usage: python tools/cpu_control.py [procs ...]   (default: 1 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "BENCH")
ITERS = int(os.environ.get("SPARK_GRAFT_CONTROL_ITERS", 300_000))
ROUNDS = int(os.environ.get("SPARK_GRAFT_CONTROL_ROUNDS", 3))

_LINE = ("Jan 12 03:04:05 host-7 sshd[1234]: Accepted password for user "
         "from 192.168.1.77 port 22 ssh2 deadbeefcafe 99881")


def _worker(iters: int) -> float:
    pat = re.compile(r"(\d+)\.(\d+)\.(\d+)\.(\d+)|[0-9a-f]{8,}|\d+")
    t0 = time.monotonic()
    for _ in range(iters):
        pat.findall(_LINE)
    return time.monotonic() - t0


def sample(procs: int) -> float:
    """Aggregate lines/s across ``procs`` simultaneous processes."""
    with mp.Pool(procs) as pool:
        t0 = time.monotonic()
        pool.map(_worker, [ITERS] * procs)
        wall = time.monotonic() - t0
    return procs * ITERS / wall


def main() -> None:
    proc_counts = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    samples = {p: [] for p in proc_counts}
    for _ in range(ROUNDS):
        for p in proc_counts:            # interleaved, like bench_scaling
            samples[p].append(round(sample(p), 1))
    best = {p: max(v) for p, v in samples.items()}
    eff = {}
    for lo in proc_counts:
        for hi in proc_counts:
            if hi == lo * 4:
                eff[f"{lo}->{hi}"] = round(best[hi] / best[lo] / 4, 3)
    out = {
        "workload": "compiled-regex findall loop, K independent processes "
                    "(embarrassingly parallel; no framework)",
        "iters_per_proc": ITERS,
        "rounds": ROUNDS,
        "lines_per_sec_best": best,
        "lines_per_sec_samples": samples,
        "hardware_scaling_efficiency": eff,
        "note": "sublinearity here is the box's own per-core clock "
                "throttling under load; it is the ceiling for any "
                "local[K] job's measured efficiency on this host",
    }
    os.makedirs(BENCH_DIR, exist_ok=True)
    with open(os.path.join(BENCH_DIR, "cpu_control.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({"lines_per_sec_best": best,
                      "hardware_scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
