"""Probe-gated scaling-sample campaign.

The box is a co-tenanted VM: host neighbors contend for memory bandwidth in
minutes-long windows that inflate CPU-seconds (and wall) of bandwidth-bound
stages, turning single wall-ratio samples into noise (BASELINE.md). This
wrapper makes the sampling disciplined and hands-off:

  1. Before each sample, run a fixed single-thread + 8-way memory sweep probe;
     start the pair only when both are within the quiet-box envelope.
  2. Run `bench.py --scaling` (high leg first, fresh processes, tmpfs scratch).
  3. Log the probe readings + full pair JSON to a JSONL file; the analysis step
     tags samples whose per-leg build_cpu_sec is inflated vs the quiet minimum
     (external contention arriving mid-sample) and reports medians of the rest.

Usage: python scripts/scaling_campaign.py [n_pairs] [levels ...]
  e.g.  python scripts/scaling_campaign.py 6 2,8 1,4
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.environ.get("GRAFT_CAMPAIGN_LOG", "/tmp/scaling_campaign.jsonl")
SCRATCH = os.environ.get("GRAFT_SCRATCH", "/dev/shm/byzer_scaling")
# quiet-box probe envelope (calibrated on an idle window, 2026-08-17):
# single-thread 8x512MB sum ~0.543 s; 8-way 8x128MB ~0.15 s/task mean
PROBE1_QUIET = float(os.environ.get("GRAFT_PROBE1_QUIET", "0.60"))
PROBE8_QUIET = float(os.environ.get("GRAFT_PROBE8_QUIET", "0.175"))


def _sweep1() -> float:
    import numpy as np
    a = np.ones(64_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(8):
        s += float(a.sum())
    return time.perf_counter() - t0


def _sweep8_task(_) -> float:
    import numpy as np
    a = np.ones(16_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(8):
        s += float(a.sum())
    return time.perf_counter() - t0


def probe() -> dict:
    p1 = _sweep1()
    with mp.Pool(8) as pool:
        ts = pool.map(_sweep8_task, range(8))
    return {"probe1": round(p1, 3), "probe8_mean": round(sum(ts) / 8, 3),
            "probe8_max": round(max(ts), 3)}


def wait_quiet(max_wait: float = 600.0) -> dict:
    t0 = time.time()
    while True:
        p = probe()
        quiet = p["probe1"] <= PROBE1_QUIET and p["probe8_mean"] <= PROBE8_QUIET
        p["quiet"] = quiet
        print(json.dumps({"probe": p}), flush=True)
        if quiet or time.time() - t0 > max_wait:
            return p
        time.sleep(20)


def run_pair(levels: str) -> dict | None:
    env = dict(os.environ, GRAFT_SCRATCH=SCRATCH, GRAFT_SCALING_LEVELS=levels)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--scaling"], env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(json.dumps({"error": r.stderr[-500:]}), flush=True)
        return None
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    level_list = sys.argv[2:] or ["2,8", "1,4"]
    for i in range(n):
        for levels in level_list:
            pre = wait_quiet()
            rec = run_pair(levels)
            if rec is None:
                continue
            post = probe()
            rec["probe_pre"] = pre
            rec["probe_post"] = post
            rec["ts"] = time.time()
            with open(LOG, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
