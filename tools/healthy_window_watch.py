"""Healthy-host-window watcher (round-4 VERDICT ask #1).

This Firecracker VM sees invisible external CPU throttling (no steal
counter; single-thread 1k-matmul probe ~50 ms healthy, 127-350 ms
throttled).  The raw >=0.8 scaling-efficiency criterion is unreachable in a
throttled window (the measured pure-numpy host ceiling itself was 3.15x/4
in round 4), so this watcher samples the probe continuously and fires the
official interleaved scaling protocol (3 pairs, see fire()) + the flagship
headline bench
the moment the probe stays below HEALTHY_MS for STREAK consecutive samples
(~2 min), i.e. in the best weather the host offers during the round.

Artifacts: /tmp/graft_probe.log (all samples), /tmp/graft_scaling_healthy.json,
/tmp/graft_headline_healthy.json.  /tmp/graft_busy suppresses firing while
the builder runs its own heavy jobs (the single-thread probe would read
high under that load anyway, so the gate is naturally self-protecting).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

HEALTHY_MS = float(os.environ.get("GRAFT_HEALTHY_MS", "90"))
STREAK = int(os.environ.get("GRAFT_HEALTHY_STREAK", "3"))
PERIOD_S = float(os.environ.get("GRAFT_PROBE_PERIOD_S", "45"))
MAX_FIRES = int(os.environ.get("GRAFT_MAX_FIRES", "1"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = "/tmp/graft_probe.log"
DONE = "/tmp/graft_fire_done"
BUSY = "/tmp/graft_busy"

A = np.random.rand(1000, 1000)


def probe_ms() -> float:
    A @ A  # warm
    t0 = time.time()
    A @ A
    return (time.time() - t0) * 1000


def fire() -> None:
    # 3 pairs (~14 min), not 5 (~23): healthy bursts on this host can be
    # short, and a protocol that outlasts its window degrades the MEDIAN
    # pair — per-pair probes still disclose any mid-run weather change
    env = dict(os.environ, GRAFT_SCALING_PAIRS="3", GRAFT_BENCH_REPEAT="2")
    with open("/tmp/graft_scaling_healthy.json", "w") as out:
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--scaling"], env=env, stdout=out,
                       stderr=subprocess.DEVNULL, timeout=5400, check=True)
    # A failed/empty scaling artifact must NOT consume the one fire: require
    # a parseable summary with at least one pair before declaring success.
    with open("/tmp/graft_scaling_healthy.json") as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    summary = json.loads(lines[-1])
    if not summary.get("scaling_efficiency"):
        raise RuntimeError(f"scaling artifact has no efficiency: {summary}")
    env2 = dict(os.environ, GRAFT_BENCH_STEADY_STATE="1", RAY_GRAFT_CPUS="32")
    with open("/tmp/graft_headline_healthy.json", "w") as out:
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--headline-only"], env=env2, stdout=out,
                       stderr=subprocess.DEVNULL, timeout=1800, check=True)


def main() -> None:
    streak = 0
    fires = 0
    while True:
        ms = probe_ms()
        with open(LOG, "a") as f:
            f.write(f"{time.strftime('%H:%M:%S')} {ms:.1f}\n")
        streak = streak + 1 if ms < HEALTHY_MS else 0
        if (streak >= STREAK and fires < MAX_FIRES
                and not os.path.exists(BUSY) and not os.path.exists(DONE)):
            with open(LOG, "a") as f:
                f.write(f"{time.strftime('%H:%M:%S')} FIRING\n")
            t0 = time.time()
            try:
                fire()
            except Exception as e:  # keep watching even if a fire fails
                with open(LOG, "a") as f:
                    f.write(f"{time.strftime('%H:%M:%S')} FIRE-ERR {e!r}\n")
            else:
                fires += 1
                with open(DONE, "w") as f:
                    f.write(str(time.time()))
                with open(LOG, "a") as f:
                    f.write(f"{time.strftime('%H:%M:%S')} FIRED "
                            f"({time.time() - t0:.0f}s)\n")
            streak = 0
        time.sleep(PERIOD_S)


if __name__ == "__main__":
    main()
