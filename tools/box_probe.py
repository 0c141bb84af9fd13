"""Host-quietness probe for calibration-gated benchmarking.

This sandbox VM is multi-tenant: its deliverable CPU scaling moves
epoch to epoch (measured 2→8-process efficiency 0.48–1.00 within one
session — BENCH/scaling_r5_pass*.json). Any two-leg scaling ratio
measured while a neighbor tenant is ramping reflects the hypervisor,
not the engine, so the scaling bench must only run inside a quiet
window. This probe measures that window cheaply (~45 s):

    python tools/box_probe.py            # one probe, prints JSON
    python tools/box_probe.py --watch    # repeat every 600 s, log lines

A window is "quiet" when the pure-Python multiprocessing burn scales
2→8 procs with cpu_scaling_efficiency ≥ 0.85 AND
busy_thread_scaling_efficiency ≥ 0.75 (the rule the code and
tests/test_scaling_tools.py pin) — i.e. the host can actually deliver
8 concurrent fast cores, which is the precondition for the N→4N gate
to be measurable at all (BENCH/BASELINE.md round-5 addendum).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import hardware_ceiling, steal_fraction


def probe(n: int = 10_000_000) -> dict:
    s0, t0 = steal_fraction()
    hw = hardware_ceiling(2, 8, n=n)
    s1, t1 = steal_fraction()
    hw["steal_pct"] = round(
        100.0 * (s1 - s0) / (t1 - t0) if t1 > t0 else 0.0, 2
    )
    hw["quiet"] = bool(
        hw["cpu_scaling_efficiency"] >= 0.85
        and hw["busy_thread_scaling_efficiency"] >= 0.75
    )
    hw["ts"] = round(time.time(), 1)
    return hw


def main() -> None:
    if "--watch" in sys.argv:
        interval = int(os.environ.get("KGSPARK_PROBE_INTERVAL", "600"))
        while True:
            print(json.dumps(probe()), flush=True)
            time.sleep(interval)
    else:
        print(json.dumps(probe()))


if __name__ == "__main__":
    main()
