"""Non-Spark tests for the scaling-measurement tooling.

The two-leg ratio in tools/bench_scaling.py is the repo's evidence for
the BASELINE.json N->4N gate, so its pure-Python pieces (steal-time
sampling, hardware-ceiling shape, probe quietness rule) get pinned
here without paying a Spark session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import steal_fraction
from tools.box_probe import probe


def test_steal_fraction_monotone_total():
    s0, t0 = steal_fraction()
    # burn a little CPU so total jiffies advance
    x = 0
    for i in range(2_000_000):
        x += i * i % 7
    s1, t1 = steal_fraction()
    assert t1 >= t0
    assert s1 >= s0
    assert 0 <= s0 <= t0


def test_probe_shape_and_quiet_rule():
    # a tiny burn keeps this test cheap; the quiet flag must agree with
    # the documented rule regardless of what the host delivers
    hw = probe(n=200_000)
    for key in (
        "mops_low",
        "mops_high",
        "cpu_scaling_efficiency",
        "mops_busy_low",
        "mops_busy_high",
        "busy_thread_scaling_efficiency",
        "steal_pct",
        "quiet",
        "ts",
    ):
        assert key in hw
    expected_quiet = (
        hw["cpu_scaling_efficiency"] >= 0.85
        and hw["busy_thread_scaling_efficiency"] >= 0.75
    )
    assert hw["quiet"] == expected_quiet
    assert hw["steal_pct"] >= 0.0
