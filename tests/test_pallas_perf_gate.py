"""Opt-in ON-CHIP Pallas performance regression gate (VERDICT r3 item 8).

The fused Pallas TransLayer's 2.09x win over the XLA layer at the production
shape (BENCHMARKS.md "Fused TransLayer": XLA 6.13 ms, fused 2.93 ms at
n=41,216) is load-bearing for the inference headline; a relay/toolchain
update could silently eat it. This test re-measures ON THE REAL TPU and
asserts the recorded thresholds.

Opt-in: the pytest suite pins the CPU backend (conftest), so this test runs
the measurement in a clean subprocess on the axon TPU and is skipped unless
``TDT_TPU_PERF=1`` is set:

    TDT_TPU_PERF=1 python -m pytest tests/test_pallas_perf_gate.py -s
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("TDT_TPU_PERF") != "1",
    reason="on-chip perf gate: set TDT_TPU_PERF=1 (needs the real TPU + ~3 min)",
)

# recorded round-2 numbers + allowed headroom: fused must stay >=1.5x and
# within 1.5x of its recorded absolute latency
MIN_SPEEDUP = 1.5
MAX_FUSED_MS = 2.93 * 1.5


def test_fused_translayer_keeps_its_win():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # the pytest conftest exported JAX_PLATFORMS=cpu into os.environ; the
    # subprocess must run on the real chip
    env["JAX_PLATFORMS"] = "axon"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_pallas_gate.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    print("pallas gate:", row)
    assert row["speedup"] >= MIN_SPEEDUP, row
    assert row["fused_ms"] <= MAX_FUSED_MS, row
