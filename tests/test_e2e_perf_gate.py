"""Opt-in ON-CHIP end-to-end headline regression gate (VERDICT r4 item 2).

The e2e headline (int8 ResNet50 embed + TransMIL head on a 40,960-patch
slide) drifted 0.496 -> 0.479 slides/s across rounds 2-4 with no gate and no
attribution. The round-5 per-segment decomposition (tools/bench_e2e_segments)
shows the headline tracks the EMBED segment almost entirely (head stable at
~10.7 ms; embed 6.29-6.5 ms/chunk session to session), so the accepted band
is 0.47-0.51 slides/s with embed <= 6.8 ms/chunk — this test pins both, the
same way the Pallas gate pins the fused-TransLayer win.

Opt-in: the pytest suite pins the CPU backend (conftest), so this test runs
the measurement in a clean subprocess on the axon TPU and is skipped unless
``TDT_TPU_PERF=1`` is set:

    TDT_TPU_PERF=1 python -m pytest tests/test_e2e_perf_gate.py -s
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
    reason="on-chip perf gate: set TDT_TPU_PERF=1 (needs the real TPU + ~5 min)",
)

# the accepted band (BENCHMARKS.md "e2e headline"): sessions r2-r5 measured
# medians 0.479-0.496; embed ms/chunk 6.29-6.5. Outside these, attribute.
MIN_SLIDES_PER_SEC = 0.47
MAX_EMBED_MS_PER_CHUNK = 6.8
MAX_HEAD_MS = 10.7 * 1.5  # head has been stable; 1.5x headroom


def test_e2e_headline_stays_in_band():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "axon"  # conftest pinned cpu; run on the real chip
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_e2e_segments.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    print("e2e gate:", row)
    assert row["slides_per_sec_median"] >= MIN_SLIDES_PER_SEC, row
    assert row["embed_ms_per_chunk"] <= MAX_EMBED_MS_PER_CHUNK, row
    assert row["head_ms"] <= MAX_HEAD_MS, row
