"""Per-segment decomposition of the e2e headline (VERDICT r4 item 2).

Runs the SAME measurement as ``bench.py`` (same chained-scan, RTT-corrected
methodology) but prints the per-segment budget so a drift in the headline can
be attributed: embed ms/chunk (int8 ResNet50, 128 tiles), head ms (TransMIL
forward on the 40,960-feature bag), and the derived slides/s distribution.

Usage (on the real TPU; bypass the test conftest's CPU pin):

    JAX_PLATFORMS=axon python tools/bench_e2e_segments.py

Prints ONE JSON line consumed by ``tests/test_e2e_perf_gate.py``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main() -> None:
    m = bench.measure()
    embed = m["embed_reps"]  # whole-slide embed seconds, sorted
    head = m["head_reps"]
    rates = m["rates"]
    chunks = bench.BAG / bench.CHUNK
    row = {
        "embed_ms_per_chunk": round(embed[len(embed) // 2] / chunks * 1e3, 3),
        "embed_ms_per_chunk_min": round(embed[0] / chunks * 1e3, 3),
        "embed_ms_per_chunk_max": round(embed[-1] / chunks * 1e3, 3),
        "embed_slide_s": round(embed[len(embed) // 2], 3),
        "head_ms": round(head[len(head) // 2] * 1e3, 2),
        "head_ms_min": round(head[0] * 1e3, 2),
        "head_ms_max": round(head[-1] * 1e3, 2),
        "slides_per_sec_median": round(rates[len(rates) // 2], 3),
        "slides_per_sec_min": round(rates[0], 3),
        "slides_per_sec_max": round(rates[-1], 3),
        "bag": bench.BAG,
        "chunk": bench.CHUNK,
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
