"""Slope-time backbone variants on the real chip (relay-proof methodology).

Times per-128-tile-chunk latency of:
  - int8 production path (``apply_qresnet50``) — the round-2 baseline 6.50 ms
  - mixed bf16-stage1 path (``apply_qresnet50_bf16s1``) — round-3 candidate
  - isolated stem+stage1 in both precisions (attribution)

Run: ``python tools/bench_backbone_variants.py`` (TPU env). Prints one JSON
line; results recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chained_time(fn, args, iters=10, reps=2):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            return fn(*a, carry), ()

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return out

    np.asarray(chained(*args))  # compile + warm
    rtts, totals = [], []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        totals.append(time.perf_counter() - t0)
    return (min(totals) - min(rtts)) / iters


def main() -> None:
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import (
        apply_qresnet50,
        apply_qresnet50_bf16s1,
        build_bf16_stage1,
        build_qresnet50,
    )
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((8, 224, 224, 3)).astype(np.float32)
    variables = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.asarray(calib[:1]))
    )
    q = build_qresnet50(variables, calib)
    s1 = build_bf16_stage1(variables, calib)
    tiles = jnp.asarray(rng.standard_normal((128, 224, 224, 3)).astype(np.float32))

    def salt(x, carry):
        return jnp.where(carry < 1e30, x, x + 1.0)

    def int8_full(q, x, carry):
        return apply_qresnet50(q, salt(x, carry)).mean()

    def mixed_full(q, s1, x, carry):
        return apply_qresnet50_bf16s1(q, s1, salt(x, carry)).mean()

    out = {
        "int8_full_ms": round(chained_time(int8_full, (q, tiles)) * 1000, 3),
        "mixed_bf16s1_full_ms": round(chained_time(mixed_full, (q, s1, tiles)) * 1000, 3),
    }
    out["int8_slide_s"] = round(out["int8_full_ms"] / 1000 * 320, 3)
    out["mixed_slide_s"] = round(out["mixed_bf16s1_full_ms"] / 1000 * 320, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
