"""XLA compiler-flag sweep for the int8 backbone embed (single chip).

Every kernel-level reformulation of the embed lost to XLA's emitter
(BENCHMARKS.md), so the remaining single-chip lever is the emitter's OWN
knobs. Flags must be set before backend init, so each configuration runs in a
child process that slope-times the production ``apply_qresnet50`` path on a
128-tile chunk (chained-scan methodology, same as bench.py) and prints one
JSON line; the parent aggregates a table.

  python tools/bench_xla_flags.py             # run the sweep on the TPU
  python tools/bench_xla_flags.py --flags "--xla_tpu_scoped_vmem_limit_kib=65536"
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Candidate sets: scoped VMEM governs how much on-chip memory fusions may
# claim (bigger -> deeper conv software pipelines, until spills); the others
# are scheduler/fusion toggles that default conservatively.
SWEEP: list[str] = [
    "",  # baseline (production flags)
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
    "--xla_tpu_enable_dot_strength_reduction=false",
    "--xla_tpu_licm_size_inflation_ratio=1",
]

CHILD = r"""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
from transmil_deepgraft_tpu.models.resnet_int8 import apply_qresnet50, build_qresnet50

CHUNK = 128
rng = np.random.default_rng(0)
backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
calib = rng.standard_normal((8, 224, 224, 3)).astype(np.float32)
variables = jax.device_get(backbone.init({{"params": jax.random.key(0)}}, jnp.asarray(calib[:1])))
q = build_qresnet50(variables, calib)
tiles = jnp.asarray(rng.standard_normal((CHUNK, 224, 224, 3)).astype(np.float32))

def embed_chunk(qq, x, carry):
    xi = jnp.where(carry < 1e30, x, x + 1.0)
    return apply_qresnet50(qq, xi).mean()

ITERS = 10
@jax.jit
def chained(qq, x):
    def body(carry, _):
        return embed_chunk(qq, x, carry), ()
    out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
    return out

np.asarray(chained(q, tiles))  # compile + warm
rtts, totals = [], []
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(jnp.zeros(()) + 1.0); rtts.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); np.asarray(chained(q, tiles)); totals.append(time.perf_counter() - t0)
ms = (min(totals) - min(rtts)) / ITERS * 1e3
print(json.dumps({{"ms_per_chunk": round(ms, 3), "s_per_40k_slide": round(ms / 1e3 * (40960 / CHUNK), 3)}}))
"""


def run_one(flags: str, timeout: int) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    r = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    if r.returncode != 0:
        return {"error": r.stderr.strip()[-200:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--flags", nargs="*", default=None,
                   help="explicit flag strings to sweep (default: built-in set)")
    p.add_argument("--timeout", type=int, default=1200)
    args = p.parse_args()
    sweep = args.flags if args.flags is not None else SWEEP
    results = []
    for flags in sweep:
        out = run_one(flags, args.timeout)
        row = {"flags": flags or "(baseline)", **out}
        results.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in results if "ms_per_chunk" in r]
    if ok:
        best = min(ok, key=lambda r: r["ms_per_chunk"])
        print(json.dumps({"best": best}, indent=None))


if __name__ == "__main__":
    main()
