"""On-chip Pallas regression gate measurement (VERDICT r3 item 8).

Measures, at the production TransMIL operating point (n=41,216 tokens,
dim 512, 8 heads, m=256 landmarks, f32), the fused Pallas TransLayer
(``ops/pallas/translayer_kernel.fused_translayer``) against the XLA layer it
replaces, with the relay-proof chained-``lax.scan`` methodology. Prints ONE
JSON line:

  {"xla_ms": ..., "fused_ms": ..., "speedup": ...}

Recorded round-2 numbers (BENCHMARKS.md "Fused TransLayer"): XLA 6.13 ms,
fused 2.93 ms (2.09x). The opt-in test ``tests/test_pallas_perf_gate.py``
asserts the speedup stays >= 1.5x so relay/toolchain updates can't silently
eat the win.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def chained_time_ms(fn, x, iters=32, reps=5):
    # iters=32: a ~3 ms kernel runs ~100 ms per chained rep, an order of
    # magnitude above relay RTT variance (iters=8 was RTT-noise-limited)
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x0):
        def body(carry, _):
            # unprovable predicate: prevents hoisting the body out of the scan
            xi = jnp.where(carry[0, 0, 0] < 1e30, x0, x0 + 1.0)
            return fn(xi), ()

        out, _ = jax.lax.scan(body, x0, None, length=iters)
        # scalar-reduce INSIDE the jit: fetching the full (1, n, 512) output
        # (84 MB) over the relay would dwarf the kernel time being measured
        return out.mean()

    np.asarray(chained(x))  # compile + warm
    rtts, totals = [], []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chained(x))
        totals.append(time.perf_counter() - t0)
    return (min(totals) - min(rtts)) / iters * 1e3


def main() -> None:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.models.layers import NystromAttentionLayer
    from transmil_deepgraft_tpu.ops.pallas.translayer_kernel import fused_translayer
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dim, heads, m, n = 512, 8, 256, 41216  # production TransMIL shape (41k slide)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, n, dim)).astype(np.float32))

    class RefLayer(nn.Module):
        @nn.compact
        def __call__(self, xx):
            normed = nn.LayerNorm(epsilon=1e-5, name="norm")(xx)
            out, _, _ = NystromAttentionLayer(
                dim=dim, heads=heads, dim_head=dim // heads, num_landmarks=m,
                name="attn",
            )(normed, deterministic=True)
            return xx + out

    layer = RefLayer()
    variables = jax.device_get(layer.init({"params": jax.random.key(0)}, x[:, :512]))
    p = variables["params"]
    dev_vars = jax.device_put(variables)

    xla_ms = chained_time_ms(lambda xx: layer.apply(dev_vars, xx), x)

    args = [jax.device_put(jnp.asarray(a)) for a in (
        p["norm"]["scale"], p["norm"]["bias"], p["attn"]["to_qkv"]["kernel"],
        p["attn"]["to_out"]["kernel"], p["attn"]["to_out"]["bias"],
        p["attn"]["res_conv"],
    )]
    fused_ms = chained_time_ms(
        lambda xx: fused_translayer(
            xx, *args, heads=heads, dim_head=dim // heads, num_landmarks=m,
        ),
        x,
    )
    print(json.dumps({
        "xla_ms": round(xla_ms, 3),
        "fused_ms": round(fused_ms, 3),
        "speedup": round(xla_ms / fused_ms, 3),
        "n": n, "dim": dim,
    }), flush=True)


if __name__ == "__main__":
    main()
