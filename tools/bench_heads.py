"""Per-head forward latency at a given bag size (relay-proof timing).

Times any registry head's deterministic forward with the chained-``lax.scan``
methodology from bench.py (data dependency between iterations, final host
fetch, trivial-fetch RTT subtracted — required under the axon relay, where
``block_until_ready`` can return early).

  python tools/bench_heads.py [--models TransMIL RoFormerMIL] [--bag 40960]
  python tools/bench_heads.py --models RoFormerMIL --kwargs num_landmarks=256

Prints one JSON line per (model, bag).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def chained_time(fn, *args, iters: int = 8, reps: int = 4) -> float:
    import jax
    import jax.numpy as jnp

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
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=["TransMIL", "RoFormerMIL"])
    p.add_argument("--bag", type=int, default=40960)
    p.add_argument("--in_features", type=int, default=2048)
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--kwargs", nargs="*", default=[],
                   help="extra create_model kwargs as key=value (ints parsed)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    extra = {}
    for kv in args.kwargs:
        k, v = kv.split("=", 1)
        extra[k] = int(v) if v.lstrip("-").isdigit() else v

    rng = np.random.default_rng(0)
    bags = jnp.asarray(rng.standard_normal((1, args.bag, args.in_features), dtype=np.float32))
    for name in args.models:
        kw = dict(extra)
        if name == "RoFormerMIL" and "num_landmarks" not in kw and args.bag > 4096:
            kw["num_landmarks"] = 256  # O(n^2) softmax is not a 40k-tile mode
        model = create_model(name, n_classes=args.n_classes,
                             in_features=args.in_features, **kw)
        variables = model.init({"params": jax.random.key(0), "shuffle": jax.random.key(1)}, bags)
        coord_aware = bool(getattr(model, "coord_aware", False))
        cargs = ()
        if coord_aware:
            from transmil_deepgraft_tpu.data.coords import grid_coords

            cargs = (jnp.asarray(grid_coords(args.bag, 1)),)

        def fwd(v, x, *rest):
            carry = rest[-1]
            c = rest[:-1]
            out = model.apply(v, x + carry * 1e-9, *c, deterministic=True)
            out = out[1] if isinstance(out, tuple) and not hasattr(out[1], "row") else out
            out = out[0] if isinstance(out, tuple) else out
            return jnp.asarray(out).reshape(-1)[0]

        ms = chained_time(fwd, variables, bags, *cargs) * 1e3
        print(json.dumps({"model": name, "bag": args.bag, "ms": round(ms, 2),
                          **({"kwargs": kw} if kw else {})}))


if __name__ == "__main__":
    main()
