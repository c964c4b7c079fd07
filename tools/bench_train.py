"""Training-step throughput: slides/s/chip for jitted train steps.

Times the full train step (forward + backward + optimizer update) for a
registry head with the relay-proof chained-``lax.scan`` methodology from
bench.py — the scan carries the *train state itself* between iterations, so
every step really executes (no dead-code folding), exactly like a training
loop's steady state.

  python tools/bench_train.py                         # reference operating point sweep
  python tools/bench_train.py --bag 40960 --batch 1   # full-slide (no subsample) training
  python tools/bench_train.py --model RoFormerMIL --opt adam

Prints one JSON line per (bag, batch) combination.
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


def time_train_step(model_name: str, bag: int, batch: int, in_features: int,
                    n_classes: int, opt: str, iters: int, reps: int = 3,
                    model_kwargs: dict | None = None) -> tuple[float, float, float]:
    import jax
    import jax.numpy as jnp
    import optax

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.train.losses import cross_entropy
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer

    rng = np.random.default_rng(0)
    model = create_model(model_name, n_classes=n_classes, in_features=in_features,
                         **(model_kwargs or {}))
    bags = jnp.asarray(rng.standard_normal((batch, bag, in_features), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, n_classes, batch), jnp.int32)
    params = model.init({"params": jax.random.key(0)}, bags[:1])["params"]
    tx = create_optimizer(opt=opt, lr=2e-4, weight_decay=0.01, params=params)
    opt_state = tx.init(params)

    # bags/labels are jit ARGUMENTS (closing over them would bake 100s of MB
    # of constants into the HLO — blows the remote-compile body limit)
    def one_step(params, opt_state, bags, labels, key):
        def loss_of(p):
            logits = model.apply({"params": p}, bags, deterministic=False,
                                 rngs={"dropout": key})
            return cross_entropy(logits, jax.nn.one_hot(labels, n_classes))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def chained(params, opt_state, bags, labels):
        def body(carry, i):
            p, o = carry
            p, o, loss = one_step(p, o, bags, labels,
                                  jax.random.fold_in(jax.random.key(1), i))
            return (p, o), loss

        (_, _), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(iters))
        return losses[-1]

    np.asarray(chained(params, opt_state, bags, labels))  # compile + warm
    rtts, totals = [], []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chained(params, opt_state, bags, labels))
        totals.append(time.perf_counter() - t0)
    return (min(totals) - min(rtts)) / iters, min(totals), min(rtts)


def time_train_step_adaptive(*args, iters: int, **kw) -> float:
    """Grow ``iters`` until the chained run dwarfs the fetch RTT (fast steps
    at small batch would otherwise be swamped — or even driven negative — by
    RTT variance over the relay)."""
    while True:
        per_step, total, rtt = time_train_step(*args, iters=iters, **kw)
        if total >= max(20 * rtt, 0.25) or iters >= 4096:
            return per_step
        iters *= 4


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="TransMIL")
    ap.add_argument("--bag", type=int, nargs="+", default=[1000])
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--in_features", type=int, default=2048)
    ap.add_argument("--n_classes", type=int, default=2)
    ap.add_argument("--opt", default="lookahead_radam")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pallas", action="store_true",
                    help="op-level Pallas attention (analytic VJP) for TransMIL")
    args = ap.parse_args()

    mk = {"use_pallas": True} if args.pallas else {}
    for bag in args.bag:
        for batch in args.batch:
            s = time_train_step_adaptive(args.model, bag, batch, args.in_features,
                                         args.n_classes, args.opt, iters=args.iters,
                                         model_kwargs=mk)
            print(json.dumps({
                "model": args.model, "opt": args.opt, "bag": bag, "batch": batch,
                "pallas": bool(args.pallas),
                "step_ms": round(s * 1e3, 2),
                "slides_per_sec": round(batch / s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
