"""Benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline: slides/sec for the TransMIL head forward on a 40,960-patch slide
(2048-d RetCCL-style features) on one chip. The SURVEY.md north-star is the full
ResNet50-embed + TransMIL pipeline under 1 s/slide on one v5e chip; until the
on-device backbone lands in the bench, the MIL-head-only number is reported
against that same 1 slide/s baseline.

Timing methodology: in tunneled/relay environments, ``block_until_ready`` on an
on-device buffer can return before execution finishes, and per-call host fetches
are dominated by RTT. So the model is applied ITERS times inside one jitted
``lax.scan`` with a data dependency between iterations (no hoisting, no overlap),
the final logits are fetched to host, and RTT (a trivial fetch) is subtracted.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30
BAG = 40960


def main() -> None:
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    model = create_model("TransMIL", n_classes=2, in_features=2048)
    bags = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 2048), dtype=np.float32))
    params = model.init({"params": jax.random.key(0)}, bags)["params"]

    @jax.jit
    def chained(p, x):
        def body(carry, _):
            xi = x + carry[0, 0] * 1e-9  # data dependency across iterations
            return model.apply({"params": p}, xi), ()

        out, _ = jax.lax.scan(body, jnp.zeros((1, 2), jnp.float32), None, length=ITERS)
        return out

    np.asarray(chained(params, bags))  # compile + warm

    rtts, totals = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chained(params, bags))
        totals.append(time.perf_counter() - t0)

    per_iter = (min(totals) - min(rtts)) / ITERS
    slides_per_sec = 1.0 / per_iter
    baseline_slides_per_sec = 1.0  # reference north-star: <1 s per 40k-patch slide
    print(
        json.dumps(
            {
                "metric": "transmil_fwd_40k_patch_slides_per_sec",
                "value": round(slides_per_sec, 3),
                "unit": "slides/s/chip",
                "vs_baseline": round(slides_per_sec / baseline_slides_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
