"""Profiling traces + peak-HBM budget table (VERDICT r3 item 10).

Two artifacts:

1. ``jax.profiler`` traces (Perfetto/TensorBoard-viewable) for one TransMIL
   train step (bag 1024) and one 40k-slide inference pass (int8 embed chunk +
   full-bag head forward), written under ``--trace_dir``.
2. A peak-HBM table from XLA's own ``compiled.memory_analysis()`` (argument /
   output / temp / total bytes per program) for the programs that matter:
   int8 vs bf16 backbone chunk embed, f32 vs bf16 TransMIL head at 40k, and
   the f32 train step. Printed as JSON lines; paste into
   ``docs/performance.md``.

Run on the real chip: ``python tools/profile_hbm.py``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BAG_40K = 40960
CHUNK = 128


def mem_row(name: str, jitted, *args) -> dict:
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    row = {"program": name}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            row[k.replace("_size_in_bytes", "_mb")] = round(v / 1e6, 1)
    total = sum(getattr(m, k, 0) or 0 for k in
                ("argument_size_in_bytes", "output_size_in_bytes", "temp_size_in_bytes"))
    row["total_mb"] = round(total / 1e6, 1)
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace_dir", default="/tmp/tdt_profiles")
    ap.add_argument("--skip_traces", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import apply_qresnet50, build_qresnet50
    from transmil_deepgraft_tpu.train.losses import cross_entropy
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache
    from transmil_deepgraft_tpu.utils.profiling import trace

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # ---- programs ---------------------------------------------------------
    # Init + PTQ calibration run on the HOST CPU backend: over the remote-
    # compile relay, flax init alone spawns dozens of tiny jit programs
    # (truncated_normal per layer) that each pay full relay compile latency.
    # Only the 5 programs under measurement are compiled for the TPU.
    import contextlib

    try:  # under the axon relay only the TPU backend is registered
        cpu_ctx = lambda: jax.default_device(jax.devices("cpu")[0])  # noqa: E731
        jax.devices("cpu")
    except RuntimeError:
        cpu_ctx = contextlib.nullcontext
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((8, 224, 224, 3)).astype(np.float32)
    with cpu_ctx():
        variables = jax.device_get(
            backbone.init({"params": jax.random.key(0)}, jnp.asarray(calib[:1]))
        )
        q = jax.device_get(build_qresnet50(variables, calib))
    tiles = rng.standard_normal((CHUNK, 224, 224, 3)).astype(np.float32)

    embed_int8 = jax.jit(apply_qresnet50)
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)
    embed_bf16 = jax.jit(
        lambda v, t: backbone.apply(v, t.astype(jnp.bfloat16)).astype(jnp.float32)
    )

    head = create_model("TransMIL", n_classes=2, in_features=2048)
    bag40k = np.zeros((1, BAG_40K, 2048), np.float32)
    with cpu_ctx():
        hv = jax.device_get(
            head.init({"params": jax.random.key(1)}, jnp.zeros((1, 256, 2048)))
        )
    head_f32 = jax.jit(lambda v, x: head.apply(v, x))
    head_bf16 = jax.jit(
        lambda v, x: head.apply(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), v), x.astype(jnp.bfloat16)
        ).astype(jnp.float32)
    )

    bag_tr = np.zeros((1, 1024, 2048), np.float32)
    labels = np.zeros((1,), np.int32)
    tx = create_optimizer(opt="lookahead_radam", lr=2e-4, weight_decay=0.01)
    with cpu_ctx():
        opt_state = jax.device_get(tx.init(hv["params"]))
        step_key = jax.random.key(2)  # cpu-resident; transfers on use

    def train_step(params, opt_state, bags, labels, key):
        def loss_of(p):
            logits = head.apply({"params": p}, bags, deterministic=False,
                                rngs={"dropout": key})
            return cross_entropy(logits, jax.nn.one_hot(labels, 2))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    train_jit = jax.jit(train_step)

    # ---- peak-HBM table ---------------------------------------------------
    rows = [
        mem_row("embed_chunk128_int8", embed_int8, q, tiles),
        mem_row("embed_chunk128_bf16", embed_bf16, bf16_vars, tiles),
        mem_row("transmil_head_40k_f32", head_f32, hv, bag40k),
        mem_row("transmil_head_40k_bf16", head_bf16, hv, bag40k),
        mem_row("transmil_trainstep_bag1024_f32", train_jit,
                hv["params"], opt_state, bag_tr, labels, step_key),
    ]

    # ---- profiler traces --------------------------------------------------
    if not args.skip_traces:
        root = Path(args.trace_dir)
        with trace(root / "train_step"):
            p2, o2, loss = train_jit(hv["params"], opt_state, bag_tr, labels,
                                     step_key)
            jax.block_until_ready(loss)
        with trace(root / "inference_40k"):
            f = embed_int8(q, tiles)
            logits = head_f32(hv, bag40k)
            jax.block_until_ready((f, logits))
        print(json.dumps({"traces": str(root), "programs": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
