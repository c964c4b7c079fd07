"""Multi-chip training over a ``jax.sharding.Mesh`` (dp x sp).

The same ``Trainer`` call as the single-chip example — passing ``mesh=`` turns
on GSPMD data parallelism (batch sharded over ``dp``) and sequence-parallel
Nystrom attention (bag dimension sharded over ``sp``). Gradients are combined
by XLA collectives over ICI; the result is numerically identical to
single-device training (guarded by tests/test_trainer_mesh.py).

Works anywhere: on a CPU host this runs on virtual devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``),
on a TPU pod slice it uses the real chips. For multi-host pods call
``parallel.mesh.init_multihost()`` first (docs/parallelism.md).

Run: ``python examples/02_multichip_mesh_training.py [--dp 4] [--sp 2]``
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dp", type=int, default=4, help="data-parallel axis size")
    p.add_argument("--sp", type=int, default=2, help="sequence-parallel axis size")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--log_dir", default="logs/example_mesh")
    args = p.parse_args(argv)

    import jax

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.parallel.mesh import make_mesh
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    n_dev = len(jax.devices())
    if args.dp * args.sp > n_dev:
        raise SystemExit(
            f"need {args.dp * args.sp} devices, have {n_dev} — on a CPU host set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu"
        )
    mesh = make_mesh(jax.devices()[: args.dp * args.sp], dp=args.dp, sp=args.sp)

    dm = MILDataModule(
        n_classes=2, max_bag_size=64, batch_size=args.dp,
        synthetic={"n_train": 4 * args.dp, "n_val": 8, "n_test": 8,
                   "bag_size": 64, "feature_size": 64, "signal": 2.0},
        seed=0,
    )
    model = create_model("TransMIL", n_classes=2, in_features=64, out_features=64)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=args.epochs, log_dir=args.log_dir, task="norm_rest")
    trainer = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                      mesh=mesh, model_name="TransMIL")
    history = trainer.fit()
    out = {"devices": n_dev, "mesh": f"dp={args.dp} x sp={args.sp}",
           "loss": history["loss"], "val_auc": history["val_auc"]}
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()}))
    return out


if __name__ == "__main__":
    main()
