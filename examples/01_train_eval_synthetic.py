"""Train and evaluate a MIL head on synthetic feature bags — no data needed.

The library-API version of ``transmil-train --stage train --config
configs/synthetic_*.yaml``: build a datamodule, a head from the model zoo, an
optimizer from the reference factory, and run the full loop (imbalanced
sampling, jitted train/eval steps, patient-level aggregation + AUC, metric-keyed
checkpoints, CSV/JSONL logs).

Run: ``python examples/01_train_eval_synthetic.py [--model TransMIL] [--epochs 5]``
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="TransMIL", help="any model zoo name (AttMIL, CLAM_SB, ...)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--n_slides", type=int, default=32)
    p.add_argument("--bag_size", type=int, default=128)
    p.add_argument("--feature_size", type=int, default=64)
    p.add_argument("--log_dir", default="logs/example_synthetic")
    args = p.parse_args(argv)

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2,
        max_bag_size=args.bag_size,
        batch_size=4,
        synthetic={
            "n_train": args.n_slides,
            "n_val": args.n_slides // 2,
            "n_test": args.n_slides // 2,
            "bag_size": args.bag_size,
            "feature_size": args.feature_size,
            "signal": 2.0,
        },
        seed=0,
    )
    model = create_model(args.model, n_classes=2, in_features=args.feature_size, out_features=64)
    tx = create_optimizer(opt="lookahead_radam", lr=2e-4, weight_decay=0.01)  # reference default
    cfg = TrainerConfig(epochs=args.epochs, log_dir=args.log_dir, task="norm_rest")
    trainer = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                      model_name=args.model)

    history = trainer.fit()           # checkpoints + per-epoch metrics under log_dir
    test = trainer.test()             # TEST_RESULT_{PATIENT,SLIDE}.csv, ROC/PR figures
    out = {"val_auc": history["val_auc"], "test_patient_auc": test["test_patient_auc"],
           "log_dir": args.log_dir}
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()}))
    return out


if __name__ == "__main__":
    main()
