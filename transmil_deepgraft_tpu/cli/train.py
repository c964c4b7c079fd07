"""CLI driver: ``python -m transmil_deepgraft_tpu.cli.train --stage train --config <yaml>``.

Mirrors the reference's ``code/train.py:68-88`` argparse surface and
``main()`` dispatch (``:91-327``): parse args -> read YAML -> config surgery
(task from filename, in_features per extractor) -> build DataModule + model +
optimizer + Trainer -> run the requested stage. ``--stage test/val`` loads
checkpoints from the log dir and evaluates.

Extension over the reference: a ``Data.synthetic`` config section runs the whole
pipeline on generated bags (the reference's sustainability ``CustomImageDataset``
idea promoted to a first-class data source), so any config is smoke-runnable
without the DeepGraft cohort on disk.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.parallel.mesh import make_mesh
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer_from_config
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig
from transmil_deepgraft_tpu.utils.config import check_home, finalize_config, read_yaml


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native TransMIL-DeepGraft training")
    p.add_argument("--stage", default="train", choices=["train", "test", "val", "fine_tune"])
    p.add_argument("--config", required=True)
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--epoch", default=None)
    p.add_argument("--loss", default=None)
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--bag_size", type=int, default=None)
    p.add_argument("--label_file", default=None)
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--fine_tune", action="store_true")
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--log_dir", default=None, help="override derived log path")
    p.add_argument("--check_home", action="store_true",
                   help="remap absolute data/log paths onto this host's mount "
                        "root (ref check_home, train.py:330-350; opt-in here "
                        "because unconditional remapping would clobber "
                        "deliberate absolute paths)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the stage into DIR "
                        "(open in TensorBoard/xprof; utils/profiling.trace)")
    return p


def _model_extras(cfg, model_name: str) -> dict:
    """Optional ``cfg.Model`` knobs forwarded to the model constructor when
    the head declares them (e.g. TransMIL ``use_pallas``/``fused_inference``,
    RoFormerMIL ``num_landmarks``/``depth``/``pool``). Keys the model does not
    declare are ignored, so one YAML schema serves every head."""
    import dataclasses

    from transmil_deepgraft_tpu.models import MODEL_REGISTRY

    cls = MODEL_REGISTRY.get(model_name)
    if cls is None or not dataclasses.is_dataclass(cls):
        return {}
    fields = {f.name for f in dataclasses.fields(cls)}
    knobs = ("use_pallas", "fused_inference", "num_landmarks", "depth",
             "heads", "dim_head", "mlp_dim", "pool", "dropout", "rope_base")
    return {k: cfg.Model[k] for k in knobs if k in fields and k in cfg.Model}


def build(cfg, log_dir: str | None = None):
    n_classes = int(cfg.Model.n_classes)
    in_features = int(cfg.Model.in_features or 2048)
    out_features = int(cfg.Model.out_features or 512)
    model_name = str(cfg.Model.name)
    model_extras = _model_extras(cfg, model_name)

    synthetic = cfg.Data.synthetic.to_dict() if cfg.Data.synthetic else None
    if synthetic is not None:
        synthetic.setdefault("feature_size", in_features)

    dm = MILDataModule(
        data_dir=str(cfg.Data.data_dir) if cfg.Data.data_dir else None,
        label_path=str(cfg.Data.label_file) if cfg.Data.label_file else None,
        n_classes=n_classes,
        max_bag_size=int(cfg.Data.bag_size or 1000),
        batch_size=int(cfg.Data.train_dataloader.batch_size or 1),
        mixup=bool(cfg.Data.mixup),
        feature_extractor=(
            f"FEATURES_{str(cfg.Data.feature_extractor).upper()}_{in_features}"
            if cfg.Data.feature_extractor
            else None
        ),
        slide_patient_path=str(cfg.Data.patient_dict) if cfg.Data.patient_dict else None,
        seed=int(cfg.General.seed or 2021),
        synthetic=synthetic,
        fine_tune=bool(cfg.fine_tune),
        dataset_name=str(cfg.Data.dataset_name or "custom"),
        fold=int(cfg.Data.fold or 0),
        # inception expects 299x299 tiles (ref classic_jpg_dataloader.py resize)
        tile_size=int(cfg.Data.tile_size or (299 if model_name == "inception" else 224)),
        # dataset variant by model (ref data_interface.py:166-177): spatial grids
        # for CTMIL/resnet50 heads; precomputed feature bags otherwise (the main
        # path even for retccl-backbone configs). 'images'/'tiles' opt in via
        # cfg.Data.variant for in-graph-backbone / classic runs.
        variant=str(
            cfg.Data.variant
            or (
                # classic per-tile pipeline iff Model.name is a plain CNN/ViT
                # (ref train.py:117-120); resnet50/CTMIL -> spatial feature
                # volumes (ref data_interface.py:172-174)
                "tiles" if model_name in ("inception", "resnet18", "vit", "efficientnet")
                else "spatial" if model_name in ("CTMIL", "resnet50")
                else "features"
            )
        ),
    )
    if dm.variant in ("images", "tiles"):
        dm.eval_pad = "exact"  # image bags: bucketing to 2^k tiles wastes embed compute
    if model_name in ("DTFD", "DTFDMIL") and dm.batch_size != 1:
        # DTFD is a strictly batch=1 model (ref model_interface_dtfd.py:183);
        # the model raises on batch>1, so clamp here with a notice.
        print(f"[cli] DTFD requires batch_size=1 (configured {dm.batch_size}); clamping")
        dm.batch_size = 1

    model = create_model(
        model_name, n_classes=n_classes, in_features=in_features,
        out_features=out_features, precision=cfg.General.precision or None,
        **model_extras,
    )
    backbone_name = str(cfg.Model.backbone or "features")
    if dm.variant == "images" and backbone_name != "features":
        # backbone-in-the-graph path (ref ModelInterface.forward reshape,
        # model_interface.py:297-317): tiles stream through the frozen backbone
        # into the bag head inside one jitted step.
        from transmil_deepgraft_tpu.models.backbones import ImageMILModel, create_backbone

        backbone, feat_dim = create_backbone(backbone_name, out_features=out_features)
        if feat_dim != in_features:
            model = create_model(
                model_name, n_classes=n_classes, in_features=feat_dim,
                out_features=out_features, precision=cfg.General.precision or None,
                **model_extras,
            )
        model = ImageMILModel(backbone=backbone, head=model)
    elif dm.variant == "tiles":
        from transmil_deepgraft_tpu.models.classic import classic_model

        model = classic_model(backbone_name, n_classes)
    loss_fn = create_loss(str(cfg.Loss.base_loss or "CrossEntropyLoss"), n_classes)

    grad_acc = int(cfg.General.grad_acc or 1)
    if model_name in ("DTFD", "DTFDMIL"):
        # two tier-wise Adam optimizers + MultiStepLR (ref model_interface_dtfd)
        from transmil_deepgraft_tpu.train.optimizers import create_dtfd_optimizer

        steps = max(1, (int(cfg.Data.synthetic.n_train or 32) if cfg.Data.synthetic else 100)
                    // int(cfg.Data.train_dataloader.batch_size or 1))
        tx = create_dtfd_optimizer(steps_per_epoch=steps)
    else:
        tx = create_optimizer_from_config(cfg.Optimizer, grad_accum_steps=grad_acc)

    tcfg = TrainerConfig(
        epochs=int(cfg.General.epochs or 200),
        patience=int(cfg.General.patience or 50),
        grad_acc=grad_acc,
        seed=int(cfg.General.seed or 2021),
        log_dir=log_dir or str(cfg.log_path or "logs/run"),
        task=str(cfg.task or "norm_rest"),
        fast_dev_run=bool(cfg.fast_dev_run),
        eval_batch_size=int(cfg.Data.test_dataloader.batch_size or 1),
        tile_level=dm.variant == "tiles",
    )

    # dp must divide the global batch; use the largest compatible device count
    # (the reference's DDP analogously requires batch % world_size == 0).
    import math

    batch_size = int(cfg.Data.train_dataloader.batch_size or 1)
    dp = math.gcd(batch_size, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:dp], dp=dp) if dp > 1 else None
    trainer = Trainer(
        model, tx, dm,
        n_classes=n_classes, loss_fn=loss_fn, config=tcfg, mesh=mesh, model_name=model_name,
        needs_hessian="adahessian" in str(cfg.Optimizer.opt or "").lower(),
    )

    # pretrained frozen-backbone weights for the in-graph image path (the
    # reference loads RetCCL/hub checkpoints, model_interface.py:237-267).
    # Accepts a torch .pth/.pt state dict (converted per backbone) or a
    # flax-msgpack variables tree.
    bb_ckpt = cfg.Model.backbone_weights
    if bb_ckpt and dm.variant == "images" and backbone_name != "features":
        trainer.set_backbone_variables(_load_backbone_variables(str(bb_ckpt), backbone_name))
    return trainer


def _load_backbone_variables(path: str, backbone_name: str) -> dict:
    if path.endswith((".pth", ".pt")):
        from transmil_deepgraft_tpu.utils import torch_weights as tw

        sd = tw.load_torch_checkpoint(path)
        if backbone_name in ("retccl", "resnet50", "resnet18"):
            return tw.convert_resnet_state_dict(sd)
        if backbone_name == "efficientnet":
            return tw.convert_efficientnet_state_dict(sd)
        if backbone_name in ("vit", "dino"):
            return tw.convert_vit_state_dict(sd)
        if backbone_name == "inception":
            return tw.convert_inception_state_dict(sd)
        raise ValueError(f"no torch converter for backbone {backbone_name!r}")
    import msgpack  # noqa: F401  (flax serialization dependency)
    from flax import serialization

    from pathlib import Path as _P

    return serialization.msgpack_restore(_P(path).read_bytes())


def main(argv: list[str] | None = None) -> dict:
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = make_parser().parse_args(argv)
    cfg = read_yaml(args.config)
    if args.check_home:
        cfg = check_home(cfg)
    cfg = finalize_config(
        cfg,
        config_path=args.config,
        stage=args.stage,
        fold=args.fold,
        version=args.version,
        loss=args.loss,
        epoch=args.epoch,
        fine_tune=args.fine_tune or args.stage == "fine_tune",
        resume_training=args.resume_training,
        fast_dev_run=args.fast_dev_run,
        label_file=args.label_file,
    )
    if args.bag_size:
        cfg.Data.bag_size = args.bag_size

    trainer = build(cfg, log_dir=args.log_dir)

    if args.profile:
        from transmil_deepgraft_tpu.utils.profiling import trace

        with trace(args.profile):
            return _dispatch(args, cfg, trainer)
    return _dispatch(args, cfg, trainer)


def _dispatch(args, cfg, trainer) -> dict:
    if args.stage in ("train", "fine_tune") and cfg.Data.cross_val:
        # K-fold cross-validation + ensemble (ref train.py:256-260 + train_loop.py)
        from transmil_deepgraft_tpu.train.kfold import KFoldPreempted, run_kfold

        def build_for_fold(fold_dm, log_dir):
            t = build(cfg, log_dir=log_dir)
            t.dm = fold_dm
            return t

        try:
            result = run_kfold(
                build_for_fold,
                trainer.dm,
                nfold=int(cfg.Data.nfold or 3),
                export_dir=Path(trainer.cfg.log_dir) / "kfold",
                seed=int(cfg.General.seed or 2021),
            )
        except KFoldPreempted as e:
            out = {"event": "preempted", "fold": e.fold, "resume_dir": str(e.fold_dir)}
            print(json.dumps(out))
            return out
        print(json.dumps(result.ensemble_metrics, default=float))
        return result.ensemble_metrics

    if args.stage == "fine_tune":
        # ref fine_tune.py: load the ckpt of --epoch, then a 20-epoch fit over
        # train + test_mixin data (dm fine_tune mode is already set).
        trainer.cfg.epochs = int(cfg.General.ft_epochs or 20)
        ckpt_dir = Path(trainer.cfg.log_dir) / "checkpoints"
        if args.epoch not in (None, "last"):
            matches = sorted(ckpt_dir.glob(f"epoch={int(args.epoch):02d}*.ckpt"))
            if matches:
                trainer.load_checkpoint(matches[0])
        elif (ckpt_dir / "last.ckpt").exists():
            trainer.load_checkpoint(ckpt_dir / "last.ckpt")

    if args.stage in ("train", "fine_tune"):
        if args.resume_training:
            last = trainer.ckpts.last_path()
            # .old: the orbax swap's crash-window name (load_pytree resolves it)
            if last.exists() or last.with_name(last.name + ".old").exists():
                # full resume: params + optimizer + epoch + early-stop/plateau/
                # lr-scale (strictly better than the reference's weights-only
                # resume, utils/utils.py:195-218)
                trainer.load_train_state(last)
        history = trainer.fit()
        if getattr(trainer, "preempted", False):
            # SIGTERM mid-fit: state saved to last.ckpt; do NOT test
            # half-trained weights — report and exit so --resume_training
            # picks the run back up
            out = {"event": "preempted", **{k: v for k, v in history.items() if k != "preempted"}}
            print(json.dumps(out, default=float))
            return out
        summary = trainer.test()
        print(json.dumps({**history, **summary}, default=float))
        return summary

    # test/val stages: evaluate checkpoints from the log dir (ref train.py:273-327)
    ckpt_dir = Path(trainer.cfg.log_dir) / "checkpoints"
    candidates = sorted(ckpt_dir.glob("*.ckpt")) if ckpt_dir.exists() else []
    if args.epoch is not None and args.epoch != "last":
        candidates = [c for c in candidates if f"epoch={int(args.epoch):02d}" in c.name]
    if not candidates:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    results = {}
    for ckpt in candidates:
        trainer.load_checkpoint(ckpt)
        mode = "test" if args.stage == "test" else "val"
        res = trainer.evaluate(mode, save_results=True, stage_name=f"{mode}_{ckpt.stem}")
        results[ckpt.name] = {"auroc": res["auroc"], "patient_auroc": res["patient_auroc"]}
        print(ckpt.name, json.dumps(results[ckpt.name]))
    return results


if __name__ == "__main__":
    main()
