"""Feature-extraction CLI: ``python -m transmil_deepgraft_tpu.cli.extract_features``.

Equivalent of the reference's ``datasets/feature_extractor.py`` script: embed
every slide of a cohort through a frozen backbone into per-slide HDF5
``{features, coords}`` archives (optionally N stain-augmented copies), then
optionally pack the cohort into a native bag store.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="offline tile -> feature extraction")
    p.add_argument("--data_dir", required=True, help="cohort root (BLOCKS/<slide>/*.jpg)")
    p.add_argument("--label_file", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--backbone", default="retccl",
                   choices=["retccl", "resnet50", "resnet18", "simple", "efficientnet", "vit", "dino"])
    p.add_argument("--ckpt", default=None, help="torch .pth/.ckpt to convert (e.g. retccl_best_ckpt.pth)")
    p.add_argument("--mode", default="test", help="label-JSON split to extract")
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--augment", type=int, default=0, help="N augmented copies per slide")
    p.add_argument("--bagstore", action="store_true", help="also pack a native bag store")
    p.add_argument("--quantize", default=None, choices=[None, "int8", "int8_fused"],
                   help="int8: PTQ backbone path (ResNet50 family; 1.4x vs bf16)")
    return p


def main(argv: list[str] | None = None) -> list[str]:
    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort
    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset
    from transmil_deepgraft_tpu.models.backbones import create_backbone
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = make_parser().parse_args(argv)

    backbone, dim = create_backbone(args.backbone)
    example = jnp.zeros((1, 224, 224, 3))
    variables = backbone.init({"params": jax.random.key(0)}, example)
    if args.ckpt:
        from transmil_deepgraft_tpu.utils.torch_weights import (
            convert_resnet_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.ckpt)
        converted = convert_resnet_state_dict(sd)
        variables = {**variables, **converted}

    ds = JPGMILDataset(args.data_dir, args.label_file, args.mode, n_classes=2)
    written = extract_cohort(
        backbone, variables, ds, args.out_dir,
        batch_size=args.batch_size, n_augment=args.augment, quantize=args.quantize,
    )
    if args.bagstore:
        from transmil_deepgraft_tpu.data.bagstore import convert_h5_dir

        convert_h5_dir(args.out_dir, f"{args.out_dir}/cohort.bags")
    print(json.dumps({"slides": len(ds), "files": len(written), "dim": dim, "out": args.out_dir}))
    return [str(p) for p in written]


if __name__ == "__main__":
    main()
