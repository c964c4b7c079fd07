"""Export a trained MIL head as an AOT serving bundle.

``python -m transmil_deepgraft_tpu.cli.export_model --model TransMIL \
    --ckpt logs/.../epoch=12-....ckpt --out transmil_head.tdx``

The bundle (``serving.export_serving_bundle``) contains the StableHLO of the
deterministic eval forward plus the weights: a serving host needs only JAX and
``serving.ServingBundle`` — no model code, no torch, no config system. This is
the TPU-native replacement for the reference's source+ckpt handoff
(``code/test_visualize.py`` rebuilds the LightningModule from source to serve).

Accepts trainer checkpoints (msgpack or orbax), raw flax variable trees, or
torch ``.pth`` state dicts (converted via ``utils/torch_weights``).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def make_parser() -> argparse.ArgumentParser:
    from transmil_deepgraft_tpu.serving import DEFAULT_SERVING_BUCKETS

    p = argparse.ArgumentParser(description="export a serving bundle (.tdx)")
    p.add_argument("--model", required=True,
                   help="head family: TransMIL/AttMIL/CLAM_SB/... (models.create_model)")
    p.add_argument("--ckpt", required=True,
                   help="trainer .ckpt (msgpack/orbax), flax msgpack tree, or torch .pth")
    p.add_argument("--out", required=True, help="output bundle path (.tdx)")
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--in_features", type=int, default=2048)
    p.add_argument("--out_features", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--buckets", default=",".join(map(str, DEFAULT_SERVING_BUCKETS)),
                   help="comma-separated bag-length buckets")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--symbolic", choices=["auto", "always", "never"], default="auto",
                   help="length-polymorphic export (one program for all bag "
                        "lengths) vs per-bucket exports")
    # full-pipeline (tiles -> probs) slide bundles
    p.add_argument("--backbone_ckpt", default=None,
                   help="ResNet50 weights (torch .pth via converter, or flax "
                        "msgpack): exports a SLIDE bundle (raw tiles -> probs, "
                        "serving.export_slide_bundle) instead of a head bundle")
    p.add_argument("--calib_tiles", default=None,
                   help=".npy of (N, H, W, 3) f32 calibration tiles for the "
                        "int8 backbone; omit for bf16 (use >=64 mixed-class "
                        "tiles in production, BENCHMARKS.md int8 AUC guard)")
    p.add_argument("--chunk", type=int, default=128,
                   help="slide bundles: tiles per embed dispatch")
    p.add_argument("--tile_hw", type=int, default=224)
    return p


_TORCH_CONVERTERS = {
    "TransMIL": ("convert_transmil_state_dict", {"in_features"}),
    "AttMIL": ("convert_attmil_state_dict", {"in_features"}),
    "CLAM_SB": ("convert_clam_state_dict", {"n_classes"}),
    "CLAM_MB": ("convert_clam_state_dict", {"n_classes"}),
    "DTFD": ("convert_dtfd_state_dict", set()),
    "DTFDMIL": ("convert_dtfd_state_dict", set()),
    "Chowder": ("convert_chowder_state_dict", set()),
    "TransformerMIL": ("convert_transformer_mil_state_dict", {"in_features"}),
    "MDMIL": ("convert_mdmil_state_dict", set()),
    "CTMIL": ("convert_ctmil_state_dict", set()),
}


def _load_variables(path: str, model_name: str, n_classes: int, in_features: int) -> dict:
    if path.endswith((".pth", ".pt")):
        from transmil_deepgraft_tpu.utils import torch_weights as tw

        entry = _TORCH_CONVERTERS.get(model_name)
        if entry is None:
            raise SystemExit(
                f"no torch converter for {model_name!r}; supported: "
                + ", ".join(sorted(_TORCH_CONVERTERS))
            )
        fn_name, wants = entry
        kwargs = {}
        if "in_features" in wants:
            kwargs["in_features"] = in_features
        if "n_classes" in wants:
            kwargs["n_classes"] = n_classes
        return getattr(tw, fn_name)(tw.load_torch_checkpoint(path), **kwargs)

    from flax import serialization

    p = Path(path)
    if p.is_dir():  # orbax checkpoints are directories; restore target-free
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            tree = ckptr.restore(p.resolve())
    else:
        tree = serialization.msgpack_restore(p.read_bytes())

    # trainer metric ckpt: {params, model_state?, epoch, metrics, hparams}
    if isinstance(tree, dict) and "params" in tree:
        variables = {"params": tree["params"]}
        ms = tree.get("model_state") or {}
        if isinstance(ms, dict):
            variables.update({k: v for k, v in ms.items() if k != "params"})
        # raw variable trees carry batch_stats etc. at the top level
        for k, v in tree.items():
            if k in ("params", "model_state", "opt_state", "epoch", "metrics",
                     "hparams", "step", "rng"):
                continue
            variables.setdefault(k, v)
        return variables
    raise SystemExit(f"unrecognized checkpoint structure in {path} "
                     f"(top-level keys: {list(tree)[:8] if isinstance(tree, dict) else type(tree)})")


def _load_backbone_variables(path: str) -> dict:
    """fp32 ResNet50 {'params','batch_stats'} from torch .pth or flax msgpack."""
    if path.endswith((".pth", ".pt")):
        from transmil_deepgraft_tpu.utils import torch_weights as tw

        return tw.convert_resnet_state_dict(tw.load_torch_checkpoint(path))
    from flax import serialization

    tree = serialization.msgpack_restore(Path(path).read_bytes())
    if isinstance(tree, dict) and "params" in tree:
        return tree
    raise SystemExit(f"unrecognized backbone checkpoint structure in {path}")


def main(argv: list[str] | None = None) -> dict:
    args = make_parser().parse_args(argv)

    import numpy as np

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.serving import export_serving_bundle, export_slide_bundle

    model = create_model(args.model, n_classes=args.n_classes,
                         in_features=args.in_features,
                         out_features=args.out_features)
    variables = _load_variables(args.ckpt, args.model, args.n_classes,
                                args.in_features)
    if args.backbone_ckpt:
        # slide bundles are batch-1 bucketed by construction: refuse flags
        # that would otherwise be silently dropped
        if args.batch != 1:
            raise SystemExit("--batch is not supported with --backbone_ckpt "
                             "(slide bundles serve one slide per call)")
        if args.symbolic != "auto":
            raise SystemExit("--symbolic is not supported with --backbone_ckpt "
                             "(the embed export requires fixed chunks)")
        calib = np.load(args.calib_tiles) if args.calib_tiles else None
        meta = export_slide_bundle(
            _load_backbone_variables(args.backbone_ckpt), model, variables,
            args.out,
            model_name=args.model,
            in_features=args.in_features,
            calib_tiles=calib,
            chunk=args.chunk,
            tile_hw=args.tile_hw,
            head_buckets=[int(b) for b in args.buckets.split(",")],
            platforms=tuple(args.platforms.split(",")),
        )
    else:
        meta = export_serving_bundle(
            model, variables, args.out,
            model_name=args.model,
            in_features=args.in_features,
            batch=args.batch,
            buckets=[int(b) for b in args.buckets.split(",")],
            platforms=tuple(args.platforms.split(",")),
            symbolic={"auto": "auto", "always": True, "never": False}[args.symbolic],
        )
    size = Path(args.out).stat().st_size
    print(json.dumps({**meta, "path": args.out, "bytes": size}))
    return meta


if __name__ == "__main__":
    main()
