"""Production slide-inference CLI: ``python -m transmil_deepgraft_tpu.cli.infer``.

Raw-tile serving path (the reference's ``test_visualize.py`` InferenceModel
flow, backbone + MIL head fused end to end): a directory of slide tile folders
streams through the int8 (or bf16) backbone + TransMIL head of
``inference.SlideInferencePipeline`` and writes per-slide probabilities plus
top-k attention tiles.

Checkpoints load either as flax msgpack variable trees or as torch ``.pth``
state dicts (converted via ``utils/torch_weights``)."""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import numpy as np


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="slide inference (tiles -> probabilities)")
    p.add_argument("--tiles_root", required=True,
                   help="root holding <slide>/<tile_(x-y)>.jpg folders")
    p.add_argument("--backbone_ckpt", required=True,
                   help="ResNet50/RetCCL weights: flax msgpack or torch .pth")
    p.add_argument("--head_ckpt", required=True,
                   help="TransMIL head weights: flax msgpack or torch .pth")
    p.add_argument("--model", default="TransMIL",
                   help="head name from the model registry (TransMIL, AttMIL, "
                        "RoFormerMIL, ...); coord-aware heads get the tiles' "
                        "real (x-y) filename coords")
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--in_features", type=int, default=2048)
    p.add_argument("--out_features", type=int, default=512)
    p.add_argument("--quantize", choices=["bf16", "int8", "int8_fused"], default="int8")
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--tile_size", type=int, default=224)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--out_dir", default="inference_out")
    p.add_argument("--n_chips", type=int, default=1,
                   help="tile-parallel embed over this many devices "
                        "(parallel/tile_parallel; ~linear scaling, <1 s/slide "
                        "at 3 chips per BENCHMARKS.md)")
    return p


def _load_variables(path: str, kind: str, n_classes: int, in_features: int,
                    model_name: str = "TransMIL") -> dict:
    if path.endswith((".pth", ".pt")):
        from transmil_deepgraft_tpu.utils import torch_weights as tw

        sd = tw.load_torch_checkpoint(path)
        if kind == "backbone":
            return tw.convert_resnet_state_dict(sd)
        if model_name != "TransMIL":
            raise SystemExit(
                f"torch .pth head conversion here covers TransMIL; convert a "
                f"{model_name} checkpoint via utils.torch_weights and save it "
                "as msgpack (utils.checkpoints.save_pytree) instead"
            )
        # convert_transmil_state_dict already returns {'params': ...}
        return tw.convert_transmil_state_dict(sd, in_features=in_features)
    from flax import serialization

    return serialization.msgpack_restore(Path(path).read_bytes())


def main(argv: list[str] | None = None) -> list[dict]:
    from transmil_deepgraft_tpu.data.feature_extractor import imagenet_normalize
    from transmil_deepgraft_tpu.data.jpg_bags import parse_coords
    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = make_parser().parse_args(argv)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    bb_vars = _load_variables(args.backbone_ckpt, "backbone", args.n_classes, args.in_features)
    head = create_model(args.model, n_classes=args.n_classes, in_features=args.in_features,
                        out_features=args.out_features)
    head_vars = _load_variables(args.head_ckpt, "head", args.n_classes, args.in_features,
                                model_name=args.model)

    root = Path(args.tiles_root)
    slides = sorted(d for d in root.iterdir() if d.is_dir())
    if not slides:
        raise SystemExit(f"no slide folders under {root}")

    pipeline = None
    results = []
    for slide_dir in slides:
        tile_paths = sorted(slide_dir.glob("*.jpg")) + sorted(slide_dir.glob("*.png"))
        if not tile_paths:
            continue
        if pipeline is None:
            # >=64 calibration tiles: coverage halves the worst-case AUC shift
            # (BENCHMARKS.md int8 AUC guard table). Only the calibration tiles
            # are decoded up front — the slides themselves STREAM from disk
            # (predict_slide_paths_with_attention: decode overlapped with
            # device embed, never a full decoded slide on the host).
            from transmil_deepgraft_tpu.inference import decode_tile_paths

            calib = None
            if args.quantize != "bf16":
                calib = imagenet_normalize(
                    decode_tile_paths(
                        tile_paths[: min(64, len(tile_paths))], args.tile_size
                    )
                )
            mesh = None
            if args.n_chips > 1:
                import jax

                from transmil_deepgraft_tpu.parallel.mesh import make_mesh

                if len(jax.devices()) < args.n_chips:
                    raise SystemExit(
                        f"--n_chips {args.n_chips} > available devices "
                        f"{len(jax.devices())}"
                    )
                mesh = make_mesh(jax.devices()[: args.n_chips], dp=args.n_chips, sp=1)
            pipeline = SlideInferencePipeline(
                bb_vars, head, head_vars,
                calib_tiles=calib, chunk=args.chunk,
                fused_backbone=args.quantize == "int8_fused",
                mesh=mesh,
            )
        coords = None
        if getattr(head, "coord_aware", False):
            # coord-aware heads get the real (x-y) filename coords
            coords = np.asarray([parse_coords(p.name) for p in tile_paths], np.float32)
        probs, attn = pipeline.predict_slide_paths_with_attention(
            tile_paths, coords, tile_size=args.tile_size
        )
        order = np.argsort(attn)[::-1][: args.topk]
        topk_csv = out_dir / f"{slide_dir.name}_topk_tiles.csv"
        with open(topk_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["tile", "x", "y", "attention"])
            for i in order:
                x, y = parse_coords(tile_paths[i].name)
                w.writerow([tile_paths[i].name, x, y, float(attn[i])])
        results.append(
            {
                "slide": slide_dir.name,
                "n_tiles": len(tile_paths),
                "probs": [float(p) for p in probs],
                "pred": int(np.argmax(probs)),
                "topk_csv": str(topk_csv),
            }
        )

    (out_dir / "predictions.json").write_text(json.dumps(results, indent=2))
    print(json.dumps({"slides": len(results), "out_dir": str(out_dir)}))
    return results


if __name__ == "__main__":
    main()
