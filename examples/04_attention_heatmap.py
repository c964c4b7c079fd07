"""Slide attention + GradCAM heatmaps from a MIL head.

Reproduces the reference's ``visualize_mil.py`` flow: forward the bag with
``return_attn=True`` (TransMIL's layer-2 cls attention row, computed O(n*m) —
never materialized n x n), scatter per-tile scores onto the slide grid,
gaussian-smooth, ROI-mask, and write ``{slide}_mil_{attn,gradcam}.jpg``.

In production this runs via ``transmil-visualize --config ... --cam_method
gradcam``; this example drives the library API on a synthetic slide.

Run: ``python examples/04_attention_heatmap.py [--out_dir logs/example_heatmaps]``
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="logs/example_heatmaps")
    p.add_argument("--bag_size", type=int, default=144)
    p.add_argument("--feature_size", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.visualize.heatmap import Visualizer

    # A synthetic "slide": a bag of tile features + their (x, y) grid coords.
    rng = np.random.default_rng(0)
    n = args.bag_size
    bag = rng.standard_normal((n, args.feature_size), dtype=np.float32)
    side = int(np.ceil(np.sqrt(n)))
    coords = np.stack(np.unravel_index(np.arange(n), (side, side)), axis=1).astype(np.int32)

    model = create_model("TransMIL", n_classes=2, in_features=args.feature_size, out_features=64)
    variables = model.init({"params": jax.random.key(0)}, bag[None])

    viz = Visualizer(model, variables, out_dir=args.out_dir, target_class=1)
    result = viz.run_slide(bag, coords, slide_name="example_slide")

    out = {"paths": [str(p) for p in result["paths"]], "n_tiles": n,
           "top_tile": int(np.argmax(result["attention"]))}
    print(json.dumps(out))
    return result


if __name__ == "__main__":
    main()
