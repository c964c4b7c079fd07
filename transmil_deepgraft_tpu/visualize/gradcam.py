"""Pixel-level GradCAM through the backbone (the reference's fused-model CAM).

The reference wraps ``GradCAM(nn.Sequential(retccl, transmil))`` with the last
ResNet stage as the target layer (``visualize_mil.py:199-234``, non-TransMIL
branch ``model[0].layer4[-1]``) and per-tile CAM for classic CNNs
(``visualize_classic.py``, ``test_visualize.py:38-120``). Here the same math
runs as explicit ``jax.grad`` w.r.t. the backbone's pre-pool feature map:

  weights_c = mean_spatial( d logit_target / d A )      (GradCAM weights)
  cam       = relu( sum_c weights_c * A_c )             per tile, (h, w)

normalized per slide to [0, 1]. The backbone gradient flows THROUGH the MIL
head (bag logit -> pooled features -> conv activations), so tile saliency
reflects the slide-level decision, exactly like the torch fused model.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def pixel_gradcam_image_mil(
    backbone,
    head,
    variables: dict,
    tiles: jax.Array,
    target_class: int,
    head_variables: dict | None = None,
    method: str = "gradcam",
) -> np.ndarray:
    """Per-tile pixel-level CAM through backbone + MIL head.

    Args:
      backbone: flax ResNet (supports ``return_spatial=True``).
      head: bag-level MIL head taking (1, N, D) features.
      variables: backbone variables; ``head_variables`` defaults to
        ``{"params": variables["params"]["head"]}``-style split - pass both
        explicitly for an ``ImageMILModel`` tree.
      tiles: (N, H, W, 3).
      target_class: logit index to attribute.

    Returns (N, h, w) CAM maps, min-max normalized over the whole slide.
    """
    head_variables = head_variables or variables

    feature_map = backbone.apply(variables, tiles, return_spatial=True)

    def logit_of(maps: jax.Array) -> jax.Array:
        pooled = jnp.mean(maps, axis=(1, 2))  # (N, C)
        logits = head.apply(head_variables, pooled[None], deterministic=True)
        if isinstance(logits, tuple):
            logits = logits[1] if logits[0].ndim > logits[1].ndim else logits[0]
        return logits.reshape(-1)[target_class]

    from transmil_deepgraft_tpu.visualize.cam import compute_cam, normalize_cam

    grads = jax.grad(logit_of)(feature_map)  # (N, h, w, C)
    return normalize_cam(compute_cam(method, feature_map, grads))


def classic_tile_gradcam(
    backbone,
    variables: dict,
    tiles: jax.Array,
    target_class: int,
    classifier_apply: Callable[[jax.Array], jax.Array] | None = None,
    method: str = "gradcam",
) -> np.ndarray:
    """Per-tile CAM for classic per-tile CNN classifiers
    (ref ``visualize_classic.py``): gradient of each tile's OWN logit w.r.t.
    its last conv map. ``classifier_apply`` maps pooled features -> logits;
    identity-pool + argument default suits feature-mode backbones. ``method``
    selects any algorithm from ``visualize.cam.CAM_METHODS`` (the reference's
    pytorch_grad_cam import surface, ``visualize_classic.py:21``)."""
    from transmil_deepgraft_tpu.visualize.cam import compute_cam

    feature_map = backbone.apply(variables, tiles, return_spatial=True)

    def score(maps: jax.Array) -> jax.Array:
        pooled = jnp.mean(maps, axis=(1, 2))
        logits = classifier_apply(pooled) if classifier_apply is not None else pooled
        return jnp.sum(logits[:, target_class])  # per-tile independent sum

    grads = jax.grad(score)(feature_map)
    cam = np.asarray(compute_cam(method, feature_map, grads))
    per_tile_max = cam.reshape(cam.shape[0], -1).max(-1, keepdims=True) + 1e-12
    return cam / per_tile_max.reshape(-1, 1, 1)


def assemble_pixel_heatmap(
    cams: np.ndarray,
    coords: np.ndarray,
    tile_size: int = 224,
    downscale: int = 16,
) -> np.ndarray:
    """Stitch per-tile CAM maps into a slide-level heatmap by tile coords
    (ref ``visualize_feature.py`` assemble): each (h, w) tile map is resized to
    the tile footprint (at 1/downscale resolution) and placed at its grid
    position. Returns (H, W) float32 in [0, 1]."""
    coords = np.asarray(coords)
    ts = tile_size // downscale
    gx = coords[:, 0].max() + 1
    gy = coords[:, 1].max() + 1
    out = np.zeros((int(gy) * ts, int(gx) * ts), np.float32)
    for cam, (x, y) in zip(cams, coords):
        tile = np.asarray(
            jax.image.resize(jnp.asarray(cam, jnp.float32), (ts, ts), "bilinear")
        )
        out[int(y) * ts : (int(y) + 1) * ts, int(x) * ts : (int(x) + 1) * ts] = tile
    return np.clip(out, 0.0, 1.0)
