"""Slide heatmap visualization: attention rollout + GradCAM-equivalent.

Equivalent of the reference's ``code/visualize_mil.py:81-670``:
- per-slide tile attention from the Nystrom cls row, mean over heads, min-max
  normalized (ref ``:584-592``) - here computed on-device in O(n*m) by the model
  itself (``TransMIL(return_attn=True)``), never materializing the n x n matrix;
- GradCAM tile attribution (ref ``:199-234`` wraps torch GradCAM around
  backbone+head): here ``d(score_class)/d(features) * features`` summed over
  channels and ReLU'd - the exact GradCAM reduction at the bag-feature level,
  via one ``jax.grad``;
- ``assemble_heatmap``: scatter per-tile scores onto the slide grid by coords
  (device op), gaussian smoothing, ROI mask via connected components
  (scipy.ndimage replacing skimage remove_small_objects/holes, ref ``:245-436``);
- JPEG export with a matplotlib colormap overlay.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def attention_tile_scores(attn) -> np.ndarray:
    """(n_tokens,) tile scores from a TransMILAttention payload: reference slice,
    mean over heads, min-max normalized (ref ``visualize_mil.py:585-592``)."""
    scores = np.asarray(attn.tile_scores())[0]  # (heads, n)
    scores = scores.mean(0)
    lo, hi = scores.min(), scores.max()
    return (scores - lo) / (hi - lo + 1e-12)


def gradcam_tile_scores(
    apply_fn: Callable[[jax.Array], jax.Array],
    bag: jax.Array,
    target_class: int,
) -> np.ndarray:
    """GradCAM at the bag-feature level: relu(sum_c dL/df * f), min-max normalized.

    ``apply_fn(bag) -> logits (1, C)`` should close over params.
    """

    def score(b):
        logits = apply_fn(b)
        return logits[0, target_class]

    grads = jax.grad(score)(bag)
    cam = jnp.maximum((grads * bag).sum(-1), 0.0)  # (1, N) or (N,)
    cam = np.asarray(cam).reshape(-1)
    lo, hi = cam.min(), cam.max()
    return (cam - lo) / (hi - lo + 1e-12)


def assemble_heatmap(
    coords: np.ndarray,
    scores: np.ndarray,
    *,
    downsample: int = 1,
    blur_sigma: float = 1.0,
) -> np.ndarray:
    """Scatter per-tile scores into a 2D grid by tile coords, gaussian-smoothed.

    coords: (N, 2) integer tile grid positions (x, y); scores: (N,).
    Returns (H, W) float map in [0, 1].
    """
    coords = np.asarray(coords, np.int64) // max(downsample, 1)
    scores = np.asarray(scores, np.float64)
    n = min(len(coords), len(scores))
    coords, scores = coords[:n], scores[:n]
    w = int(coords[:, 0].max()) + 1
    h = int(coords[:, 1].max()) + 1
    grid = np.zeros((h, w), np.float64)
    count = np.zeros((h, w), np.float64)
    np.add.at(grid, (coords[:, 1], coords[:, 0]), scores)
    np.add.at(count, (coords[:, 1], coords[:, 0]), 1.0)
    grid = np.where(count > 0, grid / np.maximum(count, 1), 0.0)
    if blur_sigma > 0:
        from scipy.ndimage import gaussian_filter

        grid = gaussian_filter(grid, blur_sigma)
    hi = grid.max()
    return grid / hi if hi > 0 else grid


def assemble_pixel_attention_map(
    coords: np.ndarray,
    scores: np.ndarray,
    *,
    tile_px: int = 224,
    sigma: float = 15.0,
) -> np.ndarray:
    """REFERENCE-EXACT full-resolution attention mask
    (``visualize_mil.py:368-436`` ``_save_attention_map``): min-max normalize
    the per-tile scores, scatter onto the tile grid, bilinear-upsample to the
    ``tile_px``-per-tile pixel canvas (torch ``F.interpolate`` semantics,
    align_corners=False), min-max normalize again, gaussian blur with
    ``sigma`` PIXELS. Golden-pinned against a torch oracle
    (``tests/torch_ref/heatmap_oracle.py``); ``assemble_heatmap`` above is the
    cheaper grid-level variant for dashboards."""
    from scipy.ndimage import gaussian_filter, map_coordinates

    coords = np.asarray(coords, np.int64)
    s = np.asarray(scores, np.float64)
    s = (s - s.min()) / (s.max() - s.min() + 1e-12)
    w = int(coords[:, 0].max()) + 1
    h = int(coords[:, 1].max()) + 1
    grid = np.zeros((h, w), np.float64)
    grid[coords[:, 1], coords[:, 0]] = s
    H, W = h * tile_px, w * tile_px
    # torch bilinear align_corners=False sampling: src = (i + 0.5)*scale - 0.5,
    # edge-clamped — map_coordinates(order=1, mode='nearest') reproduces it
    yy = (np.arange(H) + 0.5) * (h / H) - 0.5
    xx = (np.arange(W) + 0.5) * (w / W) - 0.5
    cy, cx = np.meshgrid(yy, xx, indexing="ij")
    up = map_coordinates(grid, [cy, cx], order=1, mode="nearest")
    up = (up - up.min()) / (up.max() - up.min() + 1e-12)
    return gaussian_filter(up, sigma=sigma)


def roi_mask(occupancy: np.ndarray, min_size: int = 16, fill_holes: bool = True) -> np.ndarray:
    """Tissue-region mask: drop small connected components, fill holes
    (ref skimage remove_small_objects/remove_small_holes, ``visualize_mil.py:245-436``)."""
    from scipy import ndimage

    mask = np.asarray(occupancy) > 0
    labeled, n = ndimage.label(mask)
    if n:
        sizes = ndimage.sum_labels(mask, labeled, index=np.arange(1, n + 1))
        keep = np.zeros(n + 1, bool)
        keep[1:] = sizes >= min_size
        mask = keep[labeled]
    if fill_holes:
        mask = ndimage.binary_fill_holes(mask)
    return mask


def save_heatmap_jpeg(
    heatmap: np.ndarray,
    path: str | Path,
    *,
    base_image: Optional[np.ndarray] = None,
    alpha: float = 0.5,
    colormap: str = "jet",
    upscale: int = 8,
) -> Path:
    """Render a heatmap (optionally blended over a thumbnail) to JPEG."""
    import matplotlib as mpl
    from PIL import Image

    hm = np.clip(np.asarray(heatmap, np.float64), 0, 1)
    rgba = mpl.colormaps[colormap](hm)
    rgb = (rgba[..., :3] * 255).astype(np.uint8)
    img = Image.fromarray(rgb)
    if upscale > 1:
        img = img.resize((img.width * upscale, img.height * upscale), Image.BILINEAR)
    if base_image is not None:
        base = Image.fromarray(np.asarray(base_image).astype(np.uint8)).resize(img.size)
        img = Image.blend(base.convert("RGB"), img, alpha)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    img.save(path, quality=90)
    return path


def deep_feature_factorization(
    feats: np.ndarray, n_concepts: int = 4, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Deep Feature Factorization (ref ``visualize_dff.py``): NMF over the
    (N, D) tile features -> per-tile concept weights (N, K) + concept bases
    (K, D). Features are shifted non-negative before factorization."""
    from sklearn.decomposition import NMF

    x = np.asarray(feats, np.float64)
    x = x - x.min()
    model = NMF(n_components=n_concepts, init="nndsvda", random_state=seed, max_iter=400)
    w = model.fit_transform(x)  # (N, K)
    return w, model.components_


def export_topk_tiles(
    scores: np.ndarray,
    coords: np.ndarray,
    slide_name: str,
    out_csv: str | Path,
    k: int = 10,
) -> "Path":
    """Top-k attended tiles per slide as CSV (ref ``test_visualize.py`` top-k
    tile export during trainer.test): columns slide, rank, x, y, score."""
    import pandas as pd

    scores = np.asarray(scores).reshape(-1)
    coords = np.asarray(coords)
    k = min(k, len(scores), len(coords))
    order = np.argsort(-scores)[:k]
    df = pd.DataFrame(
        {
            "slide": slide_name,
            "rank": np.arange(k),
            "x": coords[order, 0],
            "y": coords[order, 1],
            "score": scores[order],
        }
    )
    out_csv = Path(out_csv)
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_csv, index=False)
    return out_csv


class Visualizer:
    """Per-slide heatmap driver (the reference's ``Visualize.run``,
    ``visualize_mil.py:439-626``): forward with attention, assemble attention and
    GradCAM maps, write ``{slide}_mil_{attn,gradcam}.jpg``."""

    def __init__(self, model, variables, out_dir: str | Path, target_class: int = 1) -> None:
        self.model = model
        self.variables = variables
        self.out_dir = Path(out_dir)
        self.target_class = target_class
        # coord-aware heads (RoFormerMIL) take the slide's tile coords as a
        # second forward argument; reference heads keep the 1-arg signature
        self._coord_aware = bool(getattr(model, "coord_aware", False))
        if self._coord_aware:
            self._fwd_attn = jax.jit(
                lambda v, x, c: self.model.apply(v, x, c, deterministic=True, return_attn=True)
            )
            self._fwd = jax.jit(lambda v, x, c: self.model.apply(v, x, c, deterministic=True))
        else:
            self._fwd_attn = jax.jit(
                lambda v, x: self.model.apply(v, x, deterministic=True, return_attn=True)
            )
            self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, deterministic=True))

    def run_slide(self, bag: np.ndarray, coords: np.ndarray, slide_name: str) -> dict:
        x = jnp.asarray(bag[None] if bag.ndim == 2 else bag)
        cargs = (jnp.asarray(np.asarray(coords, np.float32)[None]),) if self._coord_aware else ()
        logits, attn = self._fwd_attn(self.variables, x, *cargs)
        attn_scores = attention_tile_scores(attn)
        cam_scores = gradcam_tile_scores(
            lambda b: self._fwd(self.variables, b, *cargs), x, self.target_class
        )

        attn_map = assemble_heatmap(coords, attn_scores)
        cam_map = assemble_heatmap(coords, cam_scores)
        mask = roi_mask(assemble_heatmap(coords, np.ones(len(coords)), blur_sigma=0))
        attn_map = attn_map * mask
        cam_map = cam_map * mask

        attn_path = save_heatmap_jpeg(attn_map, self.out_dir / f"{slide_name}_mil_attn.jpg")
        cam_path = save_heatmap_jpeg(cam_map, self.out_dir / f"{slide_name}_mil_gradcam.jpg")
        export_topk_tiles(
            attn_scores, coords, slide_name, self.out_dir / f"{slide_name}_topk_tiles.csv"
        )
        return {
            "logits": np.asarray(logits),
            "attention": attn_scores,
            "gradcam": cam_scores,
            "paths": [attn_path, cam_path],
        }


class ImageVisualizer:
    """Raw-tile slide driver (the reference's fused-model visualizations in
    ``visualize_feature.py`` / ``visualize_classic.py``): tiles stream through
    the frozen backbone in chunks (ref ``visualize_mil.py:560-583``), the MIL
    head yields attention scores, and pixel-level GradCAM through the backbone
    gives sub-tile saliency stitched into a slide heatmap."""

    def __init__(
        self, backbone, head, backbone_variables, head_variables,
        out_dir: str | Path, target_class: int = 1, chunk: int = 64,
        tile_size: int = 224, cam_method: str = "gradcam",
    ) -> None:
        self.backbone = backbone
        self.head = head
        self.bv = backbone_variables
        self.hv = head_variables
        self.out_dir = Path(out_dir)
        self.target_class = target_class
        self.chunk = chunk
        self.tile_size = tile_size
        self.cam_method = cam_method  # any visualize.cam.CAM_METHODS algorithm
        self._embed = jax.jit(lambda v, t: self.backbone.apply(v, t))
        self._fwd_attn = jax.jit(
            lambda v, x: self.head.apply(v, x, deterministic=True, return_attn=True)
        )

    def run_slide(self, tiles: np.ndarray, coords: np.ndarray, slide_name: str) -> dict:
        from transmil_deepgraft_tpu.visualize.gradcam import (
            assemble_pixel_heatmap,
            pixel_gradcam_image_mil,
        )

        n = tiles.shape[0]
        feats = []
        for start in range(0, n, self.chunk):  # chunked embed, ref x10 split
            feats.append(np.asarray(self._embed(self.bv, jnp.asarray(tiles[start:start + self.chunk]))))
        feats = np.concatenate(feats)

        logits, attn = self._fwd_attn(self.hv, jnp.asarray(feats[None]))
        attn_scores = attention_tile_scores(attn)
        attn_map = assemble_heatmap(coords, attn_scores)
        attn_path = save_heatmap_jpeg(attn_map, self.out_dir / f"{slide_name}_mil_attn.jpg")

        cams = pixel_gradcam_image_mil(
            self.backbone, self.head, self.bv, jnp.asarray(tiles),
            self.target_class, head_variables=self.hv, method=self.cam_method,
        )
        pixel_map = assemble_pixel_heatmap(cams, coords, tile_size=self.tile_size)
        pixel_path = save_heatmap_jpeg(pixel_map, self.out_dir / f"{slide_name}_pixel_gradcam.jpg")

        export_topk_tiles(
            attn_scores, coords, slide_name, self.out_dir / f"{slide_name}_topk_tiles.csv"
        )
        return {
            "logits": np.asarray(logits),
            "attention": attn_scores,
            "pixel_cams": cams,
            "paths": [attn_path, pixel_path],
        }
