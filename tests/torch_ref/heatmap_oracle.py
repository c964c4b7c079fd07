"""Numpy/torch oracle of the reference's attention-heatmap assemble semantics
(``/root/reference/code/visualize_mil.py:368-436`` ``_save_attention_map`` +
``:584-592`` attention-row extraction), written fresh for golden parity tests.

Pipeline (exactly the reference's order of operations):
  1. min-max normalize the (N,) slide attribution,
  2. scatter onto the (H_tiles, W_tiles) grid at each tile's (x, y),
  3. bilinear-interpolate (torch ``F.interpolate``, align_corners=False) to
     the full-resolution (H_tiles*tile_px, W_tiles*tile_px) canvas,
  4. min-max normalize again ("normalize again..?" — the reference does),
  5. ``scipy.ndimage.gaussian_filter`` with sigma=15 PIXELS.
"""

from __future__ import annotations

import numpy as np


def reference_attention_mask(
    coords: np.ndarray, attribution: np.ndarray, tile_px: int = 224,
    sigma: float = 15.0,
) -> np.ndarray:
    import torch
    import torch.nn.functional as F
    from scipy.ndimage import gaussian_filter

    coords = np.asarray(coords, np.int64)
    a = torch.as_tensor(np.asarray(attribution, np.float32))
    a = (a - a.min()) / (a.max() - a.min())

    x_max = int(coords[:, 0].max())
    y_max = int(coords[:, 1].max())
    W = (y_max + 1) * tile_px  # the reference names rows W (wsi.shape[0])
    H = (x_max + 1) * tile_px
    mask = torch.zeros((int(W / tile_px), int(H / tile_px)))
    for i, (x, y) in enumerate(coords):
        mask[int(y)][int(x)] = a[i]
    mask = mask[None, None]
    mask = F.interpolate(mask, (W, H), mode="bilinear")
    mask = (mask - mask.min()) / (mask.max() - mask.min())
    mask = mask.squeeze().numpy()
    return gaussian_filter(mask, sigma=sigma)


def reference_row_scores(attn_matrix: np.ndarray, padding: int, n_tiles: int) -> np.ndarray:
    """The reference's attention-row slice (``visualize_mil.py:584-592``):
    ``cls_attention[0, :, padding+1, padding+1 : padding+1+H]``, mean over
    heads, then min-max normalized. ``attn_matrix``: (1, heads, T, T)."""
    row = attn_matrix[0, :, padding + 1, padding + 1 : padding + 1 + n_tiles]
    s = row.mean(axis=0)
    s = s - s.min()
    return s / s.max()
