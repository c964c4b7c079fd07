"""Coordinate padding contract for coord-aware heads (RoFormerMIL).

Coord-aware heads anchor a bag by subtracting the per-axis coordinate min
(``models/roformer_mil.py``: the cls token sits at the bag's bounding-box
origin). Zero-padding raw coords would pin that min at (0, 0) and defeat the
anchoring whenever real coords start away from the origin — so every producer
of padded coords follows ONE contract, implemented here:

    normalize real coords to per-axis min 0, THEN zero-pad

Pad rows then coincide with the bag min, the model's internal ``- min``
becomes a no-op, and a bag produces identical logits whether it arrives
padded or exact, translated or not.
"""

from __future__ import annotations

import numpy as np


def normalize_pad_coords(coords: np.ndarray, target: int) -> np.ndarray:
    """(n, 2) real coords -> (target, 2) float32: per-axis min subtracted,
    zero rows appended (or the first ``target`` rows kept if n > target)."""
    c = np.asarray(coords, np.float32)
    if len(c):
        c = c - c.min(axis=0)
    if c.shape[0] >= target:
        return c[:target]
    return np.concatenate([c, np.zeros((target - c.shape[0], 2), np.float32)], axis=0)


def grid_coords(n: int, batch: int = 1) -> np.ndarray:
    """Row-major (x, y) positions on the ``ceil(sqrt(n))`` square grid — the
    fallback coord-aware heads use internally for coord-less bags. (b, n, 2)."""
    import math

    side = max(int(math.ceil(math.sqrt(max(n, 1)))), 1)
    idx = np.arange(n)
    xy = np.stack([idx % side, idx // side], axis=-1).astype(np.float32)
    return np.broadcast_to(xy[None], (batch, n, 2)).copy()
