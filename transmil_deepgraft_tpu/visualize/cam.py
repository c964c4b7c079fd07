"""CAM algorithm zoo over (tiles, h, w, C) feature maps.

The reference drives seven pytorch_grad_cam variants from its feature/classic
visualizers (``visualize_feature.py:21``, ``visualize_classic.py:21``:
GradCAM, HiResCAM, GradCAMPlusPlus, XGradCAM, EigenCAM, EigenGradCAM,
ScoreCAM) plus the ``show_cam_on_image`` jet overlay. Here the same family is
implemented as pure jnp functions over an activation map ``A`` and (where the
method is gradient-based) its upstream gradient ``G`` — both (N, h, w, C),
exactly what ``jax.grad`` w.r.t. the backbone's pre-pool feature map yields
(see ``visualize/gradcam.py``). Everything is jit-compatible; the per-method
math follows the published formulas, not the torch package's code.

  gradcam        w_c = mean_hw(G)                cam = relu(sum_c w_c A_c)
  hirescam       cam = relu(sum_c (G * A)_c)     (no spatial averaging)
  gradcam_pp     alpha = G^2 / (2 G^2 + sum_hw(A G^3)); w = sum_hw(alpha relu(G))
  xgradcam       w_c = sum_hw(G A) / (sum_hw A + eps)
  eigencam       cam = A @ v1,  v1 = first right-singular vector of A (per tile)
  eigengradcam   eigencam on (G * A)
  scorecam       gradient-free: per-channel activation masks re-scored by the
                 model, softmax-weighted (``score_cam``)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _collapse(weighted: jax.Array) -> jax.Array:
    return jax.nn.relu(jnp.sum(weighted, axis=-1))


def _gradcam(a, g):
    w = jnp.mean(g, axis=(1, 2), keepdims=True)
    return _collapse(w * a)


def _hirescam(a, g):
    return _collapse(g * a)


def _gradcam_pp(a, g):
    g2, g3 = g * g, g * g * g
    denom = 2.0 * g2 + jnp.sum(a * g3, axis=(1, 2), keepdims=True)
    alpha = g2 / jnp.where(denom != 0, denom, 1.0)
    w = jnp.sum(alpha * jax.nn.relu(g), axis=(1, 2), keepdims=True)
    return _collapse(w * a)


def _xgradcam(a, g):
    w = jnp.sum(g * a, axis=(1, 2), keepdims=True) / (
        jnp.sum(a, axis=(1, 2), keepdims=True) + 1e-7
    )
    return _collapse(w * a)


def _eigen_project(a):
    """Per-tile projection onto the first right-singular vector, sign-corrected
    so the projection's mean is non-negative (the torch package's convention)."""
    n, h, w, c = a.shape
    flat = a.reshape(n, h * w, c)
    # v1 = dominant eigenvector of flat^T flat via power iteration —
    # jit-friendly (no data-dependent SVD). 100 iterations converges even for
    # near-degenerate Gaussian spectra ((s2/s1)^200 ~ 1e-8 at s2/s1=0.91);
    # each step is only an (n, C, C) matvec.
    m = jnp.einsum("npc,npd->ncd", flat, flat)
    v = jnp.ones((n, c, 1), flat.dtype) / jnp.sqrt(c)
    for _ in range(100):
        v = m @ v
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
    proj = (flat @ v)[..., 0]  # (N, h*w)
    sign = jnp.where(jnp.mean(proj, axis=1, keepdims=True) < 0, -1.0, 1.0)
    return (proj * sign).reshape(n, h, w)


def _eigencam(a, g):
    del g
    return _eigen_project(a)


def _eigengradcam(a, g):
    return _eigen_project(g * a)


CAM_METHODS: dict[str, Callable[[jax.Array, jax.Array], jax.Array]] = {
    "gradcam": _gradcam,
    "hirescam": _hirescam,
    "gradcam_pp": _gradcam_pp,
    "xgradcam": _xgradcam,
    "eigencam": _eigencam,
    "eigengradcam": _eigengradcam,
}


def compute_cam(method: str, activations: jax.Array, grads: jax.Array | None = None) -> jax.Array:
    """(N, h, w, C) activations [+ grads] -> raw (N, h, w) CAM (not normalized).

    ``grads`` may be None only for the gradient-free ``eigencam``.
    """
    if method not in CAM_METHODS:
        raise ValueError(f"unknown CAM method {method!r}; choose from {sorted(CAM_METHODS)}")
    if grads is None:
        if method != "eigencam":
            raise ValueError(f"{method} needs grads; only 'eigencam' is gradient-free")
        grads = activations  # unused
    return CAM_METHODS[method](activations, grads)


def score_cam(
    activations: jax.Array,
    tiles: jax.Array,
    masked_score_fn: Callable[[jax.Array], jax.Array],
    channel_batch: int = 64,
) -> jax.Array:
    """ScoreCAM (gradient-free): each channel's activation map, upsampled to the
    tile size and min-max normalized, masks the input; the model's target score
    on the masked input weights that channel (softmax over channels).

    ``masked_score_fn(masked_tiles) -> ()`` scores one masked copy of the whole
    tile batch (e.g. the bag logit for the target class). Channels are processed
    ``channel_batch`` at a time under ``lax.map`` to bound memory.
    """
    n, h, w, c = activations.shape
    th, tw = tiles.shape[1], tiles.shape[2]
    if c % channel_batch:
        raise ValueError(f"C={c} not divisible by channel_batch={channel_batch}")

    maps = jnp.transpose(activations, (3, 0, 1, 2))  # (C, N, h, w)
    up = jax.image.resize(maps, (c, n, th, tw), "bilinear")
    lo = jnp.min(up, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(up, axis=(1, 2, 3), keepdims=True)
    masks = (up - lo) / (hi - lo + 1e-8)

    def score_chunk(mask_chunk):  # (B, N, th, tw)
        return jax.vmap(lambda mk: masked_score_fn(tiles * mk[..., None]))(mask_chunk)

    scores = jax.lax.map(
        score_chunk, masks.reshape(c // channel_batch, channel_batch, n, th, tw)
    ).reshape(c)
    wgt = jax.nn.softmax(scores)
    return jax.nn.relu(jnp.einsum("nhwc,c->nhw", activations, wgt))


def normalize_cam(cam: np.ndarray, per_tile: bool = False) -> np.ndarray:
    """Min-max to [0, 1]; per tile (classic mode) or over the whole slide."""
    cam = np.asarray(cam, np.float32)
    if per_tile:
        flat = cam.reshape(cam.shape[0], -1)
        lo = flat.min(-1).reshape(-1, 1, 1)
        hi = flat.max(-1).reshape(-1, 1, 1)
    else:
        lo, hi = cam.min(), cam.max()
    return (cam - lo) / (hi - lo + 1e-12)


_JET_STOPS = np.asarray(
    [[0, 0, 127], [0, 0, 255], [0, 255, 255], [255, 255, 0], [255, 0, 0], [127, 0, 0]],
    np.float32,
)


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """[0,1] grayscale -> uint8 RGB jet (the cv2.COLORMAP_JET family the
    reference's ``show_cam_on_image`` applies)."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    pos = x * (len(_JET_STOPS) - 1)
    i0 = np.clip(pos.astype(np.int32), 0, len(_JET_STOPS) - 2)
    frac = (pos - i0)[..., None]
    rgb = _JET_STOPS[i0] * (1 - frac) + _JET_STOPS[i0 + 1] * frac
    return rgb.astype(np.uint8)


def show_cam_on_image(
    image: np.ndarray, cam: np.ndarray, image_weight: float = 0.6
) -> np.ndarray:
    """Reference ``show_cam_on_image(..., use_rgb=True, image_weight=0.6)``
    (``visualize_classic.py:271``): jet-colored CAM blended over the [0,1] RGB
    image. Returns uint8 RGB."""
    heat = jet_colormap(cam).astype(np.float32) / 255.0
    img = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    out = image_weight * img + (1.0 - image_weight) * heat
    return (out * 255.0).astype(np.uint8)
