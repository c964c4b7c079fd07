"""CAM algorithm zoo (visualize/cam.py) vs the reference's pytorch_grad_cam
surface (``visualize_feature.py:21``, ``visualize_classic.py:21``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.visualize.cam import (
    CAM_METHODS,
    compute_cam,
    jet_colormap,
    normalize_cam,
    score_cam,
    show_cam_on_image,
)

N, H, W, C = 3, 7, 7, 16


@pytest.fixture(scope="module")
def acts_grads():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    return a, g


@pytest.mark.parametrize("method", sorted(CAM_METHODS))
def test_shapes_finite_nonneg(method, acts_grads):
    a, g = acts_grads
    cam = np.asarray(compute_cam(method, a, g))
    assert cam.shape == (N, H, W)
    assert np.isfinite(cam).all()
    if method not in ("eigencam", "eigengradcam"):  # relu-collapsed methods
        assert (cam >= 0).all()


def test_gradcam_formula(acts_grads):
    a, g = acts_grads
    w = np.mean(np.asarray(g), axis=(1, 2), keepdims=True)
    expect = np.maximum((w * np.asarray(a)).sum(-1), 0.0)
    np.testing.assert_allclose(np.asarray(compute_cam("gradcam", a, g)), expect, rtol=1e-4, atol=1e-6)


def test_hirescam_reduces_to_elementwise(acts_grads):
    a, g = acts_grads
    expect = np.maximum((np.asarray(g) * np.asarray(a)).sum(-1), 0.0)
    np.testing.assert_allclose(np.asarray(compute_cam("hirescam", a, g)), expect, rtol=1e-4, atol=1e-6)


def test_eigencam_matches_svd(acts_grads):
    """Power iteration == per-tile first right-singular-vector projection."""
    a, _ = acts_grads
    cam = np.asarray(compute_cam("eigencam", a))
    flat = np.asarray(a).reshape(N, H * W, C)
    for i in range(N):
        _, _, vt = np.linalg.svd(flat[i], full_matrices=False)
        proj = flat[i] @ vt[0]
        if proj.mean() < 0:
            proj = -proj
        np.testing.assert_allclose(cam[i].reshape(-1), proj, atol=1e-3)


def test_eigencam_grad_free_guard(acts_grads):
    a, g = acts_grads
    assert np.asarray(compute_cam("eigencam", a)).shape == (N, H, W)
    with pytest.raises(ValueError):
        compute_cam("gradcam", a, None)
    with pytest.raises(ValueError):
        compute_cam("nope", a, g)


def test_gradcam_pp_positive_grad_limit():
    """With constant positive grads, GradCAM++ alpha is uniform and the map
    reduces to GradCAM up to a positive per-channel scale."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(np.abs(rng.standard_normal((1, 5, 5, 4))), jnp.float32)
    g = jnp.ones_like(a)
    pp = np.asarray(compute_cam("gradcam_pp", a, g))
    gc = np.asarray(compute_cam("gradcam", a, g))
    assert pp.shape == gc.shape and (pp >= 0).all()
    # both collapse to a positive-weighted sum of the same activations
    assert np.corrcoef(pp.ravel(), gc.ravel())[0, 1] > 0.99


def test_score_cam_weights_and_shape(acts_grads):
    a, _ = acts_grads
    tiles = jnp.asarray(np.random.default_rng(2).random((N, 28, 28, 3)), jnp.float32)

    probe = jnp.asarray(np.random.default_rng(3).standard_normal(3), jnp.float32)

    def score_fn(masked):
        return jnp.sum(jnp.mean(masked, axis=(1, 2)) * probe)

    cam = np.asarray(score_cam(a, tiles, score_fn, channel_batch=8))
    assert cam.shape == (N, H, W) and np.isfinite(cam).all() and (cam >= 0).all()
    with pytest.raises(ValueError):
        score_cam(a, tiles, score_fn, channel_batch=5)


def test_normalize_and_overlay(acts_grads):
    a, g = acts_grads
    cam = normalize_cam(np.asarray(compute_cam("xgradcam", a, g)))
    assert cam.min() >= 0 and cam.max() <= 1.0 + 1e-6
    per_tile = normalize_cam(np.asarray(compute_cam("xgradcam", a, g)), per_tile=True)
    assert per_tile.reshape(N, -1).max(-1) == pytest.approx(np.ones(N), abs=1e-5)

    img = np.random.default_rng(4).random((H, W, 3)).astype(np.float32)
    out = show_cam_on_image(img, cam[0])
    assert out.shape == (H, W, 3) and out.dtype == np.uint8
    jet = jet_colormap(np.linspace(0, 1, 64).reshape(8, 8))
    assert jet.shape == (8, 8, 3) and jet.dtype == np.uint8
    # jet endpoints: dark blue -> dark red
    assert jet[0, 0, 2] > jet[0, 0, 0] and jet[-1, -1, 0] > jet[-1, -1, 2]


def test_method_plumbing_through_wrappers():
    """classic_tile_gradcam(method=...) dispatches into the zoo."""
    import flax.linen as nn

    from transmil_deepgraft_tpu.visualize.gradcam import classic_tile_gradcam

    class TinyConv(nn.Module):
        @nn.compact
        def __call__(self, x, return_spatial=False):
            h = nn.Conv(8, (3, 3))(x)
            if return_spatial:
                return h
            return jnp.mean(h, axis=(1, 2))

    net = TinyConv()
    tiles = jnp.asarray(np.random.default_rng(5).random((2, 8, 8, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), tiles)
    head = lambda pooled: pooled @ jnp.ones((8, 2))
    for method in ("gradcam", "hirescam", "xgradcam"):
        cam = classic_tile_gradcam(net, variables, tiles, 1, head, method=method)
        assert cam.shape == (2, 8, 8)
        assert cam.reshape(2, -1).max(-1) == pytest.approx(np.ones(2), abs=1e-4)
