"""GSPMD-safe depthwise conv VJP (ops/depthwise.py).

Documents and works around an XLA bug (jax 0.9.0): the weight gradient of a
grouped conv with the batch sharded over one axis of a MULTI-axis mesh comes
back wrong at full scale (single-axis meshes and dense convs are exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transmil_deepgraft_tpu.ops.depthwise import depthwise_conv1d, depthwise_conv2d


def _grad_pair(loss, args, mesh, shard_idx):
    """(eager grads, dp-sharded-on-2-axis-mesh grads)."""
    gref = jax.grad(loss, argnums=(0, 1))(*args)
    data = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    put = [
        jax.device_put(a, data if i in shard_idx else repl) for i, a in enumerate(args)
    ]
    shardings = tuple(data if i in shard_idx else repl for i in range(len(args)))
    g = jax.jit(
        jax.grad(loss, argnums=(0, 1)), in_shardings=shardings,
        out_shardings=(shardings[0], shardings[1]),
    )(*put)
    return gref, g


@pytest.fixture
def mesh2():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))


def test_xla_grouped_grad_repro_documented(mesh2):
    """The raw lax.conv grouped weight-grad IS wrong under dp x tp — if this
    starts passing, the XLA bug is fixed and the custom VJP can be retired."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 1, 16)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 6, 6, 16)), jnp.float32)

    def loss(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )
        return jnp.sum(y * t)

    (_, dw_ref), (_, dw) = _grad_pair(loss, (x, w), mesh2, shard_idx={0})
    delta = np.abs(np.asarray(dw) - np.asarray(dw_ref)).max()
    scale = np.abs(np.asarray(dw_ref)).max()
    assert delta > 0.1 * scale, (
        f"XLA grouped-conv grad bug no longer reproduces (delta {delta}, scale "
        f"{scale}) — retire ops/depthwise.py's custom VJP"
    )


@pytest.mark.parametrize("k,hw", [(7, 6), (3, 8), (5, 5)])
def test_custom_vjp_matches_autodiff_single_device(k, hw):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, hw, hw, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 1, 8)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((3, hw, hw, 8)), jnp.float32)

    def loss_ref(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=8,
        )
        return jnp.sum(jnp.tanh(y) * t)

    def loss_custom(x, w):
        return jnp.sum(jnp.tanh(depthwise_conv2d(x, w)) * t)

    np.testing.assert_allclose(
        np.asarray(loss_custom(x, w)), np.asarray(loss_ref(x, w)), rtol=1e-6
    )
    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x, w)
    gx_c, gw_c = jax.grad(loss_custom, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r), atol=1e-4)


def test_custom_vjp_correct_on_two_axis_mesh(mesh2):
    """The whole point: correct weight grads where lax.conv's are garbage."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 1, 16)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 6, 6, 16)), jnp.float32)

    def loss(x, w):
        return jnp.sum(depthwise_conv2d(x, w) * t)

    (gx_ref, gw_ref), (gx, gw) = _grad_pair(loss, (x, w), mesh2, shard_idx={0})
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)


def test_depthwise_1d():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 33, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 1, 8)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=8,
    )
    np.testing.assert_allclose(np.asarray(depthwise_conv1d(x, w)), np.asarray(ref), atol=1e-5)
    g = jax.grad(lambda x, w: jnp.sum(depthwise_conv1d(x, w) ** 2), (0, 1))(x, w)
    assert all(np.isfinite(np.asarray(a)).all() for a in g)


def test_even_kernel_guard():
    x = jnp.zeros((1, 4, 4, 2))
    w = jnp.zeros((2, 2, 1, 2))
    with pytest.raises(NotImplementedError):
        jax.grad(lambda x, w: jnp.sum(depthwise_conv2d(x, w)), (0, 1))(x, w)
