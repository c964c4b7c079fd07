"""Tensor-parallel TransMIL head on the 8-device CPU mesh: dp x tp jit
matches single-device numerics (GSPMD inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.parallel.tp import tp_shardings, transmil_tp_specs


def test_tp_specs_pick_projection_kernels():
    model = create_model("TransMIL", n_classes=2, in_features=64, out_features=64)
    params = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 16, 64)))["params"]
    specs = transmil_tp_specs(params)
    assert specs["layer1"]["attn"]["to_qkv"]["kernel"] == P(None, "tp")
    assert specs["layer1"]["attn"]["to_out"]["kernel"] == P("tp", None)
    assert specs["layer1"]["attn"]["to_out"]["bias"] == P()
    assert specs["fc"]["kernel"] == P()


def test_dp_tp_matches_single_device():
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))

    model = create_model("TransMIL", n_classes=2, in_features=64, out_features=64)
    rng = np.random.default_rng(0)
    bags = jnp.asarray(rng.standard_normal((4, 32, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 4), jnp.int32)
    params = model.init({"params": jax.random.key(0)}, bags[:1])["params"]

    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x, deterministic=True)
        one_hot = jax.nn.one_hot(y, 2)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1)), logits

    (loss_ref, logits_ref), grads_ref = jax.value_and_grad(loss_fn, has_aux=True)(
        params, bags, labels
    )

    p_shard = tp_shardings(mesh, params)
    data = NamedSharding(mesh, P("dp"))
    params_tp = jax.device_put(params, p_shard)
    step = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True),
        in_shardings=(p_shard, data, data),
        out_shardings=((NamedSharding(mesh, P()), data), p_shard),
    )
    (loss_tp, logits_tp), grads_tp = step(
        params_tp, jax.device_put(bags, data), jax.device_put(labels, data)
    )

    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(logits_ref), atol=2e-5)
    flat_ref = jax.tree.leaves(grads_ref)
    flat_tp = jax.tree.leaves(grads_tp)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)
