"""Gradient stability of the Newton-Schulz pinv init (ops/pinv.py).

The reference's pinv init divides by a global ``torch.max`` over row-sums that
are all exactly ~1 (row-stochastic input): its subgradient is a degenerate
tie-break that flips with any reduction reorder. We stop_gradient the init
scale, making TransMIL training grads batch-additive and dp-sharding-invariant
while keeping the forward bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transmil_deepgraft_tpu.models import create_model


def _loss_fn(model):
    def loss(p, x, y):
        logits = model.apply({"params": p}, x, deterministic=True)
        oh = jax.nn.one_hot(y, 2)
        return -jnp.sum(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    return loss


def _setup():
    model = create_model("TransMIL", n_classes=2, in_features=64, out_features=64)
    rng = np.random.default_rng(0)
    bags = jnp.asarray(rng.standard_normal((4, 32, 64)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 4), jnp.int32)
    params = model.init({"params": jax.random.key(0)}, bags[:1])["params"]
    return model, params, bags, labels


def test_transmil_grads_batch_additive():
    """grad(batch of 4) == sum of per-sample grads (bags are independent)."""
    model, params, bags, labels = _setup()
    loss = _loss_fn(model)
    g4 = jax.grad(loss)(params, bags, labels)
    g1 = None
    for i in range(4):
        gi = jax.grad(loss)(params, bags[i : i + 1], labels[i : i + 1])
        g1 = gi if g1 is None else jax.tree.map(lambda a, b: a + b, g1, gi)
    # residual few-e-3 coupling remains by DESIGN: the pinv init's global max
    # is part of the FORWARD (reference parity: torch.max over the whole
    # batch), so per-sample outputs legitimately depend on batch composition
    # at the pinv-convergence level. The regression guarded here is the
    # PRE-stop_gradient behavior, where the degenerate max tie-break routed
    # cotangent spikes and PPEG grads deviated at FULL scale (delta == scale).
    for a, b in zip(jax.tree.leaves(g4), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, atol=max(0.1 * np.abs(a).max(), 1e-4))


def test_transmil_grads_dp_sharding_invariant():
    """dp-sharded grads == single-device grads (incl. the PPEG convs, which
    sat immediately upstream of the degenerate max tie-break)."""
    model, params, bags, labels = _setup()
    loss = _loss_fn(model)
    g_ref = jax.grad(loss)(params, bags, labels)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    g_dp = jax.jit(jax.grad(loss), in_shardings=(repl, data, data), out_shardings=repl)(
        jax.device_put(params, repl), jax.device_put(bags, data), jax.device_put(labels, data)
    )
    import jax.tree_util as jtu

    for (path, a), (_, b) in zip(
        jtu.tree_flatten_with_path(g_ref)[0], jtu.tree_flatten_with_path(g_dp)[0]
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, err_msg=jtu.keystr(path)
        )


def test_pinv_forward_unchanged_by_stop_gradient():
    from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((2, 3, 16, 16)), jnp.float32)
    a = jax.nn.softmax(logits, axis=-1)
    z = np.asarray(newton_schulz_pinv(a))
    # converged pinv: A Z A ~ A
    aza = np.asarray(jnp.matmul(jnp.matmul(a, z), a))
    np.testing.assert_allclose(aza, np.asarray(a), atol=2e-2)
    # grads exist and are finite
    g = jax.grad(lambda x: jnp.sum(newton_schulz_pinv(jax.nn.softmax(x, -1)) ** 2))(logits)
    assert np.isfinite(np.asarray(g)).all()
