"""bf16 mixed-precision path: finite, close to fp32, params stay fp32."""

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.models import TransMIL, create_model


def test_transmil_bf16_close_to_fp32():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 200, 384), dtype=np.float32))
    m32 = TransMIL(n_classes=3, in_features=384)
    m16 = TransMIL(n_classes=3, in_features=384, dtype=jnp.bfloat16)
    variables = m32.init({"params": jax.random.key(0)}, x)
    l32 = np.asarray(m32.apply(variables, x))
    l16 = np.asarray(m16.apply(variables, x))
    assert l16.dtype == np.float32  # final head stays fp32
    assert np.isfinite(l16).all()
    # bf16 has ~3 decimal digits; logits should agree to ~1e-1 absolute
    assert np.abs(l32 - l16).max() < 0.2, (l32, l16)
    # params are identical tree (fp32 master weights)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"]))


def test_create_model_precision_flag():
    m = create_model("TransMIL", n_classes=2, in_features=384, precision=16)
    assert m.dtype == jnp.bfloat16
    m2 = create_model("TransMIL", n_classes=2, in_features=384)
    assert m2.dtype == jnp.float32


def test_bf16_gradients_finite():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 128, 384), dtype=np.float32))
    model = TransMIL(n_classes=2, in_features=384, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)}, x)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert all(g.dtype == jnp.float32 for g in leaves)  # grads in param dtype
