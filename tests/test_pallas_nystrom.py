"""Golden tests: fused Pallas Nystrom kernels vs the XLA reference (interpret
mode on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from transmil_deepgraft_tpu.ops.nystrom import nystrom_attention
from transmil_deepgraft_tpu.ops.pallas.nystrom_kernel import (
    landmark_attention,
    nystrom_attention_fused,
    query_landmark_attention,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_landmark_attention_matches_dense(rng):
    bh, m, n, d = 2, 16, 256, 64
    q_lm = rng.standard_normal((bh, m, d)).astype(np.float32)
    k = rng.standard_normal((bh, n, d)).astype(np.float32)
    v = rng.standard_normal((bh, n, d)).astype(np.float32)
    got = np.asarray(landmark_attention(jnp.asarray(q_lm), jnp.asarray(k), jnp.asarray(v), block_n=64))
    s = q_lm @ k.transpose(0, 2, 1)
    p = np.exp(s - s.max(-1, keepdims=True))
    want = (p / p.sum(-1, keepdims=True)) @ v
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_query_landmark_attention_matches_dense(rng):
    bh, n, m, d = 2, 256, 16, 64
    q = rng.standard_normal((bh, n, d)).astype(np.float32)
    k_lm = rng.standard_normal((bh, m, d)).astype(np.float32)
    b = rng.standard_normal((bh, m, d)).astype(np.float32)
    got = np.asarray(query_landmark_attention(jnp.asarray(q), jnp.asarray(k_lm), jnp.asarray(b), block_n=64))
    s = q @ k_lm.transpose(0, 2, 1)
    p = np.exp(s - s.max(-1, keepdims=True))
    want = (p / p.sum(-1, keepdims=True)) @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_matches_reference(rng):
    b, h, n, d, m = 1, 2, 128, 32, 16
    q, k, v = (rng.standard_normal((b, h, n, d)).astype(np.float32) for _ in range(3))
    ref = nystrom_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_landmarks=m).out
    fused = nystrom_attention_fused(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), m, 6, 64
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_reference(rng):
    b, h, n, d, m = 1, 1, 64, 16, 8
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)) for _ in range(3))

    def loss_fused(q, k, v):
        return jnp.sum(nystrom_attention_fused(q, k, v, m, 6, 32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(nystrom_attention(q, k, v, num_landmarks=m).out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


def test_packed_allheads_matches_reference(rng):
    from transmil_deepgraft_tpu.ops.pallas.nystrom_kernel import (
        nystrom_attention_fused_packed,
    )

    b, n, h, d, m = 1, 160, 2, 32, 16
    qkv = jnp.asarray(rng.standard_normal((b, n, 3, h, d)).astype(np.float32))
    out = nystrom_attention_fused_packed(qkv, m, 6, 64)  # interpret via fixture
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
    ref = jnp.moveaxis(nystrom_attention(q, k, v, num_landmarks=m).out, 1, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def loss(qkv):
        return jnp.sum(nystrom_attention_fused_packed(qkv, m, 6, 64) ** 2)

    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(g)).all()


def test_packed_layer_path_matches_xla_layer(rng):
    from transmil_deepgraft_tpu.models.layers import NystromAttentionLayer

    x = jnp.asarray(rng.standard_normal((1, 150, 64)).astype(np.float32))
    layer_x = NystromAttentionLayer(dim=64, heads=2, dim_head=32, num_landmarks=16, use_pallas=False)
    layer_p = NystromAttentionLayer(dim=64, heads=2, dim_head=32, num_landmarks=16, use_pallas=True)
    v = layer_x.init({"params": jax.random.key(0)}, x)
    ox = np.asarray(layer_x.apply(v, x)[0])
    op = np.asarray(layer_p.apply(v, x)[0])  # interpret mode via fixture
    np.testing.assert_allclose(op, ox, rtol=5e-4, atol=5e-4)
