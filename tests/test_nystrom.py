"""Golden-value tests for the Nystrom attention op.

Strategy (SURVEY.md section 4 implications): (a) the Newton-Schulz pinv must match
numpy's exact pseudo-inverse on softmax-stochastic matrices; (b) Nystrom attention
must converge to dense softmax attention when every token is its own landmark;
(c) the O(n*m) cls-row extraction must match the materialized attention matrix row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.ops import (
    newton_schulz_pinv,
    nystrom_attention,
    nystrom_attention_dense_reference,
    pad_to_landmark_multiple,
)


def _softmax_matrix(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_pinv_matches_numpy(rng):
    a = _softmax_matrix(rng, (2, 3, 16, 16))
    approx = np.asarray(newton_schulz_pinv(jnp.asarray(a), iters=30))
    exact = np.linalg.pinv(a)
    np.testing.assert_allclose(approx, exact, rtol=5e-2, atol=5e-2)


def test_pinv_six_iters_inverts_wellconditioned(rng):
    # Softmax Gram matrices of random q/k landmarks are diagonally dominant enough
    # that 6 iterations (the reference count) give a usable inverse.
    a = _softmax_matrix(rng, (1, 1, 8, 8)) + 0.5 * np.eye(8, dtype=np.float32)
    a = a / a.sum(-1, keepdims=True)
    z = np.asarray(newton_schulz_pinv(jnp.asarray(a), iters=6))
    residual = np.abs(a @ z - np.eye(8)).max()
    assert residual < 0.05, residual


def test_nystrom_equals_dense_when_landmarks_equal_tokens(rng):
    b, h, n, d = 1, 2, 32, 16
    q = rng.standard_normal((b, h, n, d)).astype(np.float32)
    k = rng.standard_normal((b, h, n, d)).astype(np.float32)
    v = rng.standard_normal((b, h, n, d)).astype(np.float32)

    out = nystrom_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        num_landmarks=n, pinv_iterations=20,
    ).out

    # Dense reference: softmax(q k^T / sqrt(d)) v
    scores = (q * d**-0.5) @ np.swapaxes(k, -1, -2)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    dense = attn @ v

    # With m == n landmarks each landmark is one token, so attn2 == attn1's square
    # block and the factorization is exact up to pinv error.
    np.testing.assert_allclose(np.asarray(out), dense, rtol=2e-2, atol=2e-2)


def test_cls_row_matches_materialized_matrix(rng):
    b, h, n, d, m = 1, 2, 64, 8, 16
    q, k, v = (rng.standard_normal((b, h, n, d)).astype(np.float32) for _ in range(3))
    row_idx = 5
    res = nystrom_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        num_landmarks=m, return_row_index=row_idx,
    )
    _, attn_full = nystrom_attention_dense_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_landmarks=m
    )
    np.testing.assert_allclose(
        np.asarray(res.cls_row), np.asarray(attn_full)[:, :, row_idx, :], rtol=1e-5, atol=1e-5
    )


def test_front_padding():
    x = jnp.ones((1, 300, 4))
    padded, pad = pad_to_landmark_multiple(x, 256)
    assert padded.shape == (1, 512, 4)
    assert pad == 212
    assert bool(jnp.all(padded[:, :pad] == 0))
    assert bool(jnp.all(padded[:, pad:] == 1))


def test_nystrom_approximates_dense_softmax(rng):
    """Approximation quality sanity: m=n/4 landmarks on smooth inputs."""
    b, h, n, d = 1, 1, 256, 32
    q = 0.3 * rng.standard_normal((b, h, n, d)).astype(np.float32)
    k = 0.3 * rng.standard_normal((b, h, n, d)).astype(np.float32)
    v = rng.standard_normal((b, h, n, d)).astype(np.float32)
    out = np.asarray(
        nystrom_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_landmarks=64).out
    )
    scores = (q * d**-0.5) @ np.swapaxes(k, -1, -2)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    dense = (e / e.sum(-1, keepdims=True)) @ v
    err = np.abs(out - dense).mean() / (np.abs(dense).mean() + 1e-8)
    assert err < 0.15, err
