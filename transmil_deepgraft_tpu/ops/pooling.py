"""Bag-level reduction ops shared by AttMIL / CLAM / DTFD tier-1 and Chowder.

- :func:`gated_attention_pool` - Ilse-style gated attention
  ``A = w^T (tanh(V h) * sigmoid(U h))`` softmaxed over instances, then ``M = A h``
  (ref ``code/models/AttMIL.py:72-107``, ``model_clam.py:42-66``,
  ``DTFDMIL.py:14-46``). One fused chain of MXU matmuls + VPU elementwise.
- :func:`topk_minmax_scores` - Chowder's top-R max / bottom-R min instance-score
  selection (ref ``code/models/Chowder.py:19-50``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gated_attention_pool(
    h: jax.Array,
    v_w: jax.Array,
    u_w: jax.Array,
    w_w: jax.Array,
    *,
    v_b: jax.Array | None = None,
    u_b: jax.Array | None = None,
    w_b: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Gated attention pooling over instances.

    Args:
      h: (..., N, L) instance features.
      v_w: (L, D) tanh-branch weight; u_w: (L, D) sigmoid-branch weight;
      w_w: (D, K) attention head weight (K=1 for AttMIL).
      mask: optional (..., N) boolean; False positions get -inf score.

    Returns:
      (pooled, attn): pooled (..., K, L) bag features and attn (..., K, N)
      post-softmax attention weights.
    """
    av = jnp.tanh(h @ v_w + (0 if v_b is None else v_b))
    au = jax.nn.sigmoid(h @ u_w + (0 if u_b is None else u_b))
    scores = (av * au) @ w_w + (0 if w_b is None else w_b)  # (..., N, K)
    scores = jnp.swapaxes(scores, -1, -2)  # (..., K, N)
    if mask is not None:
        scores = jnp.where(mask[..., None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    pooled = attn @ h  # (..., K, L)
    return pooled, attn


def topk_minmax_scores(scores: jax.Array, r: int) -> jax.Array:
    """Concatenate bottom-R min and top-R max instance scores (Chowder).

    scores: (..., N); returns (..., 2R) ordered [bottom-R, top-R] - the
    reference's ``cat((min_indices, max_indices))`` order (``Chowder.py:45``).
    """
    top = jax.lax.top_k(scores, r)[0]
    bottom = -jax.lax.top_k(-scores, r)[0]
    return jnp.concatenate([bottom, top], axis=-1)
