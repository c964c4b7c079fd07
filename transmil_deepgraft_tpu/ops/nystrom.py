"""Nystrom linear attention: the op underneath TransMIL's TransLayer.

The reference (``code/models/TransMIL.py:26-34``) delegates to the external
``nystrom_attention`` pip package. Here the math is implemented from scratch as a
TPU-friendly functional op: O(n*m) instead of O(n^2) attention via m landmark
tokens formed by segment means, with the landmark Gram matrix pseudo-inverted by
:func:`newton_schulz_pinv`.

Semantics replicated exactly (needed for AUC parity on converted weights):
  * Sequences are padded *at the front* with zeros to a multiple of ``m``; no mask
    is applied, so pad tokens participate in attention (the reference never passes
    a mask).
  * Landmarks are contiguous-segment means over the padded sequence (segment
    length ``l = n_padded / m``).
  * ``out = softmax(q k_lm^T) @ pinv(softmax(q_lm k_lm^T)) @ (softmax(q_lm k^T) @ v)``
    with q pre-scaled by ``dim_head**-0.5``.
  * Optional per-head depthwise conv residual on V (kernel ``(33, 1)``,
    ``groups=heads``, no bias) added before the output projection.

All matmuls are expressed so XLA tiles them onto the MXU; batch/head dims are
vmapped leading dims. A fused Pallas kernel for the same op lives in
``ops/pallas/nystrom_kernel.py`` and is golden-tested against this implementation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv


class NystromOutput(NamedTuple):
    out: jax.Array  # (b, h, n_padded, d) attention output (pre out-projection)
    cls_row: jax.Array | None  # (b, h, n_padded) attention row for one query index


def pad_to_landmark_multiple(x: jax.Array, num_landmarks: int) -> tuple[jax.Array, int]:
    """Front-pad the sequence axis (-2) with zeros to a multiple of num_landmarks.

    Returns (padded, pad_amount). Matches the reference dependency's
    ``F.pad(x, (0, 0, padding, 0), value=0)`` front-padding.
    """
    n = x.shape[-2]
    remainder = n % num_landmarks
    pad = 0 if remainder == 0 else num_landmarks - remainder
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[-2] = (pad, 0)
        x = jnp.pad(x, cfg)
    return x, pad


def _segment_means(x: jax.Array, m: int) -> jax.Array:
    """Contiguous segment means along axis -2: (..., n, d) -> (..., m, d)."""
    *lead, n, d = x.shape
    seg = n // m
    return jnp.mean(x.reshape(*lead, m, seg, d), axis=-2)


@partial(jax.jit, static_argnames=("num_landmarks", "pinv_iterations", "return_row_index"))
def nystrom_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    return_row_index: int | None = None,
) -> NystromOutput:
    """Nystrom attention over pre-projected q, k, v of shape (b, h, n, d).

    ``n`` must already be a multiple of ``num_landmarks`` (use
    :func:`pad_to_landmark_multiple`). ``q`` is scaled internally by
    ``d**-0.5``.

    If ``return_row_index`` is given, also returns the full attention row for that
    (padded) query position: ``row = (attn1[idx] @ pinv) @ attn3`` - an O(n*m)
    computation that avoids materializing the n x n attention matrix the reference
    builds for visualization (``visualize_mil.py:584-592``).
    """
    b, h, n, d = q.shape
    m = num_landmarks
    if n % m != 0:
        raise ValueError(f"sequence length {n} not a multiple of landmarks {m}")

    # Mixed precision: the big n-dim matmuls run in the input dtype (bf16 on the
    # MXU when callers pass bf16) with fp32 accumulation; softmax and the pinv
    # iteration stay fp32.
    in_dtype = q.dtype
    acc = jnp.float32
    q = q * jnp.asarray(d ** -0.5, in_dtype)
    q_lm = _segment_means(q.astype(acc), m).astype(in_dtype)  # (b, h, m, d)
    k_lm = _segment_means(k.astype(acc), m).astype(in_dtype)  # (b, h, m, d)

    # Three attention kernels, each row-softmaxed in fp32.
    sim1 = jnp.einsum("bhnd,bhmd->bhnm", q, k_lm, preferred_element_type=acc)
    sim2 = jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=acc)
    sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_lm, k, preferred_element_type=acc)

    attn1 = jax.nn.softmax(sim1, axis=-1)  # (b, h, n, m) fp32
    attn2 = jax.nn.softmax(sim2, axis=-1)  # (b, h, m, m) fp32
    attn3 = jax.nn.softmax(sim3, axis=-1)  # (b, h, m, n) fp32

    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)  # fp32

    # (attn1 @ attn2_inv) @ (attn3 @ v): both orderings are O(n m d); this one
    # keeps the big n-dim matmuls as MXU-friendly (n,m)x(m,m) and (n,m)x(m,d).
    attn3_p = attn3.astype(in_dtype)
    attn3_v = jnp.einsum("bhmn,bhnd->bhmd", attn3_p, v, preferred_element_type=acc)
    left = jnp.einsum(
        "bhnm,bhml->bhnl", attn1.astype(in_dtype), attn2_inv.astype(in_dtype),
        preferred_element_type=acc,
    )
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", left.astype(in_dtype), attn3_v.astype(in_dtype),
        preferred_element_type=acc,
    )

    cls_row = None
    if return_row_index is not None:
        row_left = left[:, :, return_row_index, :]  # (b, h, m) fp32
        cls_row = jnp.einsum("bhm,bhmn->bhn", row_left, attn3, preferred_element_type=acc)

    return NystromOutput(out=out, cls_row=cls_row)


def nystrom_attention_row(
    q: jax.Array,
    k: jax.Array,
    *,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    row_index: int,
) -> jax.Array:
    """Just the attention ROW of one query position (the visualization path):
    ``row = (attn1[idx] @ pinv(attn2)) @ attn3`` - O(n*m), no value matmuls.

    Lets the fused Pallas kernels serve ``return_attn`` without falling back to
    the full XLA op: the kernels produce the output, this produces the row.
    q, k: (b, h, n, d) with n a multiple of num_landmarks. Returns (b, h, n).
    """
    b, h, n, d = q.shape
    m = num_landmarks
    acc = jnp.float32
    qf = q.astype(acc) * (d ** -0.5)
    kf = k.astype(acc)
    q_lm = _segment_means(qf, m)
    k_lm = _segment_means(kf, m)

    attn1_row = jax.nn.softmax(
        jnp.einsum("bhd,bhmd->bhm", qf[:, :, row_index], k_lm, preferred_element_type=acc),
        axis=-1,
    )
    attn2 = jax.nn.softmax(
        jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=acc), axis=-1
    )
    attn3 = jax.nn.softmax(
        jnp.einsum("bhmd,bhnd->bhmn", q_lm, kf, preferred_element_type=acc), axis=-1
    )
    row_left = jnp.einsum(
        "bhm,bhml->bhl", attn1_row, newton_schulz_pinv(attn2, pinv_iterations),
        preferred_element_type=acc,
    )
    return jnp.einsum("bhm,bhmn->bhn", row_left, attn3, preferred_element_type=acc)


def nystrom_attention_dense_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
) -> tuple[jax.Array, jax.Array]:
    """Materialized-attention-matrix variant used only in tests.

    Computes ``attn = attn1 @ pinv(attn2) @ attn3`` (n x n) explicitly, mirroring
    the reference dependency's ``return_attn=True`` path, and returns
    ``(attn @ v, attn)``.
    """
    b, h, n, d = q.shape
    out = nystrom_attention(
        q, k, v, num_landmarks=num_landmarks, pinv_iterations=pinv_iterations
    )
    qf = q.astype(jnp.float32) * (d ** -0.5)
    kf = k.astype(jnp.float32)
    q_lm = _segment_means(qf, num_landmarks)
    k_lm = _segment_means(kf, num_landmarks)
    attn1 = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", qf, k_lm), axis=-1)
    attn2 = jax.nn.softmax(jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm), axis=-1)
    attn3 = jax.nn.softmax(jnp.einsum("bhmd,bhnd->bhmn", q_lm, kf), axis=-1)
    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)
    attn = attn1 @ attn2_inv @ attn3  # (b, h, n, n)
    return out.out, attn
