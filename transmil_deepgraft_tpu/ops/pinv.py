"""Iterative Moore-Penrose pseudo-inverse (Newton-Schulz, order-3 variant).

The Nystrom landmark kernel matrix ``A = softmax(q_lm @ k_lm^T)`` (shape
``(..., m, m)``) must be (pseudo-)inverted inside the attention op. The reference
stack gets this from the ``nystrom_attention`` pip package which runs the
Nystromformer paper's 6-step iteration

    Z_0   = A^T / (max_i sum_j |A_ij| * max_j sum_i |A_ij|)
    Z_t+1 = 1/4 * Z_t (13 I - A Z_t (15 I - A Z_t (7 I - A Z_t)))

entirely as dense matmuls. On TPU these are 256x256 (per head) MXU matmuls; the
sequential chain of 6 iterations x 3 matmuls is the latency-critical part of the
TransMIL forward (SURVEY.md section 7 "hard parts").

Parity note: the initialization divides by the *global* max row-sum and max
col-sum across every batch/head (a single scalar), matching the reference
dependency's ``torch.max`` over the whole tensor.

Gradient note (deliberate deviation): the init scale is wrapped in
``stop_gradient``. For the row-stochastic ``A`` this op sees, every row-sum is
exactly 1 up to f32 rounding, so the global max is a near-perfect TIE across
all b*h*m rows — its subgradient routes the cotangent through whichever
element happens to win the floating-point reduction, and *flips* under any
reduction reorder (batch composition, data-parallel sharding). The reference's
``torch.max`` autograds through the same degenerate tie and inherits that
noise (its gradients change with DDP world size for the same global batch).
The true derivative through a converged Newton-Schulz init is ~0, so stopping
it is both closer to the exact pinv gradient and makes training grads
batch-additive and sharding-invariant (tests/test_pinv_grad_stability.py).
Forward values are bit-identical either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def newton_schulz_pinv(a: jax.Array, iters: int = 6) -> jax.Array:
    """Approximate pseudo-inverse of ``a`` (shape ``(..., m, m)``).

    Args:
      a: batch of square matrices; for Nystrom attention these are row-stochastic
         (softmax outputs), which the initialization's scaling assumes.
      iters: number of Newton-Schulz iterations (reference uses 6).

    Returns:
      ``pinv(a)`` with the same shape/dtype as ``a`` (accumulated in float32).
    """
    orig_dtype = a.dtype
    a32 = a.astype(jnp.float32)
    abs_a = jnp.abs(a32)
    max_row_sum = jnp.max(jnp.sum(abs_a, axis=-1))
    max_col_sum = jnp.max(jnp.sum(abs_a, axis=-2))
    # init-scale gradient is an ill-defined tie-break (see module docstring)
    denom = jax.lax.stop_gradient(max_row_sum * max_col_sum)
    z = jnp.swapaxes(a32, -1, -2) / denom

    m = a.shape[-1]
    eye = jnp.eye(m, dtype=jnp.float32)

    def body(_, z):
        az = jnp.matmul(a32, z, preferred_element_type=jnp.float32)
        inner = 7.0 * eye - az
        inner = 15.0 * eye - jnp.matmul(az, inner, preferred_element_type=jnp.float32)
        inner = 13.0 * eye - jnp.matmul(az, inner, preferred_element_type=jnp.float32)
        return 0.25 * jnp.matmul(z, inner, preferred_element_type=jnp.float32)

    z = jax.lax.fori_loop(0, iters, body, z)
    return z.astype(orig_dtype)
