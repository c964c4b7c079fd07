"""Fused Pallas TPU kernels for Nystrom attention (the TransMIL hot path).

The XLA-level implementation (``ops/nystrom.py``) materializes two n x m
attention matrices in HBM (attn1: n x 256 and attn3: 256 x n - ~340 MB of f32
traffic for a 40k-patch slide at 8 heads). These kernels keep both inside VMEM:

- :func:`landmark_attention`: ``attn3_v = softmax(q_lm @ k^T) @ v`` via
  flash-style online softmax - q_lm (m x d) stays resident while K/V stream in
  tiles over the sequence (sequential grid axis).
- :func:`query_landmark_attention`: ``out = softmax(q @ k_lm^T) @ B`` where
  ``B = pinv(attn2) @ attn3_v`` is a small m x d matrix - each q tile computes
  its full m-wide softmax row in registers and immediately contracts with B
  (parallel grid).

The tiny m x m work (landmark Gram softmax + Newton-Schulz pinv) and the
segment-mean landmarks stay in XLA where they are already optimal.

``nystrom_attention_fused`` wires everything together under ``jax.custom_vjp``:
forward = fused kernels, backward = VJP of the XLA reference (recomputed), so
training works out of the box while inference takes the fast path. Golden tests
compare both against ``ops.nystrom.nystrom_attention``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmil_deepgraft_tpu.ops.nystrom import _segment_means, nystrom_attention
from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv

NEG_INF = -1e30
_LANES = 128


def _landmark_attn_kernel(qlm_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, n_real, block_n):
    """Online-softmax flash kernel: queries = landmarks (resident), keys stream.

    Grid (bh, n_tiles); n_tiles is the sequential reduction axis.
    qlm_ref: (m, d), k_ref/v_ref: (block_n, d), o_ref: (m, d).
    Scratch: m_ref/l_ref (m, _LANES) f32, acc_ref (m, d) f32.
    Key positions >= n_real (wrapper padding to a big block size) are masked out.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = qlm_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    if n_real % block_n != 0:
        # zero padded V rows (Pallas pads trailing blocks with undefined data:
        # 0 * NaN would poison the p @ v contraction) and mask padded keys.
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row + j * block_n < n_real, v, 0)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (m, block_n)
    if n_real % block_n != 0:  # mask padded key columns in the final tiles
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + j * block_n < n_real, s, NEG_INF)

    m_prev = m_ref[:, :1]  # (m, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # (m, block_n)
    l_next = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def landmark_attention(q_lm: jax.Array, k: jax.Array, v: jax.Array, *, block_n: int = 1024) -> jax.Array:
    """softmax(q_lm @ k^T, axis=-1) @ v, shapes (bh, m, d), (bh, n, d), (bh, n, d).

    n need not divide block_n: keys are zero-padded to the block boundary and
    masked inside the kernel (big MXU tiles regardless of bag length)."""
    bh, m, d = q_lm.shape
    _, n, _ = k.shape
    block_n = min(block_n, max(n, 1))
    n_real = n
    # Non-divisible n: Pallas pads the trailing block internally (no HBM pad
    # copies); the kernel masks the out-of-range key columns itself.
    grid = (bh, pl.cdiv(n, block_n))
    return pl.pallas_call(
        functools.partial(_landmark_attn_kernel, n_real=n_real, block_n=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, _LANES), jnp.float32),
            pltpu.VMEM((m, _LANES), jnp.float32),
            pltpu.VMEM((m, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q_lm, k, v)


def _query_lm_kernel(q_ref, klm_ref, b_ref, o_ref):
    """out_tile = softmax(q_tile @ k_lm^T) @ B; everything VMEM-resident."""
    q = q_ref[0]
    klm = klm_ref[0]
    s = jax.lax.dot_general(
        q, klm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_n, m)
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    b = b_ref[0]
    o_ref[0] = jax.lax.dot_general(
        p.astype(b.dtype), b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def query_landmark_attention(q: jax.Array, k_lm: jax.Array, b: jax.Array, *, block_n: int = 1024) -> jax.Array:
    """softmax(q @ k_lm^T, axis=-1) @ b; q (bh, n, d), k_lm (bh, m, d), b (bh, m, d).

    n need not divide block_n: padded query rows compute garbage that the
    wrapper slices off."""
    bh, n, d = q.shape
    _, m, _ = k_lm.shape
    block_n = min(block_n, max(n, 1))

    def kernel(q_ref, klm_ref, b_ref, o_ref):
        _query_lm_kernel(q_ref, klm_ref, b_ref, o_ref)

    out = pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k_lm, b)
    return out


def _landmark_attn_kernel_packed(qlm_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, n_real, block_n):
    """All-heads packed variant: blocks are (block_n, h, d) slices of the
    (b, n, h, d) K/V planes (direct views of the qkv projection - no HBM
    transposes). Online softmax runs per head inside the kernel.

    qlm_ref: (h, m, d) resident; o_ref: (h, m, d); scratch m/l: (h*m, _LANES),
    acc: (h, m, d).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = qlm_ref[...]  # (h, m, d)
    # VMEM-local head-major transpose (Mosaic batched matmul needs batch dims
    # in the same position on both operands)
    k = jnp.swapaxes(k_ref[0], 0, 1)  # (h, block_n, d)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    h, m, d = q.shape

    if n_real % block_n != 0:
        # zero padded V rows (undefined pad data: 0 * NaN poisons p @ v)
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(row + j * block_n < n_real, v, 0)
    # s[h, m, block_n] = q[h] @ k[h].T  (batched over heads)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, m, block_n)
    if n_real % block_n != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col + j * block_n < n_real, s, NEG_INF)

    m_prev = m_ref[:, :1].reshape(h, m, 1)
    l_prev = l_ref[:, :1].reshape(h, m, 1)
    m_cur = jnp.max(s, axis=2, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # (h, m, block_n)
    l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)

    # pv[h, m, d] = p[h] @ v[h]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_next.reshape(h * m, 1), m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next.reshape(h * m, 1), l_ref.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / l_ref[:, :1].reshape(h, m, 1)).astype(o_ref.dtype)


def _query_lm_kernel_packed(q_ref, klm_ref, b_ref, o_ref):
    """out[n, h, d] = softmax_m(q[n, h] @ k_lm[h]^T) @ B[h]; all heads per block."""
    q = jnp.swapaxes(q_ref[0], 0, 1)  # (h, block_n, d) VMEM transpose
    klm = klm_ref[...]  # (h, m, d)
    bmat = b_ref[...]  # (h, m, d)
    s = jax.lax.dot_general(
        q, klm, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, block_n, m)
    s = s - jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(bmat.dtype), bmat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, block_n, d)
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def nystrom_attention_fused_packed(
    qkv: jax.Array,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    block_n: int = 1024,
    scale: float | None = None,
) -> jax.Array:
    """Fused Nystrom attention over the packed (b, n, 3, h, d) qkv projection.

    The q/k/v planes are consumed as (b, n, h, d) contiguous views (plane slices
    of the projection output) and the kernels process all heads per block, so no
    (b, h, n, d) transposes ever hit HBM. q is scaled by ``scale`` (default
    d**-0.5). Returns (b, n, h, d) f32 - reshape to (b, n, h*d) is free for the
    out-projection.
    """
    b, n, three, h, d = qkv.shape
    assert three == 3
    m = num_landmarks
    block_n = min(block_n, max(n, 1))
    scale = d ** -0.5 if scale is None else scale
    acc = jnp.float32

    q_plane = qkv[:, :, 0]  # (b, n, h, d) contiguous views
    k_plane = qkv[:, :, 1]
    v_plane = qkv[:, :, 2]

    # landmarks (m-row outputs; one cheap strided pass)
    seg = n // m
    q_lm = jnp.moveaxis(
        jnp.mean(q_plane.reshape(b, m, seg, h, d).astype(acc), axis=2), 2, 1
    ) * scale  # (b, h, m, d)
    k_lm = jnp.moveaxis(jnp.mean(k_plane.reshape(b, m, seg, h, d).astype(acc), axis=2), 2, 1)

    attn2 = jax.nn.softmax(
        jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=acc), axis=-1
    )
    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)

    in_dtype = qkv.dtype
    qlm_b = q_lm.astype(in_dtype)  # (b, h, m, d)
    klm_scaled = (k_lm * scale).astype(in_dtype)

    grid = (b, pl.cdiv(n, block_n))
    plane_spec = pl.BlockSpec(
        (1, block_n, h, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    lm_spec = pl.BlockSpec((1, h, m, d), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    def k1(qlm_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        _landmark_attn_kernel_packed(
            qlm_ref.at[0], k_ref, v_ref, o_ref.at[0], m_ref, l_ref, acc_ref,
            n_real=n, block_n=block_n,
        )

    attn3_v = pl.pallas_call(
        k1,
        grid=grid,
        in_specs=[lm_spec, plane_spec, plane_spec],
        out_specs=lm_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, m, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h * m, _LANES), jnp.float32),
            pltpu.VMEM((h * m, _LANES), jnp.float32),
            pltpu.VMEM((h, m, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qlm_b, k_plane, v_plane)

    bmat = jnp.matmul(attn2_inv, attn3_v.astype(acc), preferred_element_type=acc).astype(in_dtype)

    def k2(q_ref, klm_ref, b_ref, o_ref):
        _query_lm_kernel_packed(q_ref, klm_ref.at[0], b_ref.at[0], o_ref)

    out = pl.pallas_call(
        k2,
        grid=grid,
        in_specs=[plane_spec, lm_spec, lm_spec],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_plane, klm_scaled, bmat)
    return out


def _fused_forward(q, k, v, num_landmarks, pinv_iterations, block_n):
    b, h, n, d = q.shape
    m = num_landmarks
    in_dtype = q.dtype
    qs = q * jnp.asarray(d ** -0.5, in_dtype)

    q_lm = _segment_means(qs.astype(jnp.float32), m)
    k_lm = _segment_means(k.astype(jnp.float32), m)

    attn2 = jax.nn.softmax(
        jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=jnp.float32), axis=-1
    )
    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)  # (b, h, m, m) fp32

    qlm_f = q_lm.astype(in_dtype).reshape(b * h, m, d)
    k_f = k.reshape(b * h, n, d)
    v_f = v.reshape(b * h, n, d)
    attn3_v = landmark_attention(qlm_f, k_f, v_f, block_n=block_n)  # (bh, m, d) fp32

    bmat = jnp.matmul(
        attn2_inv.reshape(b * h, m, m), attn3_v, preferred_element_type=jnp.float32
    ).astype(in_dtype)  # (bh, m, d)
    out = query_landmark_attention(
        qs.reshape(b * h, n, d), k_lm.astype(in_dtype).reshape(b * h, m, d), bmat,
        block_n=block_n,
    )
    return out.reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def nystrom_attention_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    block_n: int = 1024,
) -> jax.Array:
    """Fused-kernel Nystrom attention; same semantics as
    ``ops.nystrom.nystrom_attention(...).out`` (n must divide block_n)."""
    return _fused_forward(q, k, v, num_landmarks, pinv_iterations, block_n)


def _fwd(q, k, v, num_landmarks, pinv_iterations, block_n):
    return _fused_forward(q, k, v, num_landmarks, pinv_iterations, block_n), (q, k, v)


def _bwd(num_landmarks, pinv_iterations, block_n, residuals, g):
    del block_n
    q, k, v = residuals
    dq, dk, dv = nystrom_attention_bwd(
        q, k, v, g, num_landmarks=num_landmarks, pinv_iterations=pinv_iterations
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


nystrom_attention_fused.defvjp(_fwd, _bwd)


def _softmax_rows(s):
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _softmax_vjp(a, da):
    """d s for y = softmax(s) rows given a = softmax(s) and da = dy."""
    return a * (da - jnp.sum(a * da, axis=-1, keepdims=True))


def _expand_segments(x_lm, n):
    """(..., m, d) -> (..., n, d): broadcast each landmark over its segment."""
    *lead, m, d = x_lm.shape
    seg = n // m
    return jnp.broadcast_to(
        x_lm[..., :, None, :], (*lead, m, seg, d)
    ).reshape(*lead, n, d)


def nystrom_attention_bwd(q, k, v, g, *, num_landmarks, pinv_iterations):
    """Analytic VJP of Nystrom attention (flash-style: never reruns the forward
    as a black box, touches only n x m intermediates - the same memory class as
    the forward; no n x n matrix ever exists).

    Forward being differentiated (ops/nystrom.py semantics):
      Qs = Q * d**-0.5;  Qlm = segmean(Qs);  Klm = segmean(K)
      A1 = softmax(Qs Klm^T);  A2 = softmax(Qlm Klm^T);  Z = NSpinv(A2)
      A3 = softmax(Qlm K^T);   W3 = A3 V;    OUT = A1 (Z W3)

    Returns (dQ, dK, dV) in f32.
    """
    b, h, n, d = q.shape
    m = num_landmarks
    seg = n // m
    acc = jnp.float32
    scale = d ** -0.5

    qs = q.astype(acc) * scale
    kf = k.astype(acc)
    vf = v.astype(acc)
    q_lm = _segment_means(qs, m)
    k_lm = _segment_means(kf, m)

    # recompute the small pieces (cheap); differentiate the pinv by autodiff of
    # the Newton-Schulz iteration itself (exact VJP of what the forward ran)
    s2 = jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=acc)
    a2 = _softmax_rows(s2)
    z, pinv_vjp = jax.vjp(lambda a: newton_schulz_pinv(a, pinv_iterations), a2)

    a1 = _softmax_rows(jnp.einsum("bhnd,bhmd->bhnm", qs, k_lm, preferred_element_type=acc))
    s3 = jnp.einsum("bhmd,bhnd->bhmn", q_lm, kf, preferred_element_type=acc)
    a3 = _softmax_rows(s3)
    w3 = jnp.einsum("bhmn,bhnd->bhmd", a3, vf, preferred_element_type=acc)
    bmat = jnp.matmul(z, w3, preferred_element_type=acc)  # (b,h,m,d)

    gf = g.astype(acc)
    # OUT = A1 @ B
    da1 = jnp.einsum("bhnd,bhmd->bhnm", gf, bmat, preferred_element_type=acc)
    dbmat = jnp.einsum("bhnm,bhnd->bhmd", a1, gf, preferred_element_type=acc)

    # B = Z @ W3
    dz = jnp.einsum("bhmd,bhld->bhml", dbmat, w3, preferred_element_type=acc)
    dw3 = jnp.einsum("bhlm,bhld->bhmd", z, dbmat, preferred_element_type=acc)

    # Z = NSpinv(A2); A2 = softmax(S2)
    (da2,) = pinv_vjp(dz)
    ds2 = _softmax_vjp(a2, da2)

    # W3 = A3 @ V; A3 = softmax(S3)
    da3 = jnp.einsum("bhmd,bhnd->bhmn", dw3, vf, preferred_element_type=acc)
    dv = jnp.einsum("bhmn,bhmd->bhnd", a3, dw3, preferred_element_type=acc)
    ds3 = _softmax_vjp(a3, da3)

    # A1 = softmax(S1), S1 = Qs Klm^T
    ds1 = _softmax_vjp(a1, da1)

    # gradient flows into Qs (direct + via Qlm), K (direct + via Klm)
    dqs = jnp.einsum("bhnm,bhmd->bhnd", ds1, k_lm, preferred_element_type=acc)
    dq_lm = (
        jnp.einsum("bhml,bhld->bhmd", ds2, k_lm, preferred_element_type=acc)
        + jnp.einsum("bhmn,bhnd->bhmd", ds3, kf, preferred_element_type=acc)
    )
    dk_lm = (
        jnp.einsum("bhml,bhmd->bhld", ds2, q_lm, preferred_element_type=acc)
        + jnp.einsum("bhnm,bhnd->bhmd", ds1, qs, preferred_element_type=acc)
    )
    dk = jnp.einsum("bhmn,bhmd->bhnd", ds3, q_lm, preferred_element_type=acc)

    # segment-mean backward: each landmark grad spreads 1/seg over its segment
    dqs = dqs + _expand_segments(dq_lm, n) / seg
    dk = dk + _expand_segments(dk_lm, n) / seg
    dq = dqs * scale
    return dq, dk, dv


def _packed_reference(qkv, num_landmarks, pinv_iterations):
    """XLA reference with packed I/O layout (golden tests only)."""
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
    out = nystrom_attention(
        q, k, v, num_landmarks=num_landmarks, pinv_iterations=pinv_iterations
    ).out
    return jnp.moveaxis(out, 1, 2)  # (b, n, h, d)


def _packed_fwd(qkv, num_landmarks, pinv_iterations, block_n, scale):
    out = nystrom_attention_fused_packed.__wrapped__(
        qkv, num_landmarks, pinv_iterations, block_n, scale
    )
    return out, qkv


def _packed_bwd(num_landmarks, pinv_iterations, block_n, scale, qkv, g):
    """Analytic backward (no XLA-reference forward recompute): unpack planes,
    run :func:`nystrom_attention_bwd`, repack into the (b, n, 3, h, d) layout."""
    del block_n
    b, n, _, h, d = qkv.shape
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
    if scale is not None:
        # forward scaled q by `scale` instead of d**-0.5: fold the ratio in
        q = q * (scale / (d ** -0.5))
    dq, dk, dv = nystrom_attention_bwd(
        q, k, v, jnp.moveaxis(g, 2, 1),
        num_landmarks=num_landmarks, pinv_iterations=pinv_iterations,
    )
    if scale is not None:
        dq = dq * (scale / (d ** -0.5))
    dqkv = jnp.stack(
        [jnp.moveaxis(dq, 1, 2), jnp.moveaxis(dk, 1, 2), jnp.moveaxis(dv, 1, 2)], axis=2
    )
    return (dqkv.astype(qkv.dtype),)


nystrom_attention_fused_packed.defvjp(_packed_fwd, _packed_bwd)
