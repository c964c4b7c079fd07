"""Fully-fused TransLayer inference kernel (projections INSIDE the kernels).

Round 1's standalone attention kernels beat XLA on the isolated op but lost at
the layer level because XLA fuses the qkv/out projections around the attention
(VERDICT.md weak #1). This module fuses the ENTIRE pre-norm Nystrom block

    y = x + W_out( attn(LN(x)) + res_conv(V) ) + b_out

into two streaming Pallas kernels plus tiny XLA glue, so the (n, 3D) qkv
projection never exists in HBM:

  XLA    : x_lm = segmean(LN(x)) (fused reduce), landmark Gram + NS-pinv
  Kernel1: stream x blocks -> LN -> K/V projection -> flash-accumulate
           attn3_v = softmax(q_lm K^T) V; side-writes V (bf16) for the conv
  XLA    : B = pinv @ attn3_v; res = depthwise_conv(V) (one fused conv)
  Kernel2: stream x blocks -> LN -> Q projection -> softmax(Q k_lm^T) @ B
           -> + res -> @ W_out + b_out -> + x  (the whole epilogue fused)

HBM traffic per layer: read x twice + V/res side traffic + write y, vs the
XLA path's qkv materialization (n x 3D write+read) plus separate attention
matrices. Inference only (dropout-free path); training uses the op-level
fused kernels with the analytic backward (nystrom_kernel.py).

Ref semantics: ``code/models/TransMIL.py:19-57`` + the nystrom_attention
dependency (front zero-pad, segment-mean landmarks, (33, 1) depthwise value
residual); numerics golden-tested vs the XLA layer in
``tests/test_pallas_nystrom.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv

NEG_INF = -1e30
_LANES = 128


def _layernorm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _k1(
    x_ref, lns_ref, lnb_ref, wk_ref, wv_ref, qlm_ref,
    o_ref, v_out_ref, m_ref, l_ref, acc_ref,
    *, n_real, block_n, heads, dim_head,
):
    """Stream x: LN -> K/V proj -> flash attn3_v accumulate; V side output."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ln = _layernorm(x_ref[0], lns_ref[0], lnb_ref[0])  # (bn, D) f32
    dt = wk_ref.dtype
    k = jnp.dot(ln.astype(dt), wk_ref[...], preferred_element_type=jnp.float32)
    v = jnp.dot(ln.astype(dt), wv_ref[...], preferred_element_type=jnp.float32)

    if n_real % block_n != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row + j * block_n < n_real, v, 0)
        k = jnp.where(row + j * block_n < n_real, k, 0)
    v_out_ref[0] = v.astype(v_out_ref.dtype)

    h, d = heads, dim_head
    m = qlm_ref.shape[2]
    last = j == pl.num_programs(1) - 1
    # per-head 2-D math (Mosaic cannot lane-split (bn, h*d) -> (bn, h, d))
    for hh in range(h):
        kh = k[:, hh * d:(hh + 1) * d]  # (bn, d)
        vh = v[:, hh * d:(hh + 1) * d]
        qlm_h = qlm_ref[0, hh].astype(jnp.float32)  # (m, d)
        s = jax.lax.dot_general(
            qlm_h, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (m, bn)
        if n_real % block_n != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + j * block_n < n_real, s, NEG_INF)

        m_prev = m_ref[hh * m:(hh + 1) * m, :1]  # (m, 1)
        l_prev = l_ref[hh * m:(hh + 1) * m, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (m, d)
        acc_ref[hh] = acc_ref[hh] * alpha + pv
        m_ref[hh * m:(hh + 1) * m, :] = jnp.broadcast_to(m_next, (m, m_ref.shape[1]))
        l_ref[hh * m:(hh + 1) * m, :] = jnp.broadcast_to(l_next, (m, l_ref.shape[1]))

        @pl.when(last)
        def _finalize(hh=hh):
            o_ref[0, hh] = (acc_ref[hh] / l_ref[hh * m:(hh + 1) * m, :1]).astype(o_ref.dtype)


def _k2(
    x_ref, res_ref, lns_ref, lnb_ref, wq_ref, klm_ref, b_ref, wo_ref, bo_ref,
    y_ref, *, heads, dim_head, scale,
):
    """Stream x: LN -> Q proj -> softmax(Q k_lm^T) @ B -> +res -> out proj -> +x."""
    x = x_ref[0]
    ln = _layernorm(x, lns_ref[0], lnb_ref[0])
    dt = wq_ref.dtype
    q = jnp.dot(ln.astype(dt), wq_ref[...], preferred_element_type=jnp.float32) * scale

    h, d = heads, dim_head
    per_head = []
    for hh in range(h):
        qh = q[:, hh * d:(hh + 1) * d]  # (bn, d)
        klm_h = klm_ref[0, hh].astype(jnp.float32)  # (m, d)
        s = jax.lax.dot_general(
            qh, klm_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bn, m)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        per_head.append(jax.lax.dot_general(
            p, b_ref[0, hh].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))  # (bn, d)
    attn = jnp.concatenate(per_head, axis=1)  # (bn, h*d)

    inner = (attn + res_ref[0].astype(jnp.float32)).astype(dt)
    y = jnp.dot(inner, wo_ref[...], preferred_element_type=jnp.float32)
    y_ref[0] = (y + bo_ref[0] + x.astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "num_landmarks", "pinv_iterations", "block_n"),
)
def fused_translayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w_qkv: jax.Array,  # (D, 3*inner)
    w_out: jax.Array,  # (inner, D)
    b_out: jax.Array,  # (D,)
    res_kernel: jax.Array,  # (33, heads) depthwise value-residual weights
    *,
    heads: int = 8,
    dim_head: int = 64,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    block_n: int = 1024,
) -> jax.Array:
    """One fused pre-norm Nystrom TransLayer (inference): y = x + attn-block(x).

    ``x``: (b, n, D) with n already a multiple of ``num_landmarks`` (the
    caller front-pads, ref F.pad semantics). Returns (b, n, D) in x.dtype.
    """
    b, n, dd = x.shape
    inner = heads * dim_head
    m = num_landmarks
    block_n = min(block_n, n)
    scale = dim_head ** -0.5
    seg = n // m

    w_q = w_qkv[:, :inner]
    w_k = w_qkv[:, inner : 2 * inner]
    w_v = w_qkv[:, 2 * inner :]

    # landmarks: segmean(LN(x)) @ W (LN+reduce fuse in XLA; nothing big lands)
    lnx = _layernorm(x, ln_scale, ln_bias)
    x_lm = jnp.mean(lnx.reshape(b, m, seg, dd), axis=2)  # (b, m, D)
    q_lm = (x_lm @ w_q.astype(jnp.float32)).reshape(b, m, heads, dim_head)
    k_lm = (x_lm @ w_k.astype(jnp.float32)).reshape(b, m, heads, dim_head)
    q_lm = jnp.moveaxis(q_lm, 2, 1) * scale  # (b, h, m, d)
    k_lm = jnp.moveaxis(k_lm, 2, 1)

    attn2 = jax.nn.softmax(
        jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=jnp.float32),
        axis=-1,
    )
    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)

    grid = (b, pl.cdiv(n, block_n))
    xspec = pl.BlockSpec((1, block_n, dd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    lm_spec = pl.BlockSpec(
        (1, heads, m, dim_head), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, dd), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    in_dtype = x.dtype
    attn3_v, v_side = pl.pallas_call(
        functools.partial(
            _k1, n_real=n, block_n=block_n, heads=heads, dim_head=dim_head
        ),
        grid=grid,
        in_specs=[
            xspec,
            vec_spec, vec_spec,
            wspec((dd, inner)), wspec((dd, inner)),
            pl.BlockSpec((1, heads, m, dim_head), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(lm_spec, xspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, heads, m, dim_head), jnp.float32),
            jax.ShapeDtypeStruct((b, n, inner), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((heads * m, _LANES), jnp.float32),
            pltpu.VMEM((heads * m, _LANES), jnp.float32),
            pltpu.VMEM((heads, m, dim_head), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        x,
        ln_scale.reshape(1, dd).astype(jnp.float32), ln_bias.reshape(1, dd).astype(jnp.float32),
        w_k.astype(in_dtype), w_v.astype(in_dtype),
        jnp.asarray(q_lm, in_dtype),
    )

    bmat = jnp.matmul(
        attn2_inv, attn3_v.astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(in_dtype)  # (b, h, m, d)

    # depthwise (33,) value-residual conv per head over the sequence
    # (torch Conv2d(h, h, (33,1), groups=h); run as a full-lane 1-D conv)
    kern = jnp.repeat(res_kernel.astype(jnp.float32), dim_head, axis=1)[:, None, :]
    res = jax.lax.conv_general_dilated(
        v_side, kern, (1,), ((16, 16),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=inner,
    )  # (b, n, inner) f32

    y = pl.pallas_call(
        functools.partial(_k2, heads=heads, dim_head=dim_head, scale=scale),
        grid=grid,
        in_specs=[
            xspec,
            pl.BlockSpec((1, block_n, inner), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            vec_spec, vec_spec,
            wspec((dd, inner)),
            lm_spec, lm_spec,
            wspec((inner, dd)),
            vec_spec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n, dd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        x, res,
        ln_scale.reshape(1, dd).astype(jnp.float32), ln_bias.reshape(1, dd).astype(jnp.float32),
        w_q.astype(in_dtype),
        jnp.asarray(k_lm, in_dtype), bmat,
        w_out.astype(in_dtype), b_out.reshape(1, dd).astype(jnp.float32),
    )
    return y
