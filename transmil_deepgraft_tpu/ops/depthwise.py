"""Depthwise SAME conv with a GSPMD-safe hand-written VJP.

XLA (jax 0.9.0) miscompiles the WEIGHT gradient of a grouped/depthwise
convolution when the batch dim is sharded over one axis of a multi-axis mesh:
the grad comes back wrong at full scale (delta == scale) while dense convs and
single-axis meshes are exact — minimal repro in
``tests/test_depthwise_vjp.py::test_xla_grouped_grad_repro_documented``. Every
depthwise conv in this framework (TransMIL's PPEG, the Nystrom value-residual
conv, ConvMixer) trains under exactly that layout on a dp x sp / dp x tp mesh,
so this module provides ``depthwise_conv2d``: the forward IS
``lax.conv_general_dilated`` (fast, correct), and the backward is written out
as k*k shifted elementwise products — pads, static slices, multiplies and
reductions only, all ops GSPMD partitions correctly. For a depthwise conv this
is the same FLOP count as the conv itself (k*k multiply-adds per pixel per
channel), so the backward stays VPU-bound at the conv's natural cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _same_pads(k: int) -> tuple[int, int]:
    lo = (k - 1) // 2
    return lo, k - 1 - lo


def _shifted(x_pad, di, dj, h, w):
    """x_pad[:, di:di+h, dj:dj+w, :] — the input window feeding output (i, j)
    for kernel tap (di, dj) under SAME padding."""
    return jax.lax.slice(
        x_pad, (0, di, dj, 0), (x_pad.shape[0], di + h, dj + w, x_pad.shape[3])
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def depthwise_conv2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (B, H, W, C), w (kh, kw, 1, C) -> (B, H, W, C), SAME, stride 1."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _fwd(x, w):
    return depthwise_conv2d(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    b, h, ww_, c = x.shape
    kh, kw = w.shape[0], w.shape[1]
    if kh % 2 == 0 or kw % 2 == 0:
        raise NotImplementedError("odd kernel sizes only (dx shift identity)")
    ph = _same_pads(kh)
    pw = _same_pads(kw)
    acc = jnp.float32

    x_pad = jnp.pad(x.astype(acc), ((0, 0), ph, pw, (0, 0)))
    g_pad = jnp.pad(g.astype(acc), ((0, 0), ph, pw, (0, 0)))

    dw_taps = []
    dx = None
    for di in range(kh):
        for dj in range(kw):
            # dw[di,dj,0,c] = sum_{b,i,j} x_pad[b,i+di,j+dj,c] * g[b,i,j,c]
            dw_taps.append(
                jnp.sum(_shifted(x_pad, di, dj, h, ww_) * g.astype(acc), axis=(0, 1, 2))
            )
            # dx[b,p,q,c] += g_pad[b, p+kh-1-di, q+kw-1-dj, c] * w[di,dj,0,c]
            part = _shifted(g_pad, kh - 1 - di, kw - 1 - dj, h, ww_) * w[di, dj, 0].astype(acc)
            dx = part if dx is None else dx + part

    dw = jnp.stack(dw_taps).reshape(kh, kw, 1, c)
    return dx.astype(x.dtype), dw.astype(w.dtype)


depthwise_conv2d.defvjp(_fwd, _bwd)


def depthwise_conv1d(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (B, N, C), w (k, 1, C) -> (B, N, C), SAME, stride 1 (same safe VJP)."""
    out = depthwise_conv2d(x[:, None], w[None])
    return out[:, 0]
