"""Post-training int8 quantization primitives for frozen conv backbones.

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (measured 369 vs 194
TFLOP/s on an isolated 3x3/256ch conv, BENCHMARKS.md). Frozen feature
extractors (RetCCL ResNet50, ref ``model_interface.py:238-247``) are ideal PTQ
targets: BatchNorm folds into per-channel conv scales at eval time, weights
quantize per-output-channel, activations per-tensor with calibrated scales.

Scheme (symmetric, zero-point-free - TPU-friendly, no cross products):
  w_q[c]  = round(w[..., c] / s_w[c]),   s_w[c] = max|w[..., c]| / 127
  x_q     = round(x / s_x)               s_x calibrated (max|x| over batches)
  conv    = lax.conv(x_q, w_q) -> int32
  y       = acc * (s_x * s_w[c]) + bias[c]   (bf16 epilogue, fused by XLA)
  y_q     = clip(round(relu(y) / s_y), -127, 127)  for the next layer
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QConv(NamedTuple):
    """One folded+quantized convolution."""

    w_q: jax.Array  # int8 HWIO
    w_scale: jax.Array  # (C_out,) f32: s_w per output channel
    bias: jax.Array  # (C_out,) f32: BN-folded bias
    in_scale: jax.Array  # () f32: calibrated input activation scale s_x


def fold_bn(
    kernel: np.ndarray,
    bn_scale: np.ndarray,
    bn_bias: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-5,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold eval-mode BatchNorm into the preceding conv: returns (kernel', bias')."""
    inv = bn_scale / np.sqrt(bn_var + eps)
    return kernel * inv, bn_bias - bn_mean * inv


def quantize_weight(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: returns (w_q int8 HWIO, s_w (C_out,))."""
    absmax = np.max(np.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    s_w = np.maximum(absmax, 1e-12) / 127.0
    w_q = np.clip(np.round(kernel / s_w), -127, 127).astype(np.int8)
    return w_q, s_w.astype(np.float32)


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """f32/bf16 -> int8 with a per-tensor scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quantize_act_relu(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Asymmetric quantization for ReLU outputs (x >= 0), stored int8 with a
    fixed zero point of -128: x in [0, 255*scale] maps onto the FULL int8 range
    (8 effective bits instead of 7). The zero-point correction
    ``128 * s_x * s_w[c] * colsum(w_q)[c]`` is constant and folds into the conv
    bias at build time (see ``zero_point_bias``), so the runtime cost is nil."""
    q = jnp.round(x.astype(jnp.float32) / scale) - 128.0
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def zero_point_bias(w_q: np.ndarray, in_scale: float, w_scale: np.ndarray) -> np.ndarray:
    """Bias correction for zero-point -128 inputs: +128 * s_x * s_w * colsum(w_q)."""
    colsum = w_q.astype(np.float64).sum(axis=tuple(range(w_q.ndim - 1)))
    return (128.0 * in_scale * w_scale.astype(np.float64) * colsum).astype(np.float32)


def conv_i8(
    x_q: jax.Array, qc: QConv, stride: int = 1, padding: str | list = "SAME"
) -> jax.Array:
    """int8 conv -> f32 dequantized output (pre-activation): acc * s_x*s_w + b."""
    acc = jax.lax.conv_general_dilated(
        x_q,
        qc.w_q,
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    mult = (qc.in_scale * qc.w_scale).astype(jnp.float32)
    return acc.astype(jnp.float32) * mult + qc.bias
