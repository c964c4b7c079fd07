"""PPEG: Pyramid Position Encoding Generator as fused depthwise convolutions.

The reference (``code/models/TransMIL.py:60-75``) reshapes the N = H*W feature
tokens to a (B, C, H, W) grid and sums identity + depthwise Conv2d 7x7 + 5x5 + 3x3
(groups = C). Here the grid lives in NHWC (TPU-native layout) and the three
depthwise convs are XLA ``conv_general_dilated`` calls with
``feature_group_count=C``; XLA fuses the adds. The cls token bypasses the conv and
is re-attached by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depthwise_conv2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 2D conv, NHWC input, kernel (kh, kw, 1, C), SAME padding.
    Delegates to the GSPMD-safe custom-VJP op (ops/depthwise.py)."""
    from transmil_deepgraft_tpu.ops.depthwise import depthwise_conv2d as _dw

    return _dw(x, kernel)


def ppeg_conv(
    tokens: jax.Array,
    h: int,
    w: int,
    k7: jax.Array,
    k5: jax.Array,
    k3: jax.Array,
    b7: jax.Array | None = None,
    b5: jax.Array | None = None,
    b3: jax.Array | None = None,
) -> jax.Array:
    """Apply PPEG to feature tokens (B, N, C) with N == h*w.

    kernels: (7,7,1,C), (5,5,1,C), (3,3,1,C) HWIO depthwise filters (the layout
    ``ops.depthwise.depthwise_conv2d`` takes and the torch converter emits);
    optional biases (C,).
    Returns (B, N, C) = tokens + dw7(tokens) + dw5(tokens) + dw3(tokens) on the
    h x w grid.
    """
    b, n, c = tokens.shape
    if n != h * w:
        raise ValueError(f"PPEG expects N == H*W, got {n} != {h}*{w}")
    grid = tokens.reshape(b, h, w, c)
    out = grid
    for k, bias in ((k7, b7), (k5, b5), (k3, b3)):
        y = depthwise_conv2d(grid, k)
        if bias is not None:
            y = y + bias
        out = out + y
    return out.reshape(b, n, c)
