"""ConvMixer (patch embed + depthwise/pointwise residual mixer).

Inventory-parity port of the reference's teaching implementation
(``code/models/ConvMixer.py:8-181``; unused by its drivers). NHWC, GELU+BN.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


class _DWConv(nn.Module):
    """nn.Conv-compatible depthwise conv (same param tree) routed through the
    GSPMD-safe custom VJP (ops/depthwise.py)."""

    dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        from transmil_deepgraft_tpu.ops.depthwise import depthwise_conv2d

        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, 1, self.dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return depthwise_conv2d(x, k) + b


class ConvMixer(nn.Module):
    dim: int = 256
    depth: int = 8
    kernel_size: int = 9
    patch_size: int = 7
    n_classes: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train)
        h = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(x)
        h = bn(name="patch_bn")(nn.gelu(h, approximate=False))
        for i in range(self.depth):
            r = _DWConv(self.dim, self.kernel_size, name=f"dw_{i}")(h)
            h = h + bn(name=f"dw_bn_{i}")(nn.gelu(r, approximate=False))
            p = nn.Conv(self.dim, (1, 1), name=f"pw_{i}")(h)
            h = bn(name=f"pw_bn_{i}")(nn.gelu(p, approximate=False))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)
