"""ConvMixer (patch embed + depthwise/pointwise residual mixer).

Inventory-parity port of the reference's teaching implementation
(``code/models/ConvMixer.py:8-181``; unused by its drivers). NHWC, GELU+BN.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


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
            r = nn.Conv(
                self.dim, (self.kernel_size, self.kernel_size), padding="SAME",
                feature_group_count=self.dim, name=f"dw_{i}",
            )(h)
            h = h + bn(name=f"dw_bn_{i}")(nn.gelu(r, approximate=False))
            p = nn.Conv(self.dim, (1, 1), name=f"pw_{i}")(h)
            h = bn(name=f"pw_bn_{i}")(nn.gelu(p, approximate=False))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)
