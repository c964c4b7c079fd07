"""EfficientNet-B0 backbone in flax (the reference's 'efficientnet' backbone,
loaded there from NVIDIA torchhub ``nvidia_efficientnet_widese_b0`` and capped
with Linear(1280, out)+GELU, ref ``model_interface.py:260-267``).

Standard B0 topology: stem conv32 -> MBConv stages
(e1 k3 s1 c16 x1, e6 k3 s2 c24 x2, e6 k5 s2 c40 x2, e6 k3 s2 c80 x3,
 e6 k5 s1 c112 x3, e6 k5 s2 c192 x4, e6 k3 s1 c320 x1) -> head conv1280 ->
global pool. SiLU activations, squeeze-excite ratio 0.25, BN running stats
(frozen-backbone eval mode by default). NHWC throughout.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand, kernel, stride, channels, repeats)
B0_STAGES: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


class SqueezeExcite(nn.Module):
    reduced: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(self.reduced, (1, 1), name="reduce")(s))
        s = jax.nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), name="expand")(s))
        return x * s


class MBConv(nn.Module):
    expand: int
    kernel: int
    stride: int
    out_ch: int
    se_ratio: float = 0.25
    widese: bool = False  # NVIDIA 'widese': SE bottleneck from EXPANDED width

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-3)
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(h)
            h = nn.silu(bn(name="expand_bn")(h))
        h = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(self.kernel // 2,) * 2] * 2, feature_group_count=mid,
            use_bias=False, name="dw_conv",
        )(h)
        h = nn.silu(bn(name="dw_bn")(h))
        se_base = mid if self.widese else in_ch
        h = SqueezeExcite(max(1, int(se_base * self.se_ratio)), name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(h)
        h = bn(name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNet(nn.Module):
    stages: Sequence[tuple[int, int, int, int, int]] = B0_STAGES
    head_ch: int = 1280
    num_classes: int = 0  # 0 -> pooled 1280-d features
    widese: bool = False  # the reference hub model is nvidia widese_b0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-3)
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False, name="stem_conv")(x)
        h = nn.silu(bn(name="stem_bn")(h))
        for si, (e, k, s, c, r) in enumerate(self.stages):
            for b in range(r):
                h = MBConv(
                    e, k, s if b == 0 else 1, c, widese=self.widese,
                    name=f"stage{si}_block{b}",
                )(h, train=train)
        h = nn.Conv(self.head_ch, (1, 1), use_bias=False, name="head_conv")(h)
        h = nn.silu(bn(name="head_bn")(h))
        h = jnp.mean(h, axis=(1, 2))
        if self.num_classes:
            return nn.Dense(self.num_classes, name="classifier")(h)
        return h


def efficientnet_b0(**kw) -> EfficientNet:
    return EfficientNet(**kw)
