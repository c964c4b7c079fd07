"""ResNet family in flax: RetCCL-ResNet50 and the CLAM-style truncated baseline.

Re-implements the reference's vendored RetCCL ResNet (``code/models/ResNet.py:
119-399``) TPU-first: NHWC layout, XLA convolutions, BatchNorm with running
stats (backbones run frozen in eval mode per ``model_interface.py:236-247``;
training mode is available via ``use_running_average=False`` + mutable
``batch_stats``). Extensions carried over:

- ``NormedLinear`` cosine classifier (``ResNet.py:119-128``)
- optional ``att_branch`` sigmoid spatial attention (``ResNet.py:171-175,236-245``)
- ``two_branch`` / ``mlp`` instance/group heads (``ResNet.py:180-200``)
- feature mode (``fc = Identity`` -> 2048-d pooled features)

``ResNet50Baseline`` is the CLAM truncation after layer3 -> 1024-d features
(``code/utils/custom_resnet50.py:17-122``).

Weights from torch checkpoints (``retccl_best_ckpt.pth`` / torchvision) convert
via ``transmil_deepgraft_tpu.utils.torch_weights``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class NormedLinear(nn.Module):
    """Cosine classifier: normalize(x) @ normalize(W, axis=0) (ref ``ResNet.py:119-128``)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight", nn.initializers.uniform(scale=2.0), (x.shape[-1], self.features)
        )
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        wn = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
        return xn @ wn


def _conv(features: int, kernel: int, strides: int = 1, name: str | None = None) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        identity = x
        out = _conv(self.planes, 3, self.strides, name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2")(out)
        out = bn(name="bn2")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.strides, name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        identity = x
        out = _conv(self.planes, 1, 1, name="conv1")(x)
        out = nn.relu(bn(name="bn1")(out))
        out = _conv(self.planes, 3, self.strides, name="conv2")(out)
        out = nn.relu(bn(name="bn2")(out))
        out = _conv(self.planes * self.expansion, 1, 1, name="conv3")(out)
        out = bn(name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.strides, name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionBranch(nn.Module):
    """Sigmoid spatial attention head appended to layer4 (ref ``ResNet.py:236-245``):
    ``attention_layers`` bottlenecks at stride 1 then 1x1 convs -> sigmoid map."""

    block: type
    planes: int = 512
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        out = x
        for i in range(self.n_blocks):
            out = self.block(self.planes, 1, downsample=False, name=f"block{i}")(out, train=train)
        out = _conv(128, 1, 1, name="att_conv1")(out)
        out = nn.relu(bn(name="att_bn1")(out))
        out = _conv(1, 1, 1, name="att_conv2")(out)
        out = bn(name="att_bn2")(out)
        return jax.nn.sigmoid(out)


class ResNet(nn.Module):
    """NHWC ResNet. ``num_classes=0`` -> feature mode (fc = Identity)."""

    block: type
    layers: Sequence[int]
    num_classes: int = 0
    normlinear: bool = False
    two_branch: bool = False
    mlp: bool = False
    attention: bool = False
    attention_layers: int = 3
    truncate_after: int = 4  # 3 -> CLAM baseline (1024-d)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        return_pyramid: bool = False,
        return_spatial: bool = False,
    ) -> jax.Array:
        """x: (B, H, W, 3) NHWC. Returns logits or pooled features.

        ``return_pyramid=True`` additionally returns the tuple of per-stage
        globally-pooled features (the flax answer to the reference's forward
        hooks on layer1-4 for the MONAI ``att_trans_pyramid`` mode,
        ``MonaiMILModel.py:72-110``). ``return_spatial=True`` returns the
        pre-pool (B, h, w, C) feature map of the last stage - the GradCAM
        target layer (the reference hooks ``model[0].layer4[-1]``,
        ``visualize_mil.py:229-231``)."""
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv1")(x)
        out = nn.relu(bn(name="bn1")(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        expansion = self.block.expansion if hasattr(self.block, "expansion") else 4
        in_planes = 64
        pyramid = []
        for stage in range(self.truncate_after):
            p, s = planes[stage], strides[stage]
            for b in range(self.layers[stage]):
                stride = s if b == 0 else 1
                downsample = b == 0 and (stride != 1 or in_planes != p * expansion)
                out = self.block(p, stride, downsample, name=f"layer{stage + 1}_{b}")(out, train=train)
                in_planes = p * expansion
            if return_pyramid:
                pyramid.append(jnp.mean(out, axis=(1, 2)))

        if self.attention and self.truncate_after == 4:
            att = AttentionBranch(self.block, name="att_branch")(out, train=train)
            out = out + att * out

        if return_spatial:
            return out  # (B, h, w, C) pre-pool feature map

        out = jnp.mean(out, axis=(1, 2))  # global average pool

        if return_pyramid:
            return out, tuple(pyramid)
        if self.num_classes == 0:
            return out
        linear = NormedLinear if self.normlinear else partial(nn.Dense)
        if self.mlp:
            out = nn.Dense(2048, name="fc_mlp0")(out)
            out = nn.relu(out)
            x1 = linear(self.num_classes, name="instDis")(out)
            if self.two_branch:
                x2 = linear(self.num_classes, name="groupDis")(out)
                return x1, x2
            return x1
        x1 = (NormedLinear(self.num_classes, name="fc") if self.normlinear else nn.Dense(self.num_classes, name="fc"))(out)
        if self.two_branch:
            x2 = linear(self.num_classes, name="groupDis")(out)
            return x1, x2
        return x1


def resnet18(num_classes: int = 0, **kwargs: Any) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes=num_classes, **kwargs)


def resnet34(num_classes: int = 0, **kwargs: Any) -> ResNet:
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes=num_classes, **kwargs)


def resnet50(num_classes: int = 0, **kwargs: Any) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes=num_classes, **kwargs)


def retccl_resnet50(**kwargs: Any) -> ResNet:
    """RetCCL feature extractor: resnet50 in feature mode (fc=Identity -> 2048-d);
    trained ckpt converts from ``retccl_best_ckpt.pth`` (ref
    ``model_interface.py:238-247``)."""
    return resnet50(num_classes=0, **kwargs)


def resnet50_baseline(**kwargs: Any) -> ResNet:
    """CLAM baseline: ResNet50 truncated after layer3, avg-pooled -> 1024-d
    (ref ``utils/custom_resnet50.py:17-122``)."""
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0, truncate_after=3, **kwargs)
