"""InceptionV3 in flax (the classic zoo's 'inception' tile classifier).

The reference loads torchvision ``inception_v3`` via torch.hub for its classic
per-tile pipeline (ref ``code/models/model_interface_classic.py:198-204``,
tiles resized to 299, ``classic_jpg_dataloader.py``). This is a from-scratch
NHWC flax implementation of the same architecture (Szegedy et al. 2015,
"Rethinking the Inception Architecture"); module/branch names mirror
torchvision's state-dict layout (``Mixed_5b.branch1x1.conv.weight`` ...) so
``utils/torch_weights.convert_inception_state_dict`` is a pure name/transpose
mapping. BatchNorm uses torchvision's eps=1e-3.

Feature mode (``num_classes=0``) returns the 2048-d pooled features; the
classic pipeline adds its own linear head. The training-time auxiliary
classifier (AuxLogits) is omitted: the reference runs the hub model in eval
mode where aux logits are unused.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    """conv(bias-free) + BN(eps=1e-3) + relu, NHWC."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=pad,
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _avgpool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool with count-includes-pad=False torch semantics?
    torchvision uses F.avg_pool2d(kernel=3, stride=1, padding=1) which COUNTS
    the zero padding (count_include_pad=True default) - replicate exactly."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / 9.0


def _maxpool3s2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, *, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x, train=train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x, train=train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5, train=train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3, train=train)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avgpool3(x), train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train=train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd, train=train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd, train=train)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, *, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x, train=train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x, train=train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7, train=train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd, train=train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd, train=train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd, train=train)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x), train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x, train=train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3, train=train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x, train=train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7, train=train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7, train=train)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x, train=train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x, train=train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3, train=train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3, train=train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd, train=train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd, train=train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd, train=train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x), train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Expects (B, 299, 299, 3); ``num_classes=0`` -> (B, 2048) features."""

    num_classes: int = 0
    transform_input: bool = False  # torchvision's legacy input renormalization

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.transform_input:
            # ref torchvision _transform_input: re-map ImageNet-normalized
            # channels to the TF-slim normalization the weights expect
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train=train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x, train=train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x, train=train)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x, train=train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x, train=train)
        x = _maxpool3s2(x)

        x = InceptionA(32, name="Mixed_5b")(x, train=train)
        x = InceptionA(64, name="Mixed_5c")(x, train=train)
        x = InceptionA(64, name="Mixed_5d")(x, train=train)
        x = InceptionB(name="Mixed_6a")(x, train=train)
        for i, c7 in zip("bcde", (128, 160, 160, 192)):
            x = InceptionC(c7, name=f"Mixed_6{i}")(x, train=train)
        x = InceptionD(name="Mixed_7a")(x, train=train)
        x = InceptionE(name="Mixed_7b")(x, train=train)
        x = InceptionE(name="Mixed_7c")(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


def inception_v3(num_classes: int = 0, **kwargs: Any) -> InceptionV3:
    return InceptionV3(num_classes=num_classes, **kwargs)
