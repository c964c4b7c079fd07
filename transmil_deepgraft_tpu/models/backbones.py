"""Backbone factory + fused tile->embed->MIL-head pipeline.

Mirrors the reference's backbone selection (``code/models/model_interface.py:
223-281``, ``MyBackbone/backbone_factory.py``): 'features' (precomputed, no
backbone), 'retccl' (RetCCL ResNet50 -> 2048-d), 'resnet50' (CLAM baseline ->
1024-d), 'resnet18' (+ Linear to out_features), 'simple' (Ilse CNN), 'vit'/'dino'
(ViT, ``models/vit.py``).

:class:`ImageMILModel` is the TPU answer to the reference's
``ModelInterface.forward`` reshape path (``model_interface.py:297-317``): a slide
streams tiles through the frozen backbone in fixed-size chunks via ``lax.map``
(bounding activation memory) directly into the bag head - one jitted program, no
host round-trips.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.resnet import (
    resnet18,
    resnet50_baseline,
    retccl_resnet50,
)

BACKBONE_DIMS = {
    "retccl": 2048,
    "resnet50": 1024,
    "resnet18": 512,
    "simple": 1024,
    "vit": 768,
    "dino": 768,
    "efficientnet": 1280,
    "inception": 2048,
}


class SimpleCNN(nn.Module):
    """The 'simple' backbone (ref ``model_interface.py:268-281``): two conv/pool
    stages then a linear to 1024-d. Expects 224x224 tiles."""

    out_features: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Conv(20, (5, 5), padding="VALID", name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(50, (5, 5), padding="VALID", name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.out_features, name="fc")(x)
        return nn.relu(x)


class ProjectedBackbone(nn.Module):
    """Backbone + linear projection head (ref resnet18 path: frozen conv stack,
    trainable Linear(512, out_features))."""

    backbone: nn.Module
    out_features: int
    activation: str = "none"  # 'gelu' for the efficientnet path

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        feats = self.backbone(x, train=train)
        out = nn.Dense(self.out_features, name="proj")(feats)
        if self.activation == "gelu":
            out = nn.gelu(out, approximate=False)
        return out


def create_backbone(name: str, out_features: int = 512) -> tuple[Optional[nn.Module], int]:
    """Returns (module, feature_dim). 'features' -> (None, 0): bags are
    precomputed embeddings."""
    if name == "features":
        return None, 0
    if name == "retccl":
        return retccl_resnet50(), 2048
    if name == "resnet50":
        return resnet50_baseline(), 1024
    if name == "resnet18":
        return ProjectedBackbone(resnet18(), out_features), out_features
    if name == "simple":
        return SimpleCNN(), 1024
    if name in ("vit", "dino"):
        from transmil_deepgraft_tpu.models.vit import vit_base

        return vit_base(), 768
    if name == "inception":
        # classic zoo's inception_v3 (ref model_interface_classic.py:198-204;
        # tiles resized to 299 by the classic loader)
        from transmil_deepgraft_tpu.models.inception import inception_v3

        return inception_v3(), 2048
    if name == "efficientnet":
        # ref: hub efficientnet + Linear(1280, out) + GELU (model_interface.py:260-267)
        from transmil_deepgraft_tpu.models.efficientnet import efficientnet_b0

        return ProjectedBackbone(efficientnet_b0(), out_features, activation="gelu"), out_features
    raise KeyError(f"unknown backbone '{name}'")


class ImageMILModel(nn.Module):
    """End-to-end image-bag MIL: tiles -> frozen backbone (chunked) -> bag head.

    Input (B, bag, H, W, 3) NHWC; chunking splits the bag into ``n_chunks``
    sequential backbone batches inside the jitted graph (the reference does the
    x10 chunking host-side at inference, ``visualize_mil.py:560-583``).
    """

    backbone: nn.Module
    head: nn.Module
    n_chunks: int = 10
    stop_backbone_gradient: bool = True
    pyramid: bool = False  # MONAI att_trans_pyramid: stream per-stage features too

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        b, bag, h, w, c = x.shape
        tiles = x.reshape(b * bag, h, w, c)

        n_total = tiles.shape[0]
        chunks = max(1, min(self.n_chunks, n_total))
        pad = (-n_total) % chunks
        if pad:
            tiles = jnp.concatenate([tiles, jnp.zeros((pad, h, w, c), tiles.dtype)], axis=0)
        per = tiles.shape[0] // chunks
        tiles_chunked = tiles.reshape(chunks, per, h, w, c)

        # nn.scan streams chunks through the backbone sequentially with shared
        # params/batch_stats: activation memory is one chunk, not the whole bag.
        kwargs = {"return_pyramid": True} if self.pyramid else {}
        scan_backbone = nn.scan(
            lambda mdl, carry, chunk: (carry, mdl(chunk, train=False, **kwargs)),
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "dropout": False},
            in_axes=0,
            out_axes=0,
        )
        _, out = scan_backbone(self.backbone, None, tiles_chunked)

        def unchunk(t):
            t = t.reshape(chunks * per, -1)[:n_total]
            if self.stop_backbone_gradient:
                t = jax.lax.stop_gradient(t)
            return t.reshape(b, bag, -1)

        if self.pyramid:
            feats, pyr = out
            return self.head(
                unchunk(feats), pyramid=tuple(unchunk(p) for p in pyr),
                deterministic=deterministic, return_attn=return_attn,
            )
        return self.head(unchunk(out), deterministic=deterministic, return_attn=return_attn)
