"""DINO-style Vision Transformer backbone in flax.

Re-implements the reference's vendored DINO ViT (``code/models/
vision_transformer.py:26-330``): 16x16 conv patch embed, cls token, learned
position embeddings (bicubic-interpolated for off-grid input sizes), pre-norm
encoder blocks, cls-token feature output. Used as the 'dino'/'vit' backbone
(``MyBackbone/backbone_factory.py:13-22`` loads facebook/dino-vitb16; weights
convert via utils/torch_weights-style mapping).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attention: bool = False):
        y = nn.LayerNorm(name="norm1")(x)
        b, n, _ = y.shape
        dh = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(y).reshape(b, n, 3, self.heads, dh)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * dh**-0.5,
            axis=-1,
        )
        if return_attention:
            return attn
        out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32)).astype(x.dtype)
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        x = x + out
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU (erf) like DINO
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0  # 0 -> cls-token features
    img_size: int = 224  # pos-embed grid; off-grid inputs interpolate

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, deterministic: bool = True):
        """x: (B, H, W, 3) NHWC -> (B, dim) cls features (or logits)."""
        b, h, w, _ = x.shape
        p = self.patch_size
        feat = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)
        gh, gw = feat.shape[1], feat.shape[2]
        feat = feat.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.dim))
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, (self.img_size // p) ** 2 + 1, self.dim),
        )
        pos_patches = _interpolate_pos_embed(pos[:, 1:], gh, gw, self.dim)
        feat = feat + pos_patches
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.dim))
        feat = jnp.concatenate([cls_tok, feat], axis=1)

        for i in range(self.depth):
            feat = ViTBlock(self.dim, self.heads, self.mlp_ratio, name=f"block{i}")(
                feat, deterministic=deterministic
            )
        feat = nn.LayerNorm(name="norm")(feat)
        cls_out = feat[:, 0]
        if self.num_classes:
            return nn.Dense(self.num_classes, name="head")(cls_out)
        return cls_out

    def get_last_selfattention(self, variables, x: jax.Array) -> jax.Array:
        """Attention map of the final block (ref ``vision_transformer.py`` DINO
        visualization getter)."""

        def run(mdl, x):
            b, h, w, _ = x.shape
            p = mdl.patch_size
            feat = nn.Conv(mdl.dim, (p, p), strides=(p, p), name="patch_embed")(x)
            gh, gw = feat.shape[1], feat.shape[2]
            feat = feat.reshape(b, gh * gw, mdl.dim)
            cls = mdl.get_variable("params", "cls_token")
            pos = mdl.get_variable("params", "pos_embed")
            feat = feat + _interpolate_pos_embed(pos[:, 1:], gh, gw, mdl.dim)
            feat = jnp.concatenate([jnp.broadcast_to(cls + pos[:, :1], (b, 1, mdl.dim)), feat], axis=1)
            for i in range(mdl.depth - 1):
                feat = ViTBlock(mdl.dim, mdl.heads, mdl.mlp_ratio, name=f"block{i}")(feat)
            return ViTBlock(mdl.dim, mdl.heads, mdl.mlp_ratio, name=f"block{mdl.depth - 1}")(
                feat, return_attention=True
            )

        return nn.apply(run, self)(variables, x)


def _interpolate_pos_embed(pos_patches: jax.Array, gh: int, gw: int, dim: int) -> jax.Array:
    n = pos_patches.shape[1]
    side = int(round(n**0.5))
    if side * side == gh * gw and side == gh:
        return pos_patches
    grid = pos_patches.reshape(1, side, side, dim)
    grid = jax.image.resize(grid, (1, gh, gw, dim), method="bicubic")
    return grid.reshape(1, gh * gw, dim)


def vit_tiny(**kw) -> VisionTransformer:
    return VisionTransformer(**{"dim": 192, "depth": 12, "heads": 3, **kw})


def vit_small(**kw) -> VisionTransformer:
    return VisionTransformer(**{"dim": 384, "depth": 12, "heads": 6, **kw})


def vit_base(**kw) -> VisionTransformer:
    return VisionTransformer(**{"dim": 768, "depth": 12, "heads": 12, **kw})
