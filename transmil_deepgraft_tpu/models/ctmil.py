"""CTMIL: conv-tokenized TransMIL for spatial 3-D feature grids.

Ref ``code/models/CTMIL.py:74-165``: input is a spatial feature volume
(B, 50, 50, 2048) from ``LocalFeatureBagLoader``; two conv+BN+GELU+maxpool
stages (2048 -> 1024 -> 512, spatial /4) tokenize the grid, then the TransMIL
pipeline (cls token -> TransLayer -> PPEG -> TransLayer -> LN -> fc). NHWC here.

Deliberate deviation (PARITY.md): the reference tokenizes with
``h.view(B, H*W, C)`` on an NCHW tensor (``CTMIL.py:144``) — a memory
REINTERPRETATION that scrambles channels across token positions (and its
forward hardcodes ``.cuda()``, so it cannot run on CPU at all). Here the
tokenization is the intended (H*W, C) layout; reference CTMIL checkpoints are
therefore not convertible (their weights encode the scrambled basis).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import PPEG, TransLayer
from transmil_deepgraft_tpu.ops.padding import duplicate_pad_square


class CTMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    out_features: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        """x: (B, H, W, C) spatial feature volume (reference layout (B,C,50,50),
        transposed host-side)."""
        if x.ndim == 3:
            x = x[None]
        h = x.astype(jnp.float32)
        bn = lambda name: nn.BatchNorm(use_running_average=deterministic, name=name)

        h = nn.Conv(self.in_features // 2, (3, 3), padding="SAME", use_bias=False, name="conv1")(h)
        h = nn.gelu(bn("bn1")(h), approximate=False)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        h = nn.Conv(self.out_features, (3, 3), padding="SAME", use_bias=False, name="conv2")(h)
        h = nn.gelu(bn("bn2")(h), approximate=False)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        b = h.shape[0]
        tokens = h.reshape(b, -1, self.out_features)
        tokens, grid_h, grid_w = duplicate_pad_square(tokens)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.out_features)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.out_features)), tokens], axis=1
        )

        tokens, _, _ = TransLayer(dim=self.out_features, name="layer1")(
            tokens, deterministic=deterministic
        )
        tokens = PPEG(dim=self.out_features, name="pos_layer")(tokens, grid_h, grid_w)
        seq_len = grid_h * grid_w + 1
        m = self.out_features // 2
        pad = (m - seq_len % m) % m
        tokens, attn_row, _ = TransLayer(dim=self.out_features, name="layer2")(
            tokens, deterministic=deterministic, return_row_index=pad if return_attn else None
        )

        out = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)[:, 0]
        logits = nn.Dense(self.n_classes, name="fc")(out)
        if return_attn:
            return logits, attn_row
        return logits
