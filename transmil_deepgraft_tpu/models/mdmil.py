"""MDMIL: TransMIL variant operating on 1024-d features.

Ref ``code/models/MDMIL.py:47-141``: identical pipeline to TransMIL but with a
single Linear(1024->512)+GELU input projection and ``return logits, attn2``
semantics. (The reference's IQGM instance-quality module is an incomplete stub -
``IQGM.forward`` references undefined ``self`` - and is intentionally not
reproduced beyond the MDMIL head itself.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import PPEG, TransLayer
from transmil_deepgraft_tpu.models.transmil import TransMILAttention
from transmil_deepgraft_tpu.ops.padding import duplicate_pad_square


class MDMIL(nn.Module):
    n_classes: int
    in_features: int = 1024
    out_features: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = True):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)
        h = nn.gelu(nn.Dense(self.out_features, name="fc1")(h), approximate=False)

        n_tokens = h.shape[1]
        h, grid_h, grid_w = duplicate_pad_square(h)
        b = h.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.out_features)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.out_features)), h], axis=1)

        h, _, _ = TransLayer(dim=self.out_features, name="layer1")(h, deterministic=deterministic)
        h = PPEG(dim=self.out_features, name="pos_layer")(h, grid_h, grid_w)

        seq_len = grid_h * grid_w + 1
        m = self.out_features // 2
        pad = (m - seq_len % m) % m
        h, attn_row, _ = TransLayer(dim=self.out_features, name="layer2")(
            h, deterministic=deterministic, return_row_index=pad if return_attn else None
        )

        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)[:, 0]
        logits = nn.Dense(self.n_classes, name="fc2")(h)
        if return_attn:
            return logits, TransMILAttention(row=attn_row, pad=pad, n_tokens=n_tokens)
        return logits
