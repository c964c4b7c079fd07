"""TransformerMIL: vanilla pre-norm ViT-style encoder over bags.

Ref ``code/models/TransformerMIL.py:74-152``: fc1 per in_features -> cls token ->
embedding dropout(0.5) -> 2x Transformer(depth=2, heads=8, dim_head=64,
mlp_dim=512, dropout=0.5) -> cls (or mean) pool -> LayerNorm -> linear head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import TransformerBlock


class TransformerMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    out_features: int = 512
    pool: str = "cls"  # 'cls' or 'mean'
    dropout: float = 0.5
    emb_dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)

        # fc1 variants (ref TransformerMIL.py:106-119).
        if self.in_features == 2048:
            h = nn.Dense(self.in_features // 2, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(self.out_features, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
        elif self.in_features == 1024:
            h = nn.Dense(self.out_features, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
        else:
            h = nn.Dense(self.out_features, name="fc1_0")(h)
            h = nn.relu(h)

        b = h.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.out_features)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.out_features)), h], axis=1)
        h = nn.Dropout(rate=self.emb_dropout)(h, deterministic=deterministic)

        h = TransformerBlock(
            dim=self.out_features, depth=2, heads=8, dim_head=64, mlp_dim=512,
            dropout=self.dropout, name="transformer1",
        )(h, deterministic=deterministic)
        h = TransformerBlock(
            dim=self.out_features, depth=2, heads=8, dim_head=64, mlp_dim=512,
            dropout=self.dropout, name="transformer2",
        )(h, deterministic=deterministic)

        h = jnp.mean(h, axis=1) if self.pool == "mean" else h[:, 0]
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        logits = nn.Dense(self.n_classes, name="fc2")(h)
        if return_attn:
            return logits, None
        return logits
