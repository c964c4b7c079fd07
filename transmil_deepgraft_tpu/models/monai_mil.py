"""MONAI-style MIL head family ('AttTrans' in the reference configs).

Ref ``code/models/MonaiMILModel.py:11-232`` (vendored MONAI milmodel): modes
``mean`` / ``max`` / ``att`` (tanh attention) / ``att_trans`` (TransformerEncoder
over instance features before attention). The reference wires mode
``att_trans`` for model name 'AttTrans' (``model_interface.py:127-128``). Here
the head operates on embedded features; pair with any backbone via
``ImageMILModel`` for the raw-image path. (The ``att_trans_pyramid`` variant
needs multi-level backbone hooks; tracked for the backbone-feature-pyramid
round.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import TransformerBlock


class MonaiMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    mil_mode: str = "att_trans"
    trans_blocks: int = 4
    trans_dropout: float = 0.0
    attn_dim: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)  # (B, N, D)
        attn = None

        if self.mil_mode == "mean":
            logits = nn.Dense(self.n_classes, name="myfc")(h).mean(axis=1)
        elif self.mil_mode == "max":
            logits = nn.Dense(self.n_classes, name="myfc")(h).max(axis=1)
        else:
            if self.mil_mode == "att_trans":
                h = TransformerBlock(
                    dim=self.in_features,
                    depth=self.trans_blocks,
                    heads=8,
                    dim_head=self.in_features // 8,
                    mlp_dim=self.in_features,
                    dropout=self.trans_dropout,
                    name="transformer",
                )(h, deterministic=deterministic)
            elif self.mil_mode != "att":
                raise ValueError(f"unsupported mil_mode '{self.mil_mode}'")
            # tanh attention head (MONAI: Linear(D, D//2) tanh Linear(D//2, 1))
            a = jnp.tanh(nn.Dense(self.attn_dim // 2, name="attention_0")(h))
            a = nn.Dense(1, name="attention_1")(a)  # (B, N, 1)
            a = jax.nn.softmax(a, axis=1)
            attn = jnp.swapaxes(a, 1, 2)  # (B, 1, N)
            pooled = jnp.sum(h * a, axis=1)
            logits = nn.Dense(self.n_classes, name="myfc")(pooled)

        if return_attn:
            return logits, attn
        return logits
