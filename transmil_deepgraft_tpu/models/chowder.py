"""Chowder (Courtiol 2018): instance scorer + top/bottom-R score MLP.

Ref ``code/models/Chowder.py:19-50``: 1x1 Conv1d instance scorer (== per-instance
linear to 1 score), concat of bottom-R min and top-R max scores, MLP
2R -> 200 -> 100 -> n_classes. The min/max selection is the shared
:func:`topk_minmax_scores` op (jax.lax.top_k on the MXU-resident scores).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.ops.pooling import topk_minmax_scores


class Chowder(nn.Module):
    n_classes: int
    in_features: int = 512
    r: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)
        scores = nn.Dense(1, name="f1")(h)[..., 0]  # (B, N)
        feats = topk_minmax_scores(scores, self.r)  # (B, 2R), reference (min, max) order
        h = nn.Dense(200, name="f2_0")(feats)
        h = nn.Dense(100, name="f2_1")(h)
        logits = nn.Dense(self.n_classes, name="f2_2")(h)
        if return_attn:
            return logits, scores
        return logits
