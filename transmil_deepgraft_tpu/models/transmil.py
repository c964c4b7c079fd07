"""TransMIL: Nystrom-attention transformer MIL head (the flagship model).

Architecture (ref ``code/models/TransMIL.py:78-211``):
  fc1 MLP -> duplicate-pad bag to ceil(sqrt(N))^2 -> prepend cls token ->
  TransLayer1 -> PPEG (depthwise 7/5/3 convs on the H x W token grid) ->
  TransLayer2 -> LayerNorm -> cls-token logits.

``return_attn=True`` additionally returns the layer-2 attention row used for
heatmaps. The reference materializes the full (N_pad x N_pad) attention matrix and
slices ``attn[0, :, padding+1, padding+1 : padding+1+H]``
(``visualize_mil.py:584-592``); here the row is computed directly in O(N*m)
without ever materializing the matrix. ``attn_query='ref'`` reproduces the
reference's ``padding+1`` row index (its cls token actually sits at index
``padding``); ``attn_query='cls'`` uses the true cls row.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.layers import PPEG, TransLayer, make_fc1
from transmil_deepgraft_tpu.ops.padding import duplicate_pad_square


class TransMILAttention(NamedTuple):
    """Attention payload for visualization.

    ``row``: (B, heads, N_pad_lm) layer-2 attention of the query row over all
    padded keys (front zero-pad of size ``pad`` from the landmark padding).
    ``pad``: the front-pad amount (the reference's ``padding`` variable).
    ``n_tokens``: number of real (pre-duplicate-pad) bag tokens H.
    """

    row: jax.Array
    pad: int
    n_tokens: int

    def tile_scores(self) -> jax.Array:
        """(B, heads, n_tokens) attention over the real tiles, reproducing the
        reference slice ``attn[0, :, pad+1, pad+1 : pad+1+H]``."""
        start = self.pad + 1
        return self.row[..., start : start + self.n_tokens]


class TransMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    out_features: int = 512
    attn_query: str = "ref"  # 'ref' (reference-exact row pad+1) or 'cls' (row pad)
    dtype: Any = jnp.float32  # bf16 for mixed precision (cfg.General.precision 16)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(self.dtype)
        h = make_fc1(self.in_features, self.out_features, self.dtype)(h, deterministic)

        n_tokens = h.shape[1]
        h, grid_h, grid_w = duplicate_pad_square(h)  # [B, H*W, D]

        b = h.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.out_features)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.out_features)), h], axis=1)

        h, _, _ = TransLayer(dim=self.out_features, dtype=self.dtype, name="layer1")(
            h, deterministic=deterministic
        )
        h = PPEG(dim=self.out_features, dtype=self.dtype, name="pos_layer")(h, grid_h, grid_w)

        # The landmark front-pad for the (grid_h*grid_w + 1)-token sequence; the
        # reference computes the same quantity before layer2 (TransMIL.py:190-193).
        seq_len = grid_h * grid_w + 1
        m = self.out_features // 2
        pad = (m - seq_len % m) % m

        row_index: Optional[int] = None
        if return_attn:
            row_index = pad + (1 if self.attn_query == "ref" else 0)

        h, attn_row, _ = TransLayer(dim=self.out_features, dtype=self.dtype, name="layer2")(
            h, deterministic=deterministic, return_row_index=row_index
        )

        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h.astype(jnp.float32))[:, 0]
        logits = nn.Dense(self.n_classes, name="fc")(h)

        if return_attn:
            return logits, TransMILAttention(row=attn_row, pad=pad, n_tokens=n_tokens)
        return logits
