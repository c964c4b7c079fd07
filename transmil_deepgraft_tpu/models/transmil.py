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
    # Fused Pallas TransLayers at inference (projections + LN + attention +
    # residuals in two kernels; 2.09x over the XLA layer at n=41k on v5e,
    # BENCHMARKS.md). Applies when deterministic and not returning attention;
    # training and return_attn run the standard path (same params).
    fused_inference: bool = True
    # Op-level Pallas attention (flash landmark kernels + analytic VJP,
    # ops/pallas/nystrom_kernel) on the standard path — affects TRAINING too
    # (the fused layers above are inference-only). None/False = XLA op.
    use_pallas: Optional[bool] = None

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

        # The fused Pallas layer path: standard flax layers own the params
        # (created at init / on the training path); at inference the same params
        # drive the fully-fused kernels (translayer_kernel.fused_translayer).
        use_fused = (
            self.fused_inference
            and deterministic
            and not return_attn
            and not self.is_initializing()
            # Pallas TPU kernels; 'axon' is the relayed-TPU platform name
            and jax.default_backend() in ("tpu", "axon")
        )

        def run_layer(name: str, hh: jax.Array, row_index: Optional[int]):
            if use_fused and row_index is None:
                from transmil_deepgraft_tpu.ops.pallas.translayer_kernel import (
                    fused_translayer,
                )
                from transmil_deepgraft_tpu.ops.nystrom import pad_to_landmark_multiple

                p = self.get_variable("params", name)
                m = self.out_features // 2
                hp, padn = pad_to_landmark_multiple(hh, m)
                y = fused_translayer(
                    hp,
                    p["norm"]["scale"], p["norm"]["bias"],
                    p["attn"]["to_qkv"]["kernel"],
                    p["attn"]["to_out"]["kernel"], p["attn"]["to_out"]["bias"],
                    p["attn"]["res_conv"],
                    heads=8, dim_head=self.out_features // 8, num_landmarks=m,
                )
                return y[:, padn:].astype(hh.dtype), None
            out, attn_row, _ = TransLayer(dim=self.out_features, dtype=self.dtype,
                                          use_pallas=self.use_pallas, name=name)(
                hh, deterministic=deterministic, return_row_index=row_index
            )
            return out, attn_row

        h, _ = run_layer("layer1", h, None)
        h = PPEG(dim=self.out_features, dtype=self.dtype, name="pos_layer")(h, grid_h, grid_w)

        # The landmark front-pad for the (grid_h*grid_w + 1)-token sequence; the
        # reference computes the same quantity before layer2 (TransMIL.py:190-193).
        seq_len = grid_h * grid_w + 1
        m = self.out_features // 2
        pad = (m - seq_len % m) % m

        row_index: Optional[int] = None
        if return_attn:
            row_index = pad + (1 if self.attn_query == "ref" else 0)

        h, attn_row = run_layer("layer2", h, row_index)

        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h.astype(jnp.float32))[:, 0]
        logits = nn.Dense(self.n_classes, name="fc")(h)

        if return_attn:
            return logits, TransMILAttention(row=attn_row, pad=pad, n_tokens=n_tokens)
        return logits
