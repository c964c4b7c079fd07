"""RoFormerMIL: position-aware transformer MIL via 2-D rotary embeddings.

Beyond-reference model family (the reference zoo has no position-aware
attention head; see PAPERS.md "RoFormer for Position Aware Multiple Instance
Learning in Whole Slide Image Classification", arXiv:2310.01924). Tiles in a
WSI have real spatial structure that permutation-invariant MIL attention
throws away; rotary position embeddings inject it *relatively* — attention
logits depend only on coordinate differences, so the head is translation
invariant over the slide and needs no learned absolute position table (no
maximum-bag-size limit, unlike additive position embeddings).

Design (TPU-first): the trunk is the same fc1 + pre-norm encoder stack as
``TransformerMIL`` (ref ``code/models/TransformerMIL.py:74-152``); attention
applies **axial 2-D rotary** to q/k — the head dimension is split in half,
the first half rotated by the tile's x grid coordinate, the second by y
(each an interleaved-pair RoPE). Rotations are pure elementwise mults fused
by XLA into the qk matmul's prologue — zero extra HBM traffic. The cls token
sits at position (0, 0) (identity rotation) and real tiles are offset by +1.

Coordinates come from the batch when the caller passes ``coords`` (the
``(x, y)`` tile grid positions every loader already yields); without them the
bag is laid out row-major on the same ``ceil(sqrt(N))`` square grid TransMIL
uses for PPEG (``ops/padding.duplicate_pad_square`` semantics), which keeps
the head usable on plain feature bags.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _rotary_cos_sin(pos: jax.Array, dim: int, base: float = 10000.0):
    """cos/sin tables for interleaved-pair RoPE.

    ``pos``: (b, n) float positions; returns two (b, 1, n, dim//2) arrays
    (broadcast over heads).
    """
    inv_freq = base ** (-jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    angles = pos[:, :, None].astype(jnp.float32) * inv_freq  # (b, n, dim//2)
    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]
    return cos, sin


def _rotate(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply interleaved-pair rotation to (b, h, n, d) with (b, 1, n, d//2) tables."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape)


def apply_axial_rotary(x: jax.Array, coords: jax.Array, base: float = 10000.0) -> jax.Array:
    """Axial 2-D RoPE on (b, h, n, d): first d/2 rotated by ``coords[..., 0]``,
    second d/2 by ``coords[..., 1]``. ``coords``: (b, n, 2)."""
    d = x.shape[-1]
    half = d // 2
    cx, sx = _rotary_cos_sin(coords[..., 0], half, base)
    cy, sy = _rotary_cos_sin(coords[..., 1], half, base)
    return jnp.concatenate(
        [_rotate(x[..., :half], cx, sx), _rotate(x[..., half:], cy, sy)], axis=-1
    )


def default_grid_coords(n_tokens: int, batch: int) -> jax.Array:
    """Row-major positions on the ``ceil(sqrt(N))`` square grid (the TransMIL
    PPEG layout) for bags that carry no coordinates. (b, n, 2) int32."""
    side = max(int(math.ceil(math.sqrt(max(n_tokens, 1)))), 1)
    idx = jnp.arange(n_tokens, dtype=jnp.int32)
    xy = jnp.stack([idx % side, idx // side], axis=-1)
    return jnp.broadcast_to(xy[None], (batch, n_tokens, 2))


class RotaryAttention(nn.Module):
    """Multi-head self-attention with axial 2-D rotary q/k.

    ``num_landmarks=0`` (default) runs exact softmax attention (the
    ``SoftmaxAttention`` math from ``layers.py`` + RoPE prologue) — O(n²),
    right for the reference's bag≈1000 operating point. ``num_landmarks>0``
    runs **rotary Nyström** attention (``ops/nystrom``, O(n·m)): rotations
    commute with the landmark segment-means — every kernel term is
    ``q·R(θ_j−θ_i)k`` so relative-position semantics survive the
    approximation exactly — which scales position-aware MIL to full
    40k-tile slides the same way TransMIL does.

    ``return_attn_row=True`` additionally returns ``(row, pad)``: the
    cls-query attention row over all (front-padded) keys and the front-pad
    amount (0 in softmax mode)."""

    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1
    rope_base: float = 10000.0
    num_landmarks: int = 0
    pinv_iterations: int = 6

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        coords: jax.Array,
        *,
        deterministic: bool = True,
        return_attn_row: bool = False,
    ):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head

        if self.num_landmarks:
            from transmil_deepgraft_tpu.ops.nystrom import (
                nystrom_attention,
                pad_to_landmark_multiple,
            )

            # front-pad to a landmark multiple (TransMIL convention); pad rows
            # project to zero q/k/v so their rotary angle is irrelevant
            x_p, pad = pad_to_landmark_multiple(x, self.num_landmarks)
            coords_p = jnp.pad(coords, ((0, 0), (pad, 0), (0, 0)))
            np_ = x_p.shape[1]
            qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x_p)
            qkv = qkv.reshape(b, np_, 3, self.heads, self.dim_head)
            q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
            q = apply_axial_rotary(q, coords_p, self.rope_base)
            k = apply_axial_rotary(k, coords_p, self.rope_base)
            result = nystrom_attention(  # scales q by d**-0.5 internally
                q, k, v,
                num_landmarks=self.num_landmarks,
                pinv_iterations=self.pinv_iterations,
                return_row_index=pad if return_attn_row else None,
            )
            out = jnp.moveaxis(result.out, 1, 2)[:, pad:]  # strip front pad
            out = out.reshape(b, n, inner).astype(x.dtype)
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
            if return_attn_row:
                return out, (result.cls_row, pad)
            return out

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        q = apply_axial_rotary(q, coords, self.rope_base)
        k = apply_axial_rotary(k, coords, self.rope_base)
        scale = self.dim_head ** -0.5
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, inner).astype(x.dtype)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        if return_attn_row:
            return out, (attn[:, :, 0, :], 0)  # cls-query row over all keys
        return out


class RoFormerMIL(nn.Module):
    """TransformerMIL trunk with rotary position-aware attention; ``coords``
    (b, n, 2) are the tile grid positions (optional — square-grid fallback)."""

    # trainer plumbing flags (plain class attrs, not dataclass fields):
    # coord_aware -> the Trainer stages Batch.padded_coords as a second forward
    # argument; attn_query -> the test-stage top-k attention tile export runs
    coord_aware = True
    attn_query = "cls"

    n_classes: int
    in_features: int = 2048
    out_features: int = 512
    depth: int = 4
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    pool: str = "cls"  # 'cls' or 'mean'
    dropout: float = 0.1
    emb_dropout: float = 0.5
    rope_base: float = 10000.0
    # 0 = exact softmax attention, O(n^2) — the bag<=~4k operating point.
    # >0 = rotary Nystrom attention, O(n*m) — position-aware MIL at full
    # 40k-tile slide scale (rotations commute with the landmark means, see
    # RotaryAttention). 256 matches TransMIL's landmark count.
    num_landmarks: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        coords: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        if x.ndim == 2:
            x = x[None]
        b, n, _ = x.shape
        h = x.astype(jnp.float32)

        # fc1 trunk (same variants as TransformerMIL, ref TransformerMIL.py:106-119)
        if self.in_features >= 2048:
            h = nn.Dense(self.in_features // 2, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(self.out_features, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
        else:
            h = nn.Dense(self.out_features, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)

        if coords is None:
            coords = default_grid_coords(n, b)
        elif coords.ndim == 2:
            coords = coords[None]
        coords = jnp.broadcast_to(coords, (b, n, 2)).astype(jnp.float32)
        # Anchor to the bag's bounding box: tile<->tile attention is already
        # relative (RoPE), but the cls token sits at an absolute (0, 0), so
        # without this a whole-slide coordinate shift would change cls-query
        # attention. Normalizing makes the head translation-invariant exactly.
        # NOTE the padding contract (data/coords.py): producers of PADDED
        # coords min-normalize the real rows before zero-padding, so pad rows
        # coincide with the bag min and this subtraction stays a no-op —
        # raw zero-padding would pin the min at (0, 0) and break anchoring.
        coords = coords - jnp.min(coords, axis=1, keepdims=True)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.out_features)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.out_features)), h], axis=1)
        # cls at (0,0) = identity rotation; tiles offset +1 so none collides with it
        coords = jnp.concatenate([jnp.zeros((b, 1, 2), jnp.float32), coords + 1.0], axis=1)
        h = nn.Dropout(rate=self.emb_dropout)(h, deterministic=deterministic)

        attn_row, attn_pad = None, 0
        for i in range(self.depth):
            attn_in = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{i}")(h)
            want_row = return_attn and i == self.depth - 1
            attn_out = RotaryAttention(
                dim=self.out_features, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, rope_base=self.rope_base,
                num_landmarks=self.num_landmarks, name=f"attn_{i}",
            )(attn_in, coords, deterministic=deterministic, return_attn_row=want_row)
            if want_row:
                attn_out, (attn_row, attn_pad) = attn_out
            h = h + attn_out
            ff_in = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(h)
            ff = nn.Sequential(
                [nn.Dense(self.mlp_dim), lambda y: nn.gelu(y, approximate=False),
                 nn.Dense(self.out_features)], name=f"ff_{i}",
            )(ff_in)
            h = h + nn.Dropout(rate=self.dropout)(ff, deterministic=deterministic)

        pooled = jnp.mean(h, axis=1) if self.pool == "mean" else h[:, 0]
        pooled = nn.LayerNorm(epsilon=1e-5, name="norm")(pooled)
        logits = nn.Dense(self.n_classes, name="fc2")(pooled)
        if return_attn:
            from transmil_deepgraft_tpu.models.transmil import TransMILAttention

            # same payload as TransMIL: cls-query row over the (front-padded)
            # [pad..., cls, tiles...] keys; tile_scores() slices
            # row[..., pad+1 : pad+1+n] (the tiles)
            return logits, TransMILAttention(row=attn_row, pad=attn_pad, n_tokens=n)
        return logits
