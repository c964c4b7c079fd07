"""Shared flax.linen layers for the MIL model zoo.

- :class:`NystromAttentionLayer` / :class:`TransLayer` - the Nystrom-attention
  transformer block used by TransMIL/MDMIL/CTMIL (ref ``code/models/TransMIL.py:19-57``;
  attention math reimplemented from scratch in ``ops/nystrom.py``).
- :class:`PPEG` - pyramid position encoding generator (ref ``TransMIL.py:60-75``).
- :class:`SoftmaxAttention` / :class:`FeedForward` / :class:`TransformerBlock` -
  vanilla pre-norm MHA encoder primitives (ref ``code/models/_transformer.py:6-99``).
- :func:`make_fc1` - the per-in_features input MLP variants shared by
  TransMIL/AttMIL/TransformerMIL (ref ``TransMIL.py:100-133``, ``AttMIL.py:56-65``).

Parameter names deliberately mirror the reference module names (``to_qkv``,
``to_out``, ``res_conv``, ``norm`` ...) so a torch-state-dict -> flax converter is a
pure name/transpose mapping.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.ops.nystrom import (
    NystromOutput,
    nystrom_attention,
    pad_to_landmark_multiple,
)


class NystromAttentionLayer(nn.Module):
    """Self-attention via Nystrom approximation, matching the reference's external
    ``nystrom_attention`` dependency (dim 512, 8 heads, dim_head 64, 256 landmarks,
    6 pinv iterations, depthwise-conv value residual, out-proj dropout 0.7)."""

    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_kernel_size: int = 33
    dropout: float = 0.7
    # None -> XLA path (currently faster end-to-end: XLA fuses the qkv/out
    # projections around the attention; the standalone Pallas kernels win on the
    # isolated op but break that fusion). Set True to force the fused kernels.
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32  # computation dtype for projections / big matmuls

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        return_row_index: Optional[int] = None,
    ) -> tuple[jax.Array, Optional[jax.Array], int]:
        """x: (B, N, dim). Returns (out (B, N, dim), attn_row, pad).

        ``return_row_index`` indexes the *padded* sequence (front zero-pad to a
        multiple of num_landmarks); ``attn_row`` is (B, heads, N_padded), the
        attention distribution of that query over all padded keys.
        """
        b, n, _ = x.shape
        inner = self.heads * self.dim_head

        x_p, pad = pad_to_landmark_multiple(x, self.num_landmarks)
        np_ = x_p.shape[1]

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x_p)
        qkv = qkv.reshape(b, np_, 3, self.heads, self.dim_head)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = False
        cls_row = None
        if use_pallas:
            from transmil_deepgraft_tpu.ops.pallas.nystrom_kernel import (
                nystrom_attention_fused_packed,
            )

            # packed-layout kernels: no (b, h, n, d) transposes in HBM
            out_bnhd = nystrom_attention_fused_packed(
                qkv, self.num_landmarks, self.pinv_iterations, 1024
            )  # (b, np, h, d) f32
            if return_row_index is not None:
                # visualization row via the O(n*m) row helper - the fused path
                # serves return_attn without falling back to the full XLA op
                from transmil_deepgraft_tpu.ops.nystrom import nystrom_attention_row

                q_pl = jnp.moveaxis(qkv[:, :, 0], 2, 1)
                k_pl = jnp.moveaxis(qkv[:, :, 1], 2, 1)
                cls_row = nystrom_attention_row(
                    q_pl, k_pl,
                    num_landmarks=self.num_landmarks,
                    pinv_iterations=self.pinv_iterations,
                    row_index=return_row_index,
                )
        else:
            q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
            result = nystrom_attention(
                q,
                k,
                v,
                num_landmarks=self.num_landmarks,
                pinv_iterations=self.pinv_iterations,
                return_row_index=return_row_index,
            )
            cls_row = result.cls_row
            out_bnhd = jnp.moveaxis(result.out, 1, 2)  # (b, np, h, d) f32

        out = out_bnhd.reshape(b, np_, inner)

        if self.residual:
            # Per-head depthwise conv over the sequence axis, shared across the
            # head dim's feature columns: torch Conv2d(h, h, (ks, 1), groups=h,
            # bias=False) on (b, h, n, d). Kernel param shape (ks, heads).
            #
            # TPU layout note: running this as an 8-channel conv wastes 94% of
            # the VPU's 128 lanes (~8 ms at n=41k). Instead run ONE 1-D
            # depthwise conv over all heads*dim_head=512 channels, repeating
            # each head's kernel across its 64 feature columns - identical math,
            # full lane occupancy (~25x faster). The value plane of the packed
            # qkv tensor is already (b, n, h, d), so no transposes either.
            ks = self.residual_kernel_size
            res_kernel = self.param(
                "res_conv",
                nn.initializers.lecun_normal(),
                (ks, self.heads),
                jnp.float32,
            )
            v_nwc = qkv[:, :, 2].reshape(b, np_, inner).astype(self.dtype)
            kern = jnp.repeat(res_kernel, self.dim_head, axis=1)[:, None, :]  # (ks, 1, h*d)
            # GSPMD-safe depthwise (XLA grouped-conv weight-grad is wrong when
            # batch is dp-sharded on a multi-axis mesh; ops/depthwise.py)
            from transmil_deepgraft_tpu.ops.depthwise import depthwise_conv1d

            res = depthwise_conv1d(v_nwc, kern.astype(self.dtype))
            out = out + res.astype(out.dtype)

        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out.astype(self.dtype))
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        out = out[:, -n:]  # strip the front pad

        return out, cls_row, pad


class TransLayer(nn.Module):
    """Pre-norm residual Nystrom-attention block (ref ``TransMIL.py:19-57``)."""

    dim: int = 512
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None  # forwarded to NystromAttentionLayer

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        return_row_index: Optional[int] = None,
    ) -> tuple[jax.Array, Optional[jax.Array], int]:
        normed = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        out, attn_row, pad = NystromAttentionLayer(
            dim=self.dim,
            heads=8,
            dim_head=self.dim // 8,
            num_landmarks=self.dim // 2,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="attn",
        )(normed, deterministic=deterministic, return_row_index=return_row_index)
        return x + out.astype(x.dtype), attn_row, pad


class PPEG(nn.Module):
    """Pyramid Position Encoding Generator (ref ``TransMIL.py:60-75``): the cls
    token bypasses; feature tokens are reshaped to an H x W grid and get
    identity + depthwise 7x7 + 5x5 + 3x3 convs summed.

    TPU optimization: because all three convs are depthwise over the *same*
    input, their sum plus the identity is algebraically a single 7x7 depthwise
    conv whose kernel is ``w7 + pad(w5) + pad(w3) + center_delta`` and whose
    bias is ``b7 + b5 + b3`` - one conv pass instead of three convs + three adds
    (4x less HBM traffic on the (B, H, W, 512) grid). Parameters keep the
    reference's three-kernel structure for checkpoint compatibility; the fold is
    done at apply time (constant-folded by XLA under jit).
    """

    dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, n, c = x.shape
        cls_token, feat = x[:, :1], x[:, 1:]
        grid = feat.reshape(b, h, w, c).astype(self.dtype)

        init_k = nn.initializers.lecun_normal()
        w7 = self.param("proj", init_k, (7, 7, 1, self.dim))
        b7 = self.param("proj_bias", nn.initializers.zeros, (self.dim,))
        w5 = self.param("proj1", init_k, (5, 5, 1, self.dim))
        b5 = self.param("proj1_bias", nn.initializers.zeros, (self.dim,))
        w3 = self.param("proj2", init_k, (3, 3, 1, self.dim))
        b3 = self.param("proj2_bias", nn.initializers.zeros, (self.dim,))

        combined = (
            w7
            + jnp.pad(w5, ((1, 1), (1, 1), (0, 0), (0, 0)))
            + jnp.pad(w3, ((2, 2), (2, 2), (0, 0), (0, 0)))
        )
        center = jnp.zeros((7, 7, 1, self.dim)).at[3, 3].set(1.0)
        combined = combined + center
        bias = b7 + b5 + b3

        # GSPMD-safe depthwise (see ops/depthwise.py: XLA's grouped-conv
        # weight-grad miscompiles when batch is dp-sharded on a 2-axis mesh)
        from transmil_deepgraft_tpu.ops.depthwise import depthwise_conv2d

        out = depthwise_conv2d(grid, combined.astype(self.dtype)) + bias.astype(self.dtype)
        out = out.astype(x.dtype).reshape(b, h * w, c)
        return jnp.concatenate([cls_token, out], axis=1)


class SoftmaxAttention(nn.Module):
    """Standard multi-head softmax self-attention (ref ``_transformer.py:16-44``)."""

    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        scale = self.dim_head ** -0.5
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, inner).astype(x.dtype)
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class FeedForward(nn.Module):
    """GELU MLP with dropout (ref ``_transformer.py:46-58``)."""

    dim: int = 512
    hidden_dim: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim)(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x


class TransformerBlock(nn.Module):
    """Pre-norm MHA + FF residual stack of ``depth`` layers (ref
    ``TransformerMIL.py:18-32``)."""

    dim: int = 512
    depth: int = 2
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        for i in range(self.depth):
            attn_in = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{i}")(x)
            x = x + SoftmaxAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"attn_{i}",
            )(attn_in, deterministic=deterministic)
            ff_in = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(x)
            x = x + FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"ff_{i}",
            )(ff_in, deterministic=deterministic)
        return x


class TorchEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` semantics (post-norm, ReLU FFN,
    packed qkv): used by the MONAI MIL heads (ref ``MonaiMILModel.py:121-152``,
    which builds ``nn.TransformerEncoder`` stacks). Param names mirror torch's
    (``in_proj``/``out_proj``/``linear1``/``linear2``/``norm1``/``norm2``) so a
    torch state dict converts by pure transpose mapping."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        b, n, d = x.shape
        dh = d // self.nhead
        qkv = nn.Dense(3 * d, name="in_proj")(x)  # torch packs [q; k; v]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.nhead, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.nhead, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.nhead, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(dh), axis=-1)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d).astype(x.dtype)
        out = nn.Dense(d, name="out_proj")(out)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + out)

        ff = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        ff = nn.Dropout(rate=self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(d, name="linear2")(ff)
        ff = nn.Dropout(rate=self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class TorchTransformerEncoder(nn.Module):
    """Stack of :class:`TorchEncoderLayer` (torch ``nn.TransformerEncoder``)."""

    d_model: int
    num_layers: int = 4
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        for i in range(self.num_layers):
            x = TorchEncoderLayer(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x


def make_fc1(
    in_features: int, out_features: int, dtype: Any = jnp.float32
) -> Callable[[jax.Array, bool], jax.Array]:
    """Input-projection MLP spec per in_features (ref ``TransMIL.py:100-133``).

    Returned callable must be invoked inside an ``nn.compact`` method of a parent
    module (the Dense/LayerNorm submodules attach to the caller's scope).

    Variants (as in the reference, with the 1024-branch's LayerNorm dims corrected
    to match its own tensor shapes - the reference declares ``norm_layer(512)``
    over a 1024-d activation, which cannot execute in torch either):
      2048: Linear(2048,1024) GELU LN(1024) Linear(1024,512) GELU
      1024: Linear(1024,1024) GELU Drop(.2) LN(1024) Linear(1024,512) GELU Drop(.6) LN(512)
      768:  Linear(768,768)  GELU Drop(.6) LN(768)  Linear(768,512)  GELU Drop(.6) LN(512)
      else: Linear(in,512)   GELU
    """

    def apply(x: jax.Array, deterministic: bool = True) -> jax.Array:
        if in_features == 2048:
            h = nn.Dense(in_features // 2, dtype=dtype, name="fc1_0")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(out_features, dtype=dtype, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
        elif in_features == 1024:
            h = nn.Dense(in_features, dtype=dtype, name="fc1_0")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.2)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(out_features, dtype=dtype, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm1")(h)
        elif in_features == 768:
            h = nn.Dense(in_features, dtype=dtype, name="fc1_0")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(out_features, dtype=dtype, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm1")(h)
        else:
            h = nn.Dense(out_features, dtype=dtype, name="fc1_0")(x)
            h = nn.gelu(h, approximate=False)
        return h

    return apply
