"""AttMIL: Ilse-style gated attention pooling MIL head.

Ref ``code/models/AttMIL.py:20-110``: fc1 input MLP (2048->1024->512 or
1024->512), gated attention ``A = w^T(tanh(V H) * sigmoid(U H))`` softmaxed over
instances (L=512, D=128, K=1), bag feature ``M = A H``, linear classifier.
The attention math is the shared :func:`gated_attention_pool` op.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.ops.pooling import gated_attention_pool


class AttMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    out_features: int = 512
    attn_dim: int = 128  # D
    attn_heads: int = 1  # K

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
        h = x.astype(jnp.float32)

        # fc1 variants (ref AttMIL.py:56-65).
        if self.in_features == 2048:
            h = nn.Dense(self.in_features // 2, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)
            h = nn.Dense(self.out_features, name="fc1_1")(h)
            h = nn.gelu(h, approximate=False)
        else:
            h = nn.Dense(self.out_features, name="fc1_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=0.6)(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name="fc1_norm0")(h)

        v_w = self.param("attention_V", nn.initializers.lecun_normal(), (self.out_features, self.attn_dim))
        v_b = self.param("attention_V_bias", nn.initializers.zeros, (self.attn_dim,))
        u_w = self.param("attention_U", nn.initializers.lecun_normal(), (self.out_features, self.attn_dim))
        u_b = self.param("attention_U_bias", nn.initializers.zeros, (self.attn_dim,))
        w_w = self.param("attention_weights", nn.initializers.lecun_normal(), (self.attn_dim, self.attn_heads))
        w_b = self.param("attention_weights_bias", nn.initializers.zeros, (self.attn_heads,))

        pooled, attn = gated_attention_pool(h, v_w, u_w, w_w, v_b=v_b, u_b=u_b, w_b=w_b)
        pooled = pooled.reshape(pooled.shape[0], -1)  # (B, K*L)
        logits = nn.Dense(self.n_classes, name="classifier")(pooled)
        if return_attn:
            return logits, attn
        return logits
