"""DSMIL: dual-stream MIL head (Li et al., CVPR 2021, arXiv:2011.08939).

Beyond-reference model family (the reference zoo has no dual-stream head).
Two streams over the instance features:

1. **Instance stream** — a per-instance linear classifier produces instance
   logits ``(B, N, C)``; its per-class max is the classic max-pooling MIL
   prediction, and its per-class argmax selects the *critical instance*.
2. **Bag stream** — every instance emits a query (2-layer tanh MLP) and a
   value (ReLU projection); attention is the softmax over instances of the
   scaled dot product between each instance's query and the critical
   instance's query, one attention column per class. The per-class attention
   pools the values into one bag embedding per class, and a final linear map
   over the flattened ``(C, V)`` block (the official ``Conv1d(C, C, V)``
   written as one dense layer) yields the bag logits.

The head returns ``0.5 * (bag_logits + max_instance_logits)`` — the fusion
the official implementation evaluates with. Everything is a handful of
batched matmuls + one gather, so XLA maps it straight onto the MXU; the
critical-instance gather is static-shape (``argmax`` + ``take_along_axis``)
and jit/export-safe.

``return_attn`` yields the attention column of the *predicted* class
(``(B, N)``), the row heatmap tooling consumes.

Padding: max-pooling is more pad-sensitive than the zoo's attention-only
heads — with zero-padded bucket bags a pad row's instance logit equals the
classifier bias, so the per-class argmax could select a padding row. Pass
``lengths`` ((B,) real bag lengths) to mask instance logits and attention
beyond the real length; without it, evaluate short bags with
``eval_pad='exact'`` (the datamodule's exact-shape eval path).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DSMIL(nn.Module):
    n_classes: int
    in_features: int = 2048
    q_dim: int = 128
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False,
                 lengths: jax.Array | None = None):
        if x.ndim == 2:
            x = x[None]
        h = x.astype(jnp.float32)  # (B, N, D)

        ins_logits = nn.Dense(self.n_classes, name="i_classifier")(h)  # (B, N, C)
        pad_mask = None  # (B, N, 1) True on real rows
        if lengths is not None:
            lengths = jnp.asarray(lengths).reshape(h.shape[0])
            pad_mask = (jnp.arange(h.shape[1])[None, :] < lengths[:, None])[..., None]
            # mask the instance stream: pad rows can win neither max nor argmax
            ins_logits = jnp.where(pad_mask, ins_logits, -1e9)

        q0 = nn.Dense(self.q_dim, name="q0")
        q1 = nn.Dense(self.q_dim, name="q1")

        def query(t: jax.Array) -> jax.Array:
            return jnp.tanh(q1(nn.relu(q0(t))))

        v = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        v = nn.relu(nn.Dense(self.in_features, name="v")(v))  # (B, N, V)

        # critical instance per class: argmax of the instance logits
        crit = jnp.argmax(ins_logits, axis=1)  # (B, C)
        m_feats = jnp.take_along_axis(h, crit[..., None], axis=1)  # (B, C, D)

        q = query(h)  # (B, N, Q)
        q_max = query(m_feats)  # (B, C, Q)
        attn = jnp.einsum("bnq,bcq->bnc", q, q_max) / jnp.sqrt(
            jnp.asarray(self.q_dim, jnp.float32)
        )
        if pad_mask is not None:
            attn = jnp.where(pad_mask, attn, -1e9)  # pad rows get ~0 attention mass
        attn = jax.nn.softmax(attn, axis=1)  # over instances, per class

        bag = jnp.einsum("bnc,bnv->bcv", attn, v)  # (B, C, V)
        bag_logits = nn.Dense(self.n_classes, name="fcc")(
            bag.reshape(bag.shape[0], self.n_classes * self.in_features)
        )
        max_ins = jnp.max(ins_logits, axis=1)  # (B, C)
        logits = 0.5 * (bag_logits + max_ins)

        if return_attn:
            pred = jnp.argmax(logits, axis=-1)  # (B,)
            scores = jnp.take_along_axis(attn, pred[:, None, None], axis=2)[..., 0]
            return logits, scores  # (B, C), (B, N)
        return logits
