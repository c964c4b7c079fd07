"""CLAM: attention MIL with instance-level clustering loss (single/multi branch).

Ref ``code/models/model_clam.py:22-280``: gated attention net over 512-d projected
features, bag classifier over the attention-pooled feature, and per-class instance
classifiers trained on the top-k / bottom-k attended instances (SVM-style targets).

TPU notes: the reference's ``torch.topk`` + ``index_select`` instance mining maps to
``jax.lax.top_k`` + ``jnp.take_along_axis`` with static k, so the whole
instance-eval path stays inside one jitted graph. Instance losses for all classes
are computed with a one-hot select instead of Python branching on the label.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

SIZE_DICT = {"small": (1024, 512, 256), "big": (1024, 512, 384)}


def _instance_ce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


class AttnNetGated(nn.Module):
    """Gated attention scorer (ref ``model_clam.py:42-66``)."""

    l_dim: int = 512
    d_dim: int = 256
    n_heads: int = 1
    dropout: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        a = jnp.tanh(nn.Dense(self.d_dim, name="attention_a")(x))
        b = jax.nn.sigmoid(nn.Dense(self.d_dim, name="attention_b")(x))
        if self.dropout:
            a = nn.Dropout(rate=0.25)(a, deterministic=deterministic)
            b = nn.Dropout(rate=0.25)(b, deterministic=deterministic)
        return nn.Dense(self.n_heads, name="attention_c")(a * b)  # (N, heads)


class CLAM_SB(nn.Module):
    """Single-branch CLAM (ref ``model_clam.py:71-193``). Operates on a single bag
    (N, in_features); batching is vmapped by the caller."""

    n_classes: int = 2
    in_features: int = 1024
    size_arg: str = "small"
    gate: bool = True
    k_sample: int = 8
    dropout: bool = False
    subtyping: bool = False
    multi_branch: bool = False  # CLAM_MB: one attention head + classifier per class

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        *,
        label: jax.Array | None = None,
        instance_eval: bool = False,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Any:
        if h.ndim == 3:
            h = h[0]
        size = (self.in_features, *SIZE_DICT[self.size_arg][1:])
        h = nn.relu(nn.Dense(size[1], name="fc")(h))
        if self.dropout:
            h = nn.Dropout(rate=0.25)(h, deterministic=deterministic)

        n_heads = self.n_classes if self.multi_branch else 1
        a = AttnNetGated(
            l_dim=size[1], d_dim=size[2], n_heads=n_heads,
            dropout=self.dropout, name="attention_net",
        )(h, deterministic=deterministic)  # (N, heads)
        a = a.T  # (heads, N)
        attn = jax.nn.softmax(a, axis=-1)
        m = attn @ h  # (heads, 512)

        if self.multi_branch:
            logits = jnp.stack(
                [nn.Dense(1, name=f"classifier_{c}")(m[c])[0] for c in range(self.n_classes)]
            )[None]
        else:
            logits = nn.Dense(self.n_classes, name="classifiers")(m[0])[None]

        inst_loss = jnp.float32(0.0)
        if instance_eval:
            k = min(self.k_sample, h.shape[0])
            inst_logits = [
                nn.Dense(2, name=f"instance_classifier_{c}") for c in range(self.n_classes)
            ]
            one_hot = jax.nn.one_hot(label, self.n_classes) if label is not None else jnp.zeros(self.n_classes)
            losses = []
            for c in range(self.n_classes):
                scores = a[c if self.multi_branch else 0]
                top_ids = jax.lax.top_k(scores, k)[1]
                bot_ids = jax.lax.top_k(-scores, k)[1]
                top_h = h[top_ids]
                bot_h = h[bot_ids]
                # in-class: top->1 / bottom->0; out-of-class: top->0 only.
                in_logits = inst_logits[c](jnp.concatenate([top_h, bot_h], axis=0))
                in_targets = jnp.concatenate(
                    [jnp.ones(k, jnp.int32), jnp.zeros(k, jnp.int32)]
                )
                loss_in = _instance_ce(in_logits, in_targets)
                out_logits = inst_logits[c](top_h)
                loss_out = _instance_ce(out_logits, jnp.zeros(k, jnp.int32))
                is_in = one_hot[c]
                if self.subtyping:
                    losses.append(is_in * loss_in + (1.0 - is_in) * loss_out)
                else:
                    losses.append(is_in * loss_in)
            inst_loss = jnp.sum(jnp.stack(losses))
            if self.subtyping:
                inst_loss = inst_loss / self.n_classes

        if return_attn:
            return logits, attn
        if instance_eval:
            return logits, inst_loss
        return logits


class CLAM_MB(CLAM_SB):
    """Multi-branch CLAM (ref ``model_clam.py:195-280``): per-class attention heads
    and per-class 1-logit classifiers."""

    multi_branch: bool = True
