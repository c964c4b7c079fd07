"""DTFD-MIL: two-tier double-feature-distillation MIL.

Ref ``code/models/DTFDMIL.py:14-108`` (blocks) and
``code/models/model_interface_dtfd.py:174-224`` (forward): the bag is split into
at most 8 random pseudo-bags of ``pseudo_bag_size`` (=120) instances; tier 1 runs
DimReduction -> gated attention -> attention-weighted sum -> 1-fc classifier per
pseudo-bag; tier 2 runs a gated attention + classifier over the stacked
pseudo-bag features. Tier-1 and tier-2 parameter groups train under *separate*
optimizers (``model_interface_dtfd.py:594-607``) - exposed here via
:meth:`DTFDMIL.parameter_groups`.

TPU notes: the pseudo-bag loop is a static unroll (pseudo-bag count is derived
from the static bag length), the random split is one ``jax.random.permutation``
with the flax ``shuffle`` rng stream, and each tier-1 pass is a batched matmul
chain over all pseudo-bags at once - no Python-per-bag device launches.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.ops.pooling import gated_attention_pool


class DimReduction(nn.Module):
    """Linear + ReLU (+ optional residual MLP blocks); ref ``DTFDMIL.py:90-108``."""

    m_dim: int = 512
    num_res_layers: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.m_dim, use_bias=False, name="fc1")(x))
        for i in range(self.num_res_layers):
            r = nn.relu(nn.Dense(self.m_dim, use_bias=False, name=f"res_{i}_0")(x))
            r = nn.relu(nn.Dense(self.m_dim, use_bias=False, name=f"res_{i}_1")(r))
            x = x + r
        return x


class GatedAttention(nn.Module):
    """K-head gated attention scorer (ref ``DTFDMIL.py:14-46``)."""

    features: int = 512
    d_dim: int = 128
    k_heads: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, normalize: bool = True) -> jax.Array:
        """x: (..., N, L) -> attention (..., K, N)."""
        v_w = self.param("attention_V", nn.initializers.lecun_normal(), (self.features, self.d_dim))
        v_b = self.param("attention_V_bias", nn.initializers.zeros, (self.d_dim,))
        u_w = self.param("attention_U", nn.initializers.lecun_normal(), (self.features, self.d_dim))
        u_b = self.param("attention_U_bias", nn.initializers.zeros, (self.d_dim,))
        w_w = self.param("attention_weights", nn.initializers.lecun_normal(), (self.d_dim, self.k_heads))
        w_b = self.param("attention_weights_bias", nn.initializers.zeros, (self.k_heads,))
        av = jnp.tanh(x @ v_w + v_b)
        au = jax.nn.sigmoid(x @ u_w + u_b)
        scores = jnp.swapaxes((av * au) @ w_w + w_b, -1, -2)  # (..., K, N)
        return jax.nn.softmax(scores, axis=-1) if normalize else scores


class AttentionWithClassifier(nn.Module):
    """Tier-2 head: gated attention pool + linear classifier (ref ``DTFDMIL.py:47-60``)."""

    n_classes: int
    features: int = 512
    d_dim: int = 128
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        attn = GatedAttention(features=self.features, d_dim=self.d_dim, name="attention")(x)
        pooled = attn @ x  # (K, L)
        if self.droprate:
            pooled = nn.Dropout(rate=self.droprate)(pooled, deterministic=deterministic)
        return nn.Dense(self.n_classes, name="classifier")(pooled)


class DTFDMIL(nn.Module):
    n_classes: int
    in_features: int = 1024
    m_dim: int = 512
    pseudo_bag_size: int = 120
    max_pseudo_bags: int = 8

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        """x: (N, in_features) or (1, N, in_features).

        Returns ``(sub_predictions (G, C), slide_prediction (1, C))``. With
        ``return_attn=True`` additionally returns the tier-1 attention (G, N_pb).
        """
        if x.ndim == 3:
            if x.shape[0] != 1:
                # the reference operates strictly at batch=1
                # (model_interface_dtfd.py:183 squeezes dim 0); silently taking
                # x[0] would drop slides - fail loudly instead.
                raise ValueError(
                    f"DTFDMIL processes one slide at a time (got batch={x.shape[0]}); "
                    "use batch_size=1 or vmap the apply"
                )
            x = x[0]
        x = x.astype(jnp.float32)
        n = x.shape[0]
        g = max(1, min(self.max_pseudo_bags, n // self.pseudo_bag_size))
        pb = min(self.pseudo_bag_size, n)

        feats = DimReduction(m_dim=self.m_dim, name="dimreduction")(x)  # (N, 512)

        if not deterministic:
            perm = jax.random.permutation(self.make_rng("shuffle"), n)
        else:
            perm = jnp.arange(n)
        idx = perm[: g * pb].reshape(g, pb)
        bags = feats[idx]  # (G, pb, 512)

        t1_attn = GatedAttention(features=self.m_dim, name="attention")(bags)  # (G, 1, pb)
        pooled = (t1_attn @ bags)[:, 0]  # (G, 512)
        sub_predictions = nn.Dense(self.n_classes, name="classifier")(pooled)  # (G, C)

        slide_prediction = AttentionWithClassifier(
            n_classes=self.n_classes, features=self.m_dim, name="attCls"
        )(pooled, deterministic=deterministic)  # (1, C)

        if return_attn:
            return sub_predictions, slide_prediction, t1_attn[:, 0]
        return sub_predictions, slide_prediction

    @staticmethod
    def parameter_groups(params) -> tuple[dict, dict]:
        """Split params into (tier1, tier2) groups for the two optimizers
        (ref ``model_interface_dtfd.py:166-172,594-607``)."""
        p = params["params"] if "params" in params else params
        tier1 = {k: v for k, v in p.items() if k != "attCls"}
        tier2 = {k: v for k, v in p.items() if k == "attCls"}
        return tier1, tier2
