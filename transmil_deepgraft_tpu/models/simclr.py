"""SimCLR self-supervised pretraining (InfoNCE/NT-Xent).

Equivalent of the reference's Lightning SimCLR module
(``code/models/SimCLR.py:1-61``): backbone + 2-layer projection head, NT-Xent
contrastive loss over two augmented views. Functional: ``nt_xent`` is a pure
loss over projection batches; ``SimCLRModel`` wraps any backbone.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def nt_xent(z1: jax.Array, z2: jax.Array, temperature: float = 0.5) -> jax.Array:
    """NT-Xent over a batch of paired views; z*: (B, D)."""
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    sim = (z @ z.T) / temperature  # (2B, 2B)
    mask = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(logp[jnp.arange(2 * b), targets])


class SimCLRModel(nn.Module):
    backbone: nn.Module
    proj_dim: int = 128
    hidden_dim: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h = self.backbone(x, train=train)
        z = nn.Dense(self.hidden_dim, name="proj_fc1")(h)
        z = nn.relu(z)
        z = nn.Dense(self.proj_dim, name="proj_fc2")(z)
        return z

    @staticmethod
    def loss(model, variables, view1: jax.Array, view2: jax.Array, temperature: float = 0.5, **apply_kw) -> jax.Array:
        z1 = model.apply(variables, view1, **apply_kw)
        z2 = model.apply(variables, view2, **apply_kw)
        return nt_xent(z1, z2, temperature)
