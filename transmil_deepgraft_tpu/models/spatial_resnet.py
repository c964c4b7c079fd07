"""Spatial-ResNet MIL head: ResNet50 classifier over feature volumes.

Equivalent of the reference's ``model.name == 'resnet50'`` branch
(``model_interface.py:131-139``): a torchvision ResNet50 whose conv1 is widened
to take ``in_features`` channels, applied to the (50, 50, in_features) spatial
feature volumes from ``LocalFeatureBagDataset`` (pairs with CTMIL).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet


class SpatialResNetMIL(nn.Module):
    n_classes: int
    in_features: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        """x: (B, H, W, in_features) spatial feature volume."""
        if x.ndim == 3:
            x = x[None]
        feats = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0, name="resnet")(
            x.astype(jnp.float32), train=not deterministic
        )
        logits = nn.Dense(self.n_classes, name="fc")(feats)
        if return_attn:
            return logits, None
        return logits
