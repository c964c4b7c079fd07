"""Classic per-tile classifiers (the reference's ModelInterface_Classic zoo).

Ref ``code/models/model_interface_classic.py:197-305``: plain CNN/ViT
classifiers over single tiles (labels inherited from the slide) - inception/
resnet18/resnet50/vit/efficientnet. Each wraps a backbone with a linear head;
pairs with ``JPGTileDataset`` and ``TrainerConfig(tile_level=True)``.
inception expects 299x299 tiles (the classic loader resizes).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ClassicTileClassifier(nn.Module):
    n_classes: int
    backbone_name: str = "resnet18"
    in_features: int = 3  # unused; tiles are RGB images

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True, return_attn: bool = False):
        """x: (B, H, W, 3) tiles (a (B, N, H, W, 3) bag is flattened)."""
        if x.ndim == 5:
            x = x.reshape(-1, *x.shape[2:])
        from transmil_deepgraft_tpu.models.backbones import create_backbone

        backbone, dim = create_backbone(self.backbone_name, out_features=512)
        feats = backbone(x.astype(jnp.float32), train=not deterministic)
        logits = nn.Dense(self.n_classes, name="fc")(feats)
        if return_attn:
            return logits, None
        return logits


def classic_model(name: str, n_classes: int) -> ClassicTileClassifier:
    """'resnet18' / 'resnet50' / 'vit' / 'efficientnet' / 'simple' tile classifiers."""
    return ClassicTileClassifier(n_classes=n_classes, backbone_name=name)
