"""Model zoo registry.

The reference resolves model classes dynamically by name via importlib
(``code/models/model_interface.py:1256-1293``); here the registry is an explicit
name -> constructor map consumed by the experiment layer and CLI.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn

from transmil_deepgraft_tpu.models.attmil import AttMIL
from transmil_deepgraft_tpu.models.chowder import Chowder
from transmil_deepgraft_tpu.models.clam import CLAM_MB, CLAM_SB
from transmil_deepgraft_tpu.models.ctmil import CTMIL
from transmil_deepgraft_tpu.models.dsmil import DSMIL
from transmil_deepgraft_tpu.models.dtfd import DTFDMIL
from transmil_deepgraft_tpu.models.mdmil import MDMIL
from transmil_deepgraft_tpu.models.monai_mil import MonaiMIL
from transmil_deepgraft_tpu.models.roformer_mil import RoFormerMIL
from transmil_deepgraft_tpu.models.spatial_resnet import SpatialResNetMIL
from transmil_deepgraft_tpu.models.transformer_mil import TransformerMIL
from transmil_deepgraft_tpu.models.transmil import TransMIL, TransMILAttention

MODEL_REGISTRY: dict[str, Callable[..., nn.Module]] = {
    "TransMIL": TransMIL,
    "AttMIL": AttMIL,
    "TransformerMIL": TransformerMIL,
    "Chowder": Chowder,
    "CLAM_SB": CLAM_SB,
    "CLAM_MB": CLAM_MB,
    "DTFD": DTFDMIL,
    "DTFDMIL": DTFDMIL,
    "MDMIL": MDMIL,
    "CTMIL": CTMIL,
    "MonaiMILModel": MonaiMIL,
    "AttTrans": MonaiMIL,
    "RoFormerMIL": RoFormerMIL,  # beyond-reference: 2-D rotary position-aware MIL
    "DSMIL": DSMIL,  # beyond-reference: dual-stream MIL (arXiv:2011.08939)
    "resnet50": SpatialResNetMIL,
}


def create_classic_model(backbone_name: str, n_classes: int):
    """Per-tile classifier for the classic pipeline (ref ModelInterface_Classic)."""
    from transmil_deepgraft_tpu.models.classic import classic_model

    return classic_model(backbone_name, n_classes)


def create_model(
    name: str,
    n_classes: int,
    in_features: int = 2048,
    out_features: int = 512,
    precision: int | str | None = None,
    **kwargs: Any,
) -> nn.Module:
    """Instantiate a bag-level MIL head by config name (``cfg.Model.name``).

    ``precision`` in (16, 'bf16', '16-mixed') selects bfloat16 compute for
    models that support dtype plumbing (the reference's fp16 AMP equivalent,
    ``cfg.General.precision``).
    """
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    common: dict[str, Any] = {"n_classes": n_classes, "in_features": in_features}
    if name in ("TransMIL", "AttMIL", "TransformerMIL", "MDMIL", "CTMIL", "RoFormerMIL"):
        common["out_features"] = out_features
    if precision in (16, "16", "bf16", "16-mixed") and name == "TransMIL":
        import jax.numpy as jnp

        common["dtype"] = jnp.bfloat16
    return cls(**common, **kwargs)


__all__ = [
    "AttMIL",
    "Chowder",
    "CLAM_MB",
    "CLAM_SB",
    "CTMIL",
    "DSMIL",
    "DTFDMIL",
    "MDMIL",
    "MODEL_REGISTRY",
    "MonaiMIL",
    "TransMIL",
    "TransMILAttention",
    "RoFormerMIL",
    "TransformerMIL",
    "create_model",
]
