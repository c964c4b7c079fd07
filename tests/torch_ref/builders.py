"""Shared constructors for the torch parity fixtures.

Each builder returns ``(torch_model_in_eval_mode, example_bag_numpy)`` plus the
matching flax model + converter, so the live parity test and the frozen-fixture
generator stay in lockstep.
"""

from __future__ import annotations

import numpy as np

from transmil_deepgraft_tpu.models import TransMIL as FlaxTransMIL
from transmil_deepgraft_tpu.models.attmil import AttMIL as FlaxAttMIL
from transmil_deepgraft_tpu.models.clam import CLAM_MB as FlaxCLAM_MB
from transmil_deepgraft_tpu.models.clam import CLAM_SB as FlaxCLAM_SB
from transmil_deepgraft_tpu.models.chowder import Chowder as FlaxChowder
from transmil_deepgraft_tpu.models.transformer_mil import TransformerMIL as FlaxTransformerMIL
from transmil_deepgraft_tpu.models.ctmil import CTMIL as FlaxCTMIL
from transmil_deepgraft_tpu.models.dtfd import DTFDMIL as FlaxDTFD
from transmil_deepgraft_tpu.models.mdmil import MDMIL as FlaxMDMIL
from transmil_deepgraft_tpu.utils.torch_weights import (
    convert_attmil_state_dict,
    convert_chowder_state_dict,
    convert_clam_state_dict,
    convert_ctmil_state_dict,
    convert_dtfd_state_dict,
    convert_mdmil_state_dict,
    convert_transformer_mil_state_dict,
    convert_transmil_state_dict,
)

# name -> (bag_n, in_features, n_classes); for ctmil bag_n is the GRID SIDE
# of its (side, side, in_features) spatial feature volume
CONFIGS = {
    "transmil_2048": (237, 2048, 2),
    "transmil_1024": (150, 1024, 3),
    "transmil_768": (100, 768, 2),
    "transmil_384": (60, 384, 5),
    "attmil_2048": (180, 2048, 2),
    "attmil_1024": (123, 1024, 3),
    "clam_sb": (90, 1024, 2),
    "clam_mb": (90, 1024, 3),
    "dtfd": (480, 1024, 2),
    "chowder": (120, 512, 2),
    "transformer_mil_2048": (140, 2048, 2),
    "transformer_mil_1024": (96, 1024, 3),
    "mdmil": (130, 1024, 2),
    "ctmil": (12, 1024, 2),
}


def make_bag(name: str, seed: int = 0) -> np.ndarray:
    n, in_features, _ = CONFIGS[name]
    rng = np.random.default_rng(seed)
    if name == "ctmil":  # spatial feature volume (H, W, C)
        return rng.standard_normal((n, n, in_features)).astype(np.float32)
    return rng.standard_normal((n, in_features)).astype(np.float32)


def build_torch(name: str, seed: int = 0):
    """Construct the torch reference model for ``name`` in eval mode."""
    import torch

    from tests.torch_ref import mil_torch as T

    _, in_features, n_classes = CONFIGS[name]
    torch.manual_seed(seed)
    if name.startswith("transmil"):
        model = T.TransMIL(n_classes=n_classes, in_features=in_features)
    elif name.startswith("attmil"):
        model = T.AttMIL(n_classes=n_classes, in_features=in_features)
    elif name == "clam_sb":
        model = T.CLAM_SB(n_classes=n_classes, subtyping=True)
    elif name == "clam_mb":
        model = T.CLAM_MB(n_classes=n_classes, subtyping=True)
    elif name == "dtfd":
        model = T.DTFDMIL(n_classes=n_classes, in_features=in_features)
    elif name == "chowder":
        model = T.Chowder(n_classes=n_classes, features=in_features)
    elif name.startswith("transformer_mil"):
        model = T.TransformerMIL(n_classes=n_classes, in_features=in_features)
    elif name == "mdmil":
        model = T.MDMIL(n_classes=n_classes, in_features=in_features)
    elif name == "ctmil":
        model = T.CTMIL(n_classes=n_classes, in_features=in_features)
        # non-trivial BN running stats so the converter's batch_stats path
        # is actually exercised
        g = np.random.default_rng(seed + 1)
        with torch.no_grad():
            for mod in model.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.copy_(torch.from_numpy(
                        0.05 * g.standard_normal(mod.num_features).astype(np.float32)))
                    mod.running_var.copy_(torch.from_numpy(
                        (1.0 + 0.1 * g.random(mod.num_features)).astype(np.float32)))
    else:
        raise KeyError(name)
    return model.eval()


def build_flax(name: str):
    """Construct the flax model matching ``name``."""
    _, in_features, n_classes = CONFIGS[name]
    if name.startswith("transmil"):
        return FlaxTransMIL(n_classes=n_classes, in_features=in_features)
    if name.startswith("attmil"):
        return FlaxAttMIL(n_classes=n_classes, in_features=in_features)
    if name == "clam_sb":
        return FlaxCLAM_SB(n_classes=n_classes, subtyping=True)
    if name == "clam_mb":
        return FlaxCLAM_MB(n_classes=n_classes, subtyping=True)
    if name == "dtfd":
        return FlaxDTFD(n_classes=n_classes, in_features=in_features)
    if name == "chowder":
        return FlaxChowder(n_classes=n_classes, in_features=in_features)
    if name.startswith("transformer_mil"):
        return FlaxTransformerMIL(n_classes=n_classes, in_features=in_features)
    if name == "mdmil":
        return FlaxMDMIL(n_classes=n_classes, in_features=in_features)
    if name == "ctmil":
        return FlaxCTMIL(n_classes=n_classes, in_features=in_features)
    raise KeyError(name)


def convert(name: str, state_dict) -> dict:
    _, in_features, n_classes = CONFIGS[name]
    if name.startswith("transmil"):
        return convert_transmil_state_dict(state_dict, in_features=in_features)
    if name.startswith("attmil"):
        return convert_attmil_state_dict(state_dict, in_features=in_features)
    if name.startswith("clam"):
        return convert_clam_state_dict(state_dict, n_classes=n_classes)
    if name == "dtfd":
        return convert_dtfd_state_dict(state_dict)
    if name == "chowder":
        return convert_chowder_state_dict(state_dict)
    if name.startswith("transformer_mil"):
        return convert_transformer_mil_state_dict(state_dict, in_features=in_features)
    if name == "mdmil":
        return convert_mdmil_state_dict(state_dict)
    if name == "ctmil":
        return convert_ctmil_state_dict(state_dict)
    raise KeyError(name)


def torch_forward(name: str, model, bag: np.ndarray) -> dict:
    """Run the torch model; returns {'logits': ..., extras...} as numpy."""
    import torch

    x = torch.from_numpy(bag)
    with torch.no_grad():
        if name.startswith("transmil"):
            logits, (attn, padding) = model(x, return_attn=True)
            n = bag.shape[0]
            return {
                "logits": logits.numpy(),
                # the reference's visualization row (visualize_mil.py:584-592)
                "attn_row": attn[0, :, padding + 1, :].numpy(),
                "tile_scores": attn[0, :, padding + 1, padding + 1: padding + 1 + n].numpy(),
            }
        if name.startswith("clam"):
            label = torch.tensor([1 % model.n_classes])
            logits, inst_loss = model(x, label=label, instance_eval=True)
            return {"logits": logits.numpy(), "inst_loss": np.float32(inst_loss.item())}
        if name == "dtfd":
            sub, slide = model(x, deterministic=True)
            return {"logits": slide.numpy(), "sub_logits": sub.numpy()}
        if name == "chowder":
            logits, _ = model(x[None])
            return {"logits": logits.numpy()}
        if name == "mdmil":
            logits, (attn, padding) = model(x, return_attn=True)
            n = bag.shape[0]
            # MDMIL exports the TRUE cls row (ref MDMIL.py __main__:
            # attn[:, :, 0, :]; cls sits at index `padding` after the
            # landmark front-pad)
            return {
                "logits": logits.numpy(),
                "attn_row": attn[0, :, padding, :].numpy(),
                "tile_scores": attn[0, :, padding, padding + 1: padding + 1 + n].numpy(),
            }
        if name == "ctmil":
            vol = x.permute(2, 0, 1).unsqueeze(0)  # (H, W, C) -> (1, C, H, W)
            return {"logits": model(vol).numpy()}
        return {"logits": model(x).numpy()}


def flax_forward(name: str, flax_model, variables: dict, bag: np.ndarray) -> dict:
    """Run the flax model deterministically; returns numpy outputs like
    :func:`torch_forward`."""
    import jax.numpy as jnp

    x = jnp.asarray(bag)
    if name.startswith("transmil"):
        logits, attn = flax_model.apply(
            variables, x, deterministic=True, return_attn=True
        )
        return {
            "logits": np.asarray(logits),
            "attn_row": np.asarray(attn.row[0]),
            "tile_scores": np.asarray(attn.tile_scores()[0]),
        }
    if name.startswith("clam"):
        _, _, n_classes = CONFIGS[name]
        logits, inst_loss = flax_model.apply(
            variables, x, label=jnp.asarray(1 % n_classes),
            instance_eval=True, deterministic=True,
        )
        return {"logits": np.asarray(logits), "inst_loss": np.float32(inst_loss)}
    if name == "dtfd":
        sub, slide = flax_model.apply(variables, x, deterministic=True)
        return {"logits": np.asarray(slide), "sub_logits": np.asarray(sub)}
    if name == "mdmil":
        logits, attn = flax_model.apply(variables, x, deterministic=True, return_attn=True)
        return {
            "logits": np.asarray(logits),
            "attn_row": np.asarray(attn.row[0]),
            "tile_scores": np.asarray(attn.tile_scores()[0]),
        }
    logits = flax_model.apply(variables, x, deterministic=True)
    return {"logits": np.asarray(logits)}
