"""Torch state-dict -> flax variables converters.

Converts the reference's checkpoints (``retccl_best_ckpt.pth``, torchvision
ResNets, TransMIL Lightning ckpts) into this framework's parameter trees.
Pure name/transpose mapping - torch ``Conv2d.weight (O,I,H,W)`` -> flax NHWC
``kernel (H,W,I,O)``, ``Linear.weight (O,I)`` -> ``kernel (I,O)``, BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_resnet_state_dict(
    state_dict: Mapping[str, Any], truncate_after: int = 4
) -> dict:
    """torch ResNet state dict -> {'params': ..., 'batch_stats': ...} for
    :class:`transmil_deepgraft_tpu.models.resnet.ResNet`.

    Handles torchvision naming (``layer1.0.conv1.weight``) and the RetCCL ckpt's
    extras (fc/instDis/groupDis heads are skipped in feature mode).
    """
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: list[str], value: np.ndarray) -> None:
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        v = _np(value)
        parts = key.split(".")
        if parts[0].startswith("module"):  # DataParallel prefix
            parts = parts[1:]
        head = parts[0]

        if head == "conv1":
            put(params, ["conv1", "kernel"], v.transpose(2, 3, 1, 0))
        elif head == "bn1":
            _put_bn(params, stats, ["bn1"], parts[1], v)
        elif head.startswith("layer"):
            stage = int(head[5:])
            if stage > truncate_after:
                continue
            block_idx = parts[1]
            mod = parts[2]
            name = f"layer{stage}_{block_idx}"
            if mod.startswith("conv"):
                put(params, [name, mod, "kernel"], v.transpose(2, 3, 1, 0))
            elif mod.startswith("bn"):
                _put_bn(params, stats, [name, mod], parts[3], v)
            elif mod == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                if sub == "downsample_conv":
                    put(params, [name, sub, "kernel"], v.transpose(2, 3, 1, 0))
                else:
                    _put_bn(params, stats, [name, sub], parts[4], v)
        # heads (fc / instDis / groupDis) are intentionally skipped: backbones run
        # in feature mode (fc = Identity, ref model_interface.py:247).

    return {"params": params, "batch_stats": stats}


def _put_bn(params: dict, stats: dict, path: list[str], field: str, v: np.ndarray) -> None:
    def put(tree: dict, p: list[str], value: np.ndarray) -> None:
        node = tree
        for k in p[:-1]:
            node = node.setdefault(k, {})
        node[p[-1]] = value

    if field == "weight":
        put(params, path + ["scale"], v)
    elif field == "bias":
        put(params, path + ["bias"], v)
    elif field == "running_mean":
        put(stats, path + ["mean"], v)
    elif field == "running_var":
        put(stats, path + ["var"], v)
    # num_batches_tracked ignored


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.ckpt with torch (CPU); returns the raw state dict
    (unwraps Lightning's ``state_dict`` key)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj
