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


def convert_transmil_state_dict(state_dict: Mapping[str, Any], in_features: int = 2048) -> dict:
    """torch TransMIL state dict -> flax params for
    :class:`transmil_deepgraft_tpu.models.transmil.TransMIL`.

    Key layout of the reference model (``models/TransMIL.py:78-155`` with the
    lucidrains NystromAttention submodule; Lightning ckpts prefix everything
    with ``model.``):
      _fc1.{i}.weight/bias            input MLP (Linear / LayerNorm indices vary
                                      by in_features variant)
      cls_token                       (1, 1, 512)
      layer{1,2}.norm.weight/bias     pre-norm LN
      layer{1,2}.attn.to_qkv.weight   (1536, 512)
      layer{1,2}.attn.to_out.0.weight/bias
      layer{1,2}.attn.res_conv.weight (heads, 1, ks, 1) depthwise value conv
      pos_layer.proj{,1,2}.weight     (512, 1, k, k) depthwise PPEG convs + bias
      norm.weight/bias; _fc.weight/bias
    """
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {}

    def lin(dst: str, src: str) -> None:
        p[dst] = {"kernel": _np(sd[f"{src}.weight"]).T}
        if f"{src}.bias" in sd:
            p[dst]["bias"] = _np(sd[f"{src}.bias"])

    def ln(dst: str, src: str) -> None:
        p[dst] = {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])}

    # fc1 variants (ref TransMIL.py:100-133): sequential indices of Linear/LN.
    if in_features == 2048:
        lin("fc1_0", "_fc1.0")
        ln("fc1_norm0", "_fc1.2")
        lin("fc1_1", "_fc1.3")
    elif in_features in (1024, 768):
        lin("fc1_0", "_fc1.0")
        ln("fc1_norm0", "_fc1.3")
        lin("fc1_1", "_fc1.4")
        if "_fc1.7.weight" in sd:
            ln("fc1_norm1", "_fc1.7")
    else:
        lin("fc1_0", "_fc1.0")

    p["cls_token"] = _np(sd["cls_token"])
    _map_translayer(sd, p, "layer1")
    _map_translayer(sd, p, "layer2")
    _map_ppeg(sd, p, "pos_layer")
    ln("norm", "norm")
    lin("fc", "_fc")
    return {"params": _nest(p)}


def _gated_attention_params(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch gated-attention triple (attention_V/U Sequential + attention_weights
    Linear) -> the raw-param layout used by ``ops/pooling.gated_attention_pool``
    consumers (AttMIL / DTFD GatedAttention): weight (in, out) + separate bias."""
    p = {}
    for name in ("attention_V", "attention_U"):
        p[name] = _np(sd[f"{prefix}{name}.0.weight"]).T
        p[f"{name}_bias"] = _np(sd[f"{prefix}{name}.0.bias"])
    p["attention_weights"] = _np(sd[f"{prefix}attention_weights.weight"]).T
    p["attention_weights_bias"] = _np(sd[f"{prefix}attention_weights.bias"])
    return p


def _map_translayer(sd: Mapping[str, Any], p: dict, layer: str) -> None:
    """Map one reference TransLayer (norm + NystromAttention) into ``p``."""
    p[f"{layer}.norm"] = {
        "scale": _np(sd[f"{layer}.norm.weight"]), "bias": _np(sd[f"{layer}.norm.bias"]),
    }
    attn: dict = {}
    attn["to_qkv"] = {"kernel": _np(sd[f"{layer}.attn.to_qkv.weight"]).T}
    attn["to_out"] = {
        "kernel": _np(sd[f"{layer}.attn.to_out.0.weight"]).T,
        "bias": _np(sd[f"{layer}.attn.to_out.0.bias"]),
    }
    # torch res_conv weight (heads, 1, ks, 1) -> flax param (ks, heads)
    rc = _np(sd[f"{layer}.attn.res_conv.weight"])
    attn["res_conv"] = rc[:, 0, :, 0].T
    p[f"{layer}.attn"] = attn


def _map_ppeg(sd: Mapping[str, Any], p: dict, src: str, dst: str = "pos_layer") -> None:
    """Map a reference PPEG (proj/proj1/proj2 depthwise convs) into ``p``."""
    pos: dict = {}
    for name in ("proj", "proj1", "proj2"):
        w = _np(sd[f"{src}.{name}.weight"])  # (C, 1, k, k)
        pos[name] = w.transpose(2, 3, 1, 0)  # (k, k, 1, C)
        pos[f"{name}_bias"] = _np(sd[f"{src}.{name}.bias"])
    p[dst] = pos


def _nest(flat: Mapping[str, Any]) -> dict:
    """Nest dotted keys, merging shared prefixes (layer1.norm / layer1.attn)."""
    nested: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        if parts[-1] in node and isinstance(node[parts[-1]], dict) and isinstance(v, dict):
            node[parts[-1]].update(v)
        else:
            node[parts[-1]] = v
    return nested


def convert_mdmil_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch MDMIL (ref ``models/MDMIL.py:60-115``) -> flax
    :class:`transmil_deepgraft_tpu.models.mdmil.MDMIL` params.

    Key layout: ``_fc1.0`` Linear, ``cls_token``, ``layer{1,2}`` TransLayers,
    ``pos_layer`` PPEG, ``norm`` LN, ``_fc2`` classifier."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {
        "fc1": {"kernel": _np(sd["_fc1.0.weight"]).T, "bias": _np(sd["_fc1.0.bias"])},
        "cls_token": _np(sd["cls_token"]),
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "fc2": {"kernel": _np(sd["_fc2.weight"]).T, "bias": _np(sd["_fc2.bias"])},
    }
    _map_translayer(sd, p, "layer1")
    _map_translayer(sd, p, "layer2")
    _map_ppeg(sd, p, "pos_layer")
    return {"params": _nest(p)}


def convert_ctmil_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch CTMIL (ref ``models/CTMIL.py:74-165``) -> flax
    :class:`transmil_deepgraft_tpu.models.ctmil.CTMIL` variables.

    Conv tokenizer Sequentials (``conv{1,2}.0`` Conv2d + ``.1`` BatchNorm2d),
    ``pos_layer_0`` PPEG, TransLayers, ``_fc2``. The reference's dead
    ``_fc1.*`` weights (declared but never used by its forward) are skipped.
    Returns ``{'params': ..., 'batch_stats': ...}`` (BN running stats)."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {
        "cls_token": _np(sd["cls_token"]),
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "fc": {"kernel": _np(sd["_fc2.weight"]).T, "bias": _np(sd["_fc2.bias"])},
    }
    stats: dict = {}
    for i in (1, 2):
        w = _np(sd[f"conv{i}.0.weight"])  # (O, I, kh, kw)
        p[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
        p[f"bn{i}"] = {
            "scale": _np(sd[f"conv{i}.1.weight"]), "bias": _np(sd[f"conv{i}.1.bias"]),
        }
        stats[f"bn{i}"] = {
            "mean": _np(sd[f"conv{i}.1.running_mean"]),
            "var": _np(sd[f"conv{i}.1.running_var"]),
        }
    _map_translayer(sd, p, "layer1")
    _map_translayer(sd, p, "layer2")
    _map_ppeg(sd, p, "pos_layer_0", dst="pos_layer")
    return {"params": _nest(p), "batch_stats": stats}


def convert_attmil_state_dict(state_dict: Mapping[str, Any], in_features: int = 2048) -> dict:
    """torch AttMIL (ref ``AttMIL.py:20-110``) -> flax params for
    :class:`transmil_deepgraft_tpu.models.attmil.AttMIL`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {}

    def lin(dst: str, src: str) -> None:
        p[dst] = {"kernel": _np(sd[f"{src}.weight"]).T, "bias": _np(sd[f"{src}.bias"])}

    lin("fc1_0", "_fc1.0")
    if in_features == 2048:
        p["fc1_norm0"] = {"scale": _np(sd["_fc1.3.weight"]), "bias": _np(sd["_fc1.3.bias"])}
        lin("fc1_1", "_fc1.4")
    else:
        p["fc1_norm0"] = {"scale": _np(sd["_fc1.3.weight"]), "bias": _np(sd["_fc1.3.bias"])}
    p.update(_gated_attention_params(sd, ""))
    lin("classifier", "classifier.0")
    return {"params": p}


def convert_clam_state_dict(state_dict: Mapping[str, Any], n_classes: int = 2) -> dict:
    """torch CLAM_SB / CLAM_MB (ref ``model_clam.py:71-280``) -> flax params for
    :class:`transmil_deepgraft_tpu.models.clam.CLAM_SB` / ``CLAM_MB``.

    Handles both attention_net layouts (index 2 without dropout, 3 with)."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {}

    def lin(src: str) -> dict:
        return {"kernel": _np(sd[f"{src}.weight"]).T, "bias": _np(sd[f"{src}.bias"])}

    p["fc"] = lin("attention_net.0")
    gate_idx = 3 if "attention_net.3.attention_a.0.weight" in sd else 2
    p["attention_net"] = {
        "attention_a": lin(f"attention_net.{gate_idx}.attention_a.0"),
        "attention_b": lin(f"attention_net.{gate_idx}.attention_b.0"),
        "attention_c": lin(f"attention_net.{gate_idx}.attention_c"),
    }
    if "classifiers.weight" in sd:  # single branch
        p["classifiers"] = lin("classifiers")
    else:  # multi branch: one 1-logit classifier per class
        for c in range(n_classes):
            p[f"classifier_{c}"] = lin(f"classifiers.{c}")
    for c in range(n_classes):
        key = f"instance_classifiers.{c}.weight"
        if key in sd:
            p[f"instance_classifier_{c}"] = lin(f"instance_classifiers.{c}")
    return {"params": p}


def convert_dtfd_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch DTFD modules (ref ``DTFDMIL.py:14-108`` wired as in
    ``model_interface_dtfd.py:160-165``: dimreduction/attention/classifier/attCls)
    -> flax params for :class:`transmil_deepgraft_tpu.models.dtfd.DTFDMIL`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {
        "dimreduction": {"fc1": {"kernel": _np(sd["dimreduction.fc1.weight"]).T}},
        "attention": _gated_attention_params(sd, "attention."),
        "classifier": {
            "kernel": _np(sd["classifier.fc.weight"]).T,
            "bias": _np(sd["classifier.fc.bias"]),
        },
        "attCls": {
            "attention": _gated_attention_params(sd, "attCls.attention."),
            "classifier": {
                "kernel": _np(sd["attCls.classifier.fc.weight"]).T,
                "bias": _np(sd["attCls.classifier.fc.bias"]),
            },
        },
    }
    return {"params": p}


def convert_transformer_mil_state_dict(
    state_dict: Mapping[str, Any], in_features: int = 2048
) -> dict:
    """torch TransformerMIL (ref ``TransformerMIL.py:74-152`` active forward)
    -> flax params for :class:`...models.transformer_mil.TransformerMIL`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}

    def dense(prefix):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    p: dict = {"cls_token": _np(sd["cls_token"])}
    if in_features == 2048:
        p["fc1_0"] = dense("fc1.0")
        p["fc1_norm0"] = ln("fc1.3")
        p["fc1_1"] = dense("fc1.4")
    elif in_features == 1024:
        p["fc1_0"] = dense("fc1.0")
        p["fc1_norm0"] = ln("fc1.3")
    else:
        p["fc1_0"] = dense("fc1.0")
    for t in ("transformer1", "transformer2"):
        blk: dict = {}
        for i in range(2):
            blk[f"attn_norm_{i}"] = ln(f"{t}.layers.{i}.0.norm")
            blk[f"attn_{i}"] = {
                "to_qkv": {"kernel": _np(sd[f"{t}.layers.{i}.0.fn.to_qkv.weight"]).T},
                "to_out": dense(f"{t}.layers.{i}.0.fn.to_out.0"),
            }
            blk[f"ff_norm_{i}"] = ln(f"{t}.layers.{i}.1.norm")
            blk[f"ff_{i}"] = {
                "Dense_0": dense(f"{t}.layers.{i}.1.fn.net.0"),
                "Dense_1": dense(f"{t}.layers.{i}.1.fn.net.3"),
            }
        p[t] = blk
    p["norm"] = ln("norm")
    p["fc2"] = dense("_fc2")
    return {"params": p}


def convert_chowder_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch Chowder (ref ``Chowder.py:19-50``: Conv1d(L,1,1) scorer + 3-layer
    MLP) -> flax params for :class:`transmil_deepgraft_tpu.models.chowder.Chowder`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    return {"params": {
        "f1": {
            "kernel": _np(sd["f1.0.weight"])[:, :, 0].T,  # (1, L, 1) -> (L, 1)
            "bias": _np(sd["f1.0.bias"]),
        },
        "f2_0": {"kernel": _np(sd["f2.0.weight"]).T, "bias": _np(sd["f2.0.bias"])},
        "f2_1": {"kernel": _np(sd["f2.1.weight"]).T, "bias": _np(sd["f2.1.bias"])},
        "f2_2": {"kernel": _np(sd["f2.2.weight"]).T, "bias": _np(sd["f2.2.bias"])},
    }}


def convert_efficientnet_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torchvision-layout EfficientNet-B0 state dict (``features.{i}.{b}.block.
    {j}...``) -> flax variables for
    :class:`transmil_deepgraft_tpu.models.efficientnet.EfficientNet`.

    Works for both the standard B0 SE widths and the NVIDIA 'widese' variant
    (same key layout, different SE bottleneck shapes - the converter is
    shape-agnostic). Golden-tested against a live torch fixture in
    ``tests/test_backbone_converters.py``."""
    from transmil_deepgraft_tpu.models.efficientnet import B0_STAGES

    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def conv(dst: str, src: str, depthwise: bool = False) -> None:
        w = _np(sd[f"{src}.weight"])
        params[dst] = {"kernel": w.transpose(2, 3, 1, 0)}
        if f"{src}.bias" in sd:
            params[dst]["bias"] = _np(sd[f"{src}.bias"])

    def bn(dst: str, src: str) -> None:
        params[dst] = {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])}
        stats[dst] = {"mean": _np(sd[f"{src}.running_mean"]), "var": _np(sd[f"{src}.running_var"])}

    conv("stem_conv", "features.0.0")
    bn("stem_bn", "features.0.1")
    for si, (e, _k, _s, _c, r) in enumerate(B0_STAGES):
        for b in range(r):
            t = f"features.{si + 1}.{b}.block"
            f = f"stage{si}_block{b}"
            idx = 0
            if e != 1:
                conv(f"{f}.expand_conv", f"{t}.{idx}.0")
                bn(f"{f}.expand_bn", f"{t}.{idx}.1")
                idx += 1
            conv(f"{f}.dw_conv", f"{t}.{idx}.0", depthwise=True)
            bn(f"{f}.dw_bn", f"{t}.{idx}.1")
            idx += 1
            conv(f"{f}.se.reduce", f"{t}.{idx}.fc1")
            conv(f"{f}.se.expand", f"{t}.{idx}.fc2")
            idx += 1
            conv(f"{f}.project_conv", f"{t}.{idx}.0")
            bn(f"{f}.project_bn", f"{t}.{idx}.1")
    conv("head_conv", "features.8.0")
    bn("head_bn", "features.8.1")
    if "classifier.1.weight" in sd:
        params["classifier"] = {
            "kernel": _np(sd["classifier.1.weight"]).T,
            "bias": _np(sd["classifier.1.bias"]),
        }

    def nest(flat: dict) -> dict:
        tree: dict = {}
        for key, value in flat.items():
            node = tree
            parts = key.split(".")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = value
        return tree

    return {"params": nest(params), "batch_stats": nest(stats)}


def convert_vit_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """DINO / timm ViT state dict (``facebook/dino-vitb16``-style naming:
    ``patch_embed.proj``, ``blocks.{i}.attn.qkv`` ...) -> flax params for
    :class:`transmil_deepgraft_tpu.models.vit.VisionTransformer`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        blk: dict = {}
        for norm in ("norm1", "norm2"):
            blk[norm] = {
                "scale": _np(sd[f"blocks.{i}.{norm}.weight"]),
                "bias": _np(sd[f"blocks.{i}.{norm}.bias"]),
            }
        blk["qkv"] = {
            "kernel": _np(sd[f"blocks.{i}.attn.qkv.weight"]).T,
            "bias": _np(sd[f"blocks.{i}.attn.qkv.bias"]),
        }
        blk["proj"] = {
            "kernel": _np(sd[f"blocks.{i}.attn.proj.weight"]).T,
            "bias": _np(sd[f"blocks.{i}.attn.proj.bias"]),
        }
        for fc in ("fc1", "fc2"):
            blk[fc] = {
                "kernel": _np(sd[f"blocks.{i}.mlp.{fc}.weight"]).T,
                "bias": _np(sd[f"blocks.{i}.mlp.{fc}.bias"]),
            }
        p[f"block{i}"] = blk
        i += 1
    if "head.weight" in sd:
        p["head"] = {"kernel": _np(sd["head.weight"]).T, "bias": _np(sd["head.bias"])}
    return {"params": p}


def convert_inception_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torchvision ``inception_v3`` state dict -> flax variables for
    :class:`transmil_deepgraft_tpu.models.inception.InceptionV3`. Module names
    mirror torchvision's exactly, so this is a generic conv/bn/linear walk.
    AuxLogits.* keys are skipped (eval-mode model)."""
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: list[str], value) -> None:
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0].startswith("module"):
            parts = parts[1:]
        if parts[0] == "AuxLogits" or parts[0] == "model":
            if parts[0] == "AuxLogits":
                continue
            parts = parts[1:]
        v = _np(value)
        leaf = parts[-1]
        mod = parts[-2] if len(parts) >= 2 else ""
        if mod == "conv" and leaf == "weight":
            put(params, parts[:-1] + ["kernel"], v.transpose(2, 3, 1, 0))
        elif mod == "bn":
            _put_bn(params, stats, parts[:-1], leaf, v)
        elif parts[0] == "fc":
            if leaf == "weight":
                put(params, ["fc", "kernel"], v.T)
            else:
                put(params, ["fc", "bias"], v)
        # num_batches_tracked and anything else: ignored

    return {"params": params, "batch_stats": stats}


def _torch_encoder_params(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch ``nn.TransformerEncoder`` state dict -> flax params for
    :class:`transmil_deepgraft_tpu.models.layers.TorchTransformerEncoder`."""
    out: dict = {}
    i = 0
    while f"{prefix}layers.{i}.self_attn.in_proj_weight" in sd:
        layer = {
            "in_proj": {
                "kernel": _np(sd[f"{prefix}layers.{i}.self_attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}layers.{i}.self_attn.in_proj_bias"]),
            },
            "out_proj": {
                "kernel": _np(sd[f"{prefix}layers.{i}.self_attn.out_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}layers.{i}.self_attn.out_proj.bias"]),
            },
        }
        for lin in ("linear1", "linear2"):
            layer[lin] = {
                "kernel": _np(sd[f"{prefix}layers.{i}.{lin}.weight"]).T,
                "bias": _np(sd[f"{prefix}layers.{i}.{lin}.bias"]),
            }
        for norm in ("norm1", "norm2"):
            layer[norm] = {
                "scale": _np(sd[f"{prefix}layers.{i}.{norm}.weight"]),
                "bias": _np(sd[f"{prefix}layers.{i}.{norm}.bias"]),
            }
        out[f"layers_{i}"] = layer
        i += 1
    if i == 0:
        raise KeyError(f"no encoder layers under '{prefix}'")
    return out


def convert_monai_mil_state_dict(state_dict: Mapping[str, Any], mil_mode: str = "att_trans") -> dict:
    """torch MONAI MILModel head (ref ``MonaiMILModel.py:11-232``) -> flax params
    for :class:`transmil_deepgraft_tpu.models.monai_mil.MonaiMIL`. Backbone keys
    (``net.*``) convert separately via :func:`convert_resnet_state_dict`."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    p: dict = {}

    def lin(dst: str, src: str) -> None:
        p[dst] = {"kernel": _np(sd[f"{src}.weight"]).T, "bias": _np(sd[f"{src}.bias"])}

    lin("myfc", "myfc")
    if mil_mode in ("att", "att_trans", "att_trans_pyramid"):
        lin("attention_0", "attention.0")
        lin("attention_1", "attention.2")
    if mil_mode == "att_trans":
        p["transformer"] = _torch_encoder_params(sd, "transformer.")
    elif mil_mode == "att_trans_pyramid":
        p["transformer_0"] = _torch_encoder_params(sd, "transformer.0.")
        lin("transformer_1_proj", "transformer.1.0")
        p["transformer_1"] = _torch_encoder_params(sd, "transformer.1.1.")
        lin("transformer_2_proj", "transformer.2.0")
        p["transformer_2"] = _torch_encoder_params(sd, "transformer.2.1.")
        p["transformer_3"] = _torch_encoder_params(sd, "transformer.3.")
    return {"params": p}


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.ckpt with torch (CPU); returns the raw state dict
    (unwraps Lightning's ``state_dict`` key)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj
