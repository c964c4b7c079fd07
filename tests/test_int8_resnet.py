"""Int8 PTQ backbone: numeric fidelity vs the fp32 ResNet50 + plumbing checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
from transmil_deepgraft_tpu.models.resnet_int8 import (
    apply_qresnet50,
    build_qresnet50,
)


@pytest.fixture(scope="module")
def fp32_model_and_vars():
    rng = np.random.default_rng(0)
    model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    v = jax.device_get(model.init({"params": jax.random.key(0)}, jnp.asarray(x)))

    def perturb(tree):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out[k] = perturb(val)
            elif k == "mean":
                out[k] = val + 0.05 * rng.standard_normal(val.shape).astype(np.float32)
            elif k == "var":
                out[k] = val * (1.0 + 0.1 * rng.random(val.shape).astype(np.float32))
            else:
                out[k] = val
        return out

    return model, {"params": v["params"], "batch_stats": perturb(v["batch_stats"])}


def test_int8_feature_fidelity(fp32_model_and_vars, rng):
    model, v = fp32_model_and_vars
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(model.apply(v, jnp.asarray(x)))
    q = build_qresnet50(v, x[:2])
    got = np.asarray(jax.jit(apply_qresnet50)(q, jnp.asarray(x)))
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    # random-init nets are the WORST case for PTQ (no trained structure);
    # trained backbones quantize tighter still
    assert cos.min() > 0.999, cos
    assert got.shape == ref.shape == (4, 2048)


def test_int8_truncated_baseline(fp32_model_and_vars, rng):
    """truncate_after=3 mirrors the CLAM resnet50_baseline (1024-d)."""
    _, v = fp32_model_and_vars
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    q = build_qresnet50(v, x, truncate_after=3)
    feats = np.asarray(apply_qresnet50(q, jnp.asarray(x)))
    assert feats.shape == (2, 1024)
    ref_model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0, truncate_after=3)
    ref = np.asarray(ref_model.apply(v, jnp.asarray(x)))
    cos = (ref * feats).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(feats, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos


def test_int8_downstream_logit_shift(fp32_model_and_vars, rng):
    """Quantized features through TransMIL shift logits by < 0.05 (well inside
    the 0.005-AUC parity budget at slide level: ranking is preserved)."""
    from transmil_deepgraft_tpu.models import TransMIL

    model, v = fp32_model_and_vars
    tiles = rng.standard_normal((24, 64, 64, 3)).astype(np.float32)
    ref_feats = np.asarray(model.apply(v, jnp.asarray(tiles)))
    q = build_qresnet50(v, tiles[:8])
    q_feats = np.asarray(apply_qresnet50(q, jnp.asarray(tiles)))

    head = TransMIL(n_classes=2, in_features=2048)
    hv = head.init({"params": jax.random.key(1)}, jnp.asarray(ref_feats[None]))
    ref_logits = np.asarray(head.apply(hv, jnp.asarray(ref_feats[None])))
    q_logits = np.asarray(head.apply(hv, jnp.asarray(q_feats[None])))
    assert np.abs(ref_logits - q_logits).max() < 0.05, (ref_logits, q_logits)


def test_bf16_stage1_mixed_fidelity(fp32_model_and_vars, rng):
    """Mixed bf16-stage1 + int8-rest variant: at least as faithful to fp32 as
    the full-int8 path (stage1 runs in bf16; stage2 input code shares the
    calibrated scale)."""
    from transmil_deepgraft_tpu.models.resnet_int8 import (
        apply_qresnet50_bf16s1,
        build_bf16_stage1,
    )

    model, v = fp32_model_and_vars
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(model.apply(v, jnp.asarray(x)))
    calib = x[:2]
    q = build_qresnet50(v, calib)
    s1 = build_bf16_stage1(v, calib)

    def cos(a, b):
        return ((a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)).min()

    full_int8 = np.asarray(jax.jit(apply_qresnet50)(q, jnp.asarray(x)))
    mixed = np.asarray(jax.jit(apply_qresnet50_bf16s1)(q, s1, jnp.asarray(x)))
    assert mixed.shape == ref.shape
    assert cos(ref, mixed) >= cos(ref, full_int8) - 1e-4, (cos(ref, mixed), cos(ref, full_int8))
    assert cos(ref, mixed) > 0.999
