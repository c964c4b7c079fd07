"""DSMIL (dual-stream MIL, arXiv:2011.08939) — beyond-reference head.

Covers: forward shapes/finiteness, batch independence (each slide's logits
unaffected by its batch neighbors), the attention contract consumed by the
heatmap tooling, critical-instance semantics (the max-pooled stream really is
a max), and end-to-end learning through the Trainer on the separable
synthetic task (the convergence bar every other head family meets).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.models.dsmil import DSMIL
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig


def _init(model, x):
    return model.init({"params": jax.random.key(0)}, x)


def test_forward_shapes_and_registry():
    model = create_model("DSMIL", n_classes=3, in_features=64)
    assert isinstance(model, DSMIL)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 64), np.float32))
    v = _init(model, x)
    logits = model.apply(v, x)
    assert logits.shape == (2, 3) and np.isfinite(np.asarray(logits)).all()
    # 2-D input promotes to batch of one
    l1 = model.apply(v, x[0])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(logits[:1]), rtol=1e-6)


def test_batch_independence():
    model = DSMIL(n_classes=2, in_features=32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 25, 32), np.float32))
    v = _init(model, x)
    batched = np.asarray(model.apply(v, x))
    single = np.stack([np.asarray(model.apply(v, x[i : i + 1]))[0] for i in range(3)])
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-6)


def test_return_attn_contract():
    model = DSMIL(n_classes=2, in_features=32)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 30, 32), np.float32))
    v = _init(model, x)
    logits, scores = model.apply(v, x, return_attn=True)
    assert logits.shape == (1, 2) and scores.shape == (1, 30)
    s = np.asarray(scores)
    assert np.isfinite(s).all() and (s >= 0).all()
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-5)  # softmax column
    np.testing.assert_allclose(np.asarray(model.apply(v, x)), np.asarray(logits), rtol=1e-6)


def test_instance_stream_is_max_pooling():
    """0.5 * max-instance term: amplifying the strongest instance's feature
    direction moves the fused logit for that class."""
    model = DSMIL(n_classes=2, in_features=16, q_dim=8)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 12, 16)).astype(np.float32)
    v = _init(model, jnp.asarray(x))
    base = np.asarray(model.apply(v, jnp.asarray(x)))

    # instance logits from the params directly
    p = v["params"]["i_classifier"]
    ins = x[0] @ np.asarray(p["kernel"]) + np.asarray(p["bias"])  # (N, C)
    k = int(ins[:, 1].argmax())
    x2 = x.copy()
    x2[0, k] *= 4.0  # push the critical instance harder
    out = np.asarray(model.apply(v, jnp.asarray(x2)))
    ins2 = x2[0] @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
    assert ins2[:, 1].max() != ins[:, 1].max()
    assert not np.allclose(out, base)


def test_torch_cross_implementation_parity():
    """Parity vs the OFFICIAL DSMIL module layout (tests/torch_ref/dsmil_torch:
    IClassifier/BClassifier/MILNet, nonlinear=True + passing_v=True — the
    configuration the official WSI evaluation uses). The flax params are
    loaded into the torch module via the state-dict mapping (incl. the
    Conv1d(C, C, V) bag head), and the fused eval prediction
    ``0.5 * (bag + max-instance)`` must agree — the same cross-impl bar the
    reference-zoo heads meet via tests/torch_ref."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.dsmil_torch import build_official_dsmil, load_flax_dsmil_params

    n_classes, in_features, q_dim = 3, 24, 16
    model = DSMIL(n_classes=n_classes, in_features=in_features, q_dim=q_dim)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 50, in_features)).astype(np.float32)
    v = _init(model, jnp.asarray(x))

    net = build_official_dsmil(in_features, n_classes, q_dim=q_dim)
    load_flax_dsmil_params(net, jax.tree.map(np.asarray, v["params"]))
    net.eval()
    with torch.no_grad():
        ins_logits, bag_logits, attn, _ = net(torch.as_tensor(x[0]))
        torch_logits = 0.5 * (bag_logits[0] + ins_logits.max(dim=0).values)

    flax_logits = np.asarray(model.apply(v, jnp.asarray(x)))[0]
    np.testing.assert_allclose(flax_logits, torch_logits.numpy(), rtol=1e-4, atol=1e-5)

    # attention contract too: flax return_attn equals the official A column
    # for the predicted class
    logits, scores = model.apply(v, jnp.asarray(x), return_attn=True)
    pred = int(np.asarray(logits).argmax())
    np.testing.assert_allclose(
        np.asarray(scores)[0], attn[:, pred].numpy(), rtol=1e-4, atol=1e-6
    )


def test_pad_masking_matches_exact_bag():
    """With ``lengths``, a zero-padded bag must produce the same logits and
    attention as the unpadded bag (pad rows can't win the instance-stream
    max/argmax and get no attention mass) — the ADVICE r3 pad-sensitivity fix."""
    model = DSMIL(n_classes=3, in_features=20, q_dim=12)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 17, 20)).astype(np.float32)
    v = _init(model, jnp.asarray(x))
    exact = np.asarray(model.apply(v, jnp.asarray(x)))

    pad = np.zeros((1, 32, 20), np.float32)
    pad[:, :17] = x
    lengths = jnp.asarray([17], jnp.int32)
    masked = np.asarray(model.apply(v, jnp.asarray(pad), lengths=lengths))
    np.testing.assert_allclose(masked, exact, rtol=1e-5, atol=1e-6)

    logits, scores = model.apply(v, jnp.asarray(pad), lengths=lengths, return_attn=True)
    s = np.asarray(scores)[0]
    assert s[17:].max() < 1e-6  # pad rows hold no attention mass
    np.testing.assert_allclose(s.sum(), 1.0, atol=1e-5)

    # without lengths the padded bag CAN differ (documents why the flag exists)
    unmasked = np.asarray(model.apply(v, jnp.asarray(pad)))
    assert unmasked.shape == exact.shape


def test_dsmil_learns_synthetic_signal(tmp_path):
    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 32, "n_val": 16, "n_test": 8, "bag_size": 32,
                   "feature_size": 32, "signal": 3.0},
        seed=5,
    )
    model = DSMIL(n_classes=2, in_features=32, q_dim=32)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=15, patience=15, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="DSMIL")
    hist = tr.fit()
    assert hist["val_auc"] > 0.85, hist
