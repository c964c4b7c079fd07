"""BN-backbone image pipeline: frozen batch_stats must flow through the
trainer (regression: params-only apply raised ScopeCollectionNotFound for any
in-graph BatchNorm backbone — retccl/resnet50/resnet18).

Ref: the reference trains ImageMIL with a frozen BN backbone in the graph
(``model_interface.py:237-317``); BN running stats live in the state dict."""

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.datamodule import Batch
from transmil_deepgraft_tpu.models import AttMIL
from transmil_deepgraft_tpu.models.backbones import ImageMILModel, create_backbone
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig


def _image_trainer(tmp_path):
    backbone, dim = create_backbone("resnet18", out_features=32)
    head = AttMIL(n_classes=2, in_features=dim, out_features=16, attn_dim=8)
    model = ImageMILModel(backbone=backbone, head=head, n_chunks=2)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=1, log_dir=str(tmp_path), task="norm_rest")
    return Trainer(model, tx, None, n_classes=2, loss_fn=create_loss(), config=cfg,
                   model_name="AttMIL")


def _image_batch(rng, b=1, bag=4, hw=32):
    return Batch(
        bags=rng.standard_normal((b, bag, hw, hw, 3)).astype(np.float32),
        labels=np.zeros(b, np.int32),
        lengths=np.full(b, bag, np.int32),
        names=[f"s{i}" for i in range(b)],
        patients=[f"p{i}" for i in range(b)],
        coords=[np.zeros((bag, 2), np.int64)] * b,
    )


def test_bn_backbone_train_and_eval_steps(tmp_path):
    rng = np.random.default_rng(0)
    tr = _image_trainer(tmp_path)
    batch = _image_batch(rng)
    tr.init_params(batch)
    assert "batch_stats" in tr.model_state  # BN stats captured, not dropped

    step = tr._build_train_step()
    # params/opt_state are DONATED by the step: adopt the returned ones
    tr.params, tr.opt_state, loss, probs = step(
        tr.params, tr.model_state, tr.opt_state,
        jnp.asarray(batch.bags), jnp.asarray(batch.labels), jax.random.key(0),
    )
    assert np.isfinite(float(loss))
    assert probs.shape == (1, 2)

    fn = tr._eval_fn(batch.bags.shape[1:], with_attn=False)
    probs, logits, _ = fn(tr.params, tr.model_state, jnp.asarray(batch.bags))
    assert np.isfinite(np.asarray(logits)).all()


def test_backbone_weight_injection_and_ckpt_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    tr = _image_trainer(tmp_path)
    tr.init_params(_image_batch(rng))

    # fresh backbone variables (stands in for a converted RetCCL checkpoint)
    backbone, _ = create_backbone("resnet18", out_features=32)
    x = jnp.zeros((1, 32, 32, 3))
    bb_vars = backbone.init({"params": jax.random.key(7)}, x)
    tr.set_backbone_variables(jax.device_get(bb_vars))

    got_mean = tr.model_state["batch_stats"]["backbone"]
    want_mean = bb_vars["batch_stats"]

    # RAW (un-projected) converted weights nest into ProjectedBackbone's inner
    # slot, keeping the trainable 'proj' head (the CLI's torch .pth path)
    from transmil_deepgraft_tpu.models.resnet import resnet18 as _raw_r18

    raw = _raw_r18().init({"params": jax.random.key(9)}, x)
    proj_before = tr.params["backbone"]["proj"]
    tr.set_backbone_variables(jax.device_get(raw))
    assert "proj" in tr.params["backbone"]
    np.testing.assert_array_equal(
        np.asarray(tr.params["backbone"]["proj"]["kernel"]),
        np.asarray(proj_before["kernel"]),
    )
    assert "backbone" in tr.model_state["batch_stats"]["backbone"]
    # and the eval step still runs with the nested injection
    b2 = _image_batch(rng)
    fn2 = tr._eval_fn(b2.bags.shape[1:], with_attn=False)
    probs2, _, _ = fn2(tr.params, tr.model_state, jnp.asarray(b2.bags))
    assert np.isfinite(np.asarray(probs2)).all()

    tr.set_backbone_variables(jax.device_get(bb_vars))  # restore for below
    chex_equal = jax.tree.all(
        jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), got_mean, want_mean)
    )
    assert chex_equal

    # checkpoint roundtrip preserves model_state
    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree

    tree = {"params": tr.params, "model_state": tr.model_state}
    save_pytree(tmp_path / "img.ckpt", tree)
    restored = load_pytree(tmp_path / "img.ckpt", tree)
    assert "batch_stats" in restored["model_state"]

    # and the eval step runs with the injected stats
    batch = _image_batch(rng)
    fn = tr._eval_fn(batch.bags.shape[1:], with_attn=False)
    probs, _, _ = fn(tr.params, tr.model_state, jnp.asarray(batch.bags))
    assert np.isfinite(np.asarray(probs)).all()
