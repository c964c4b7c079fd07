"""Shape/grad smoke tests for the MIL model zoo (the reference's __main__ blocks,
as pytest; ref ``models/TransMIL.py:214-244`` etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import (
    AttMIL,
    Chowder,
    CLAM_MB,
    CLAM_SB,
    DTFDMIL,
    MDMIL,
    TransMIL,
    TransformerMIL,
    create_model,
)

BAG = 300  # small bag for CPU test speed


def _init_and_apply(model, x, **apply_kwargs):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1), "shuffle": jax.random.key(2)}
    variables = model.init(rngs, x)
    return variables, model.apply(variables, x, **apply_kwargs)


@pytest.mark.parametrize("in_features", [2048, 1024, 768, 384])
def test_transmil_forward(in_features):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, in_features), dtype=np.float32))
    model = TransMIL(n_classes=3, in_features=in_features)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_transmil_return_attn():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 384), dtype=np.float32))
    model = TransMIL(n_classes=2, in_features=384)
    variables, _ = _init_and_apply(model, x)
    logits, attn = model.apply(variables, x, return_attn=True)
    assert logits.shape == (1, 2)
    scores = attn.tile_scores()
    assert scores.shape == (1, 8, BAG)  # (B, heads, H) like the reference slice
    assert np.isfinite(np.asarray(scores)).all()
    # attention rows are a near-distribution over padded keys (exact up to the
    # Newton-Schulz pinv approximation error, like the reference's)
    total = np.asarray(attn.row).sum(-1)
    np.testing.assert_allclose(total, 1.0, rtol=5e-3)


def test_transmil_grads_flow():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 128, 384), dtype=np.float32))
    model = TransMIL(n_classes=2, in_features=384)
    variables = model.init({"params": jax.random.key(0)}, x)

    def loss_fn(params):
        logits = model.apply({"params": params}, x)
        return jnp.sum(logits**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_attmil_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 2048), dtype=np.float32))
    model = AttMIL(n_classes=2, in_features=2048)
    variables, logits = _init_and_apply(model, x)
    assert logits.shape == (1, 2)
    logits2, attn = model.apply(variables, x, return_attn=True)
    assert attn.shape == (1, 1, BAG)
    np.testing.assert_allclose(np.asarray(attn).sum(), 1.0, rtol=1e-5)


def test_transformer_mil_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 2048), dtype=np.float32))
    model = TransformerMIL(n_classes=4, in_features=2048)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, 4)


def test_chowder_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 512), dtype=np.float32))
    model = Chowder(n_classes=2, in_features=512)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, 2)


@pytest.mark.parametrize("cls", [CLAM_SB, CLAM_MB])
def test_clam_forward(cls):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((BAG, 1024), dtype=np.float32))
    model = cls(n_classes=2, in_features=1024)
    variables = model.init({"params": jax.random.key(0)}, x, label=jnp.int32(1), instance_eval=True)
    logits, inst_loss = model.apply(variables, x, label=jnp.int32(1), instance_eval=True)
    assert logits.shape == (1, 2)
    assert np.isfinite(float(inst_loss))


def test_dtfd_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1000, 1024), dtype=np.float32))
    model = DTFDMIL(n_classes=2, in_features=1024)
    rngs = {"params": jax.random.key(0), "shuffle": jax.random.key(1)}
    variables = model.init(rngs, x)
    sub, slide = model.apply(variables, x, deterministic=False, rngs={"shuffle": jax.random.key(7)})
    assert sub.shape == (8, 2)  # 1000 // 120 = 8 pseudo-bags
    assert slide.shape == (1, 2)
    tier1, tier2 = DTFDMIL.parameter_groups(variables)
    assert set(tier2) == {"attCls"}
    assert "dimreduction" in tier1 and "attention" in tier1 and "classifier" in tier1


def test_mdmil_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, BAG, 1024), dtype=np.float32))
    model = MDMIL(n_classes=2, in_features=1024)
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x)
    logits, attn = model.apply(variables, x, return_attn=True)
    assert logits.shape == (1, 2)


def test_registry():
    m = create_model("TransMIL", n_classes=2, in_features=2048)
    assert isinstance(m, TransMIL)
    with pytest.raises(KeyError):
        create_model("NopeMIL", n_classes=2)
