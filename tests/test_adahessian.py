"""AdaHessian: Hutchinson diag estimate + optimizer step + end-to-end fit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transmil_deepgraft_tpu.train.adahessian import (
    adahessian,
    hutchinson_diag_hessian,
    value_grad_and_diag_hessian,
)


def test_hutchinson_unbiased_on_quadratic():
    """For loss = 0.5 x^T D x the exact diag(H) = D; Hutchinson with Rademacher
    probes is exact per-probe for diagonal Hessians."""
    d = jnp.array([1.0, 2.0, 3.0, 4.0])

    def loss(x):
        return 0.5 * jnp.sum(d * x * x)

    x = jnp.ones(4)
    est = hutchinson_diag_hessian(loss, x, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(est), np.asarray(d), rtol=1e-6)


def test_adahessian_converges_on_quadratic():
    d = jnp.array([1.0, 100.0])  # ill-conditioned

    def loss(x):
        return 0.5 * jnp.sum(d * x * x)

    tx = adahessian(lr=0.2)
    x = jnp.array([1.0, 1.0])
    state = tx.init(x)
    rng = jax.random.key(0)
    for i in range(150):
        rng, k = jax.random.split(rng)
        l, g, h = value_grad_and_diag_hessian(loss, x, k)
        updates, state = tx.update(g, state, x, hessian_diag=h)
        x = optax.apply_updates(x, updates)
    assert float(loss(x)) < 1e-2, (x, float(loss(x)))


def test_adahessian_through_trainer(tmp_path):
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 8, "n_val": 4, "n_test": 4, "bag_size": 32, "feature_size": 16, "signal": 2.0},
    )
    model = AttMIL(n_classes=2, in_features=16, out_features=8, attn_dim=4)
    tx = create_optimizer(opt="adahessian", lr=1e-2, weight_decay=0.0)
    cfg = TrainerConfig(epochs=2, log_dir=str(tmp_path), task="norm_rest")
    t = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                model_name="AttMIL", needs_hessian=True)
    history = t.fit()
    assert np.isfinite(history["loss"])
