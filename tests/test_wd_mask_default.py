"""Weight-decay masking must be ON for every factory name even when the
optimizer is built BEFORE the params exist (the CLI path:
``cli/train.py`` calls ``create_optimizer_from_config(cfg.Optimizer,
grad_accum_steps=...)`` with no params).

The reference factory (``/root/reference/code/MyOptimizer/optim_factory.py:40-48``)
applies ``add_weight_decay`` param groups — 1-d params and biases get
``weight_decay=0`` — for EVERY optimizer name whenever wd != 0. A round-4
review found the jax factory only masked when ``params`` was passed eagerly
(lockstep tests did; the production CLI did not), silently decaying
LayerNorm scales and biases in real runs. The factory now defaults to optax's
lazy callable-mask convention, and the custom transforms (adamp/sgdp/
rmsproptf/novograd/adafactor_ref/adahessian) resolve it at update time.

Probe: one update step with ZERO grads. Any movement of a leaf can then only
come from weight decay, so 1-d leaves must not move at all while at least one
>1-d leaf must (wd pulls it toward zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from transmil_deepgraft_tpu.train.adahessian import adahessian
from transmil_deepgraft_tpu.train.optimizers import create_optimizer

PARAMS = {
    "w": jnp.ones((4, 3)),
    "b": jnp.full((3,), 0.5),
    "ln_scale": jnp.ones((5,)),
}
ZERO_GRADS = jax.tree.map(jnp.zeros_like, PARAMS)

# the full reference-selectable surface (optim_factory.py:65-117 minus the
# apex fused* aliases, which map onto these) + the lookahead_ prefix
NAMES = [
    "sgd", "momentum", "adam", "adamw", "nadam", "radam", "adamp", "sgdp",
    "adadelta", "adafactor", "rmsprop", "rmsproptf", "novograd", "nvnovograd",
    "lamb", "lookahead_radam", "lookahead_adamp",
]


def _assert_masked(upd):
    assert float(jnp.abs(upd["b"]).max()) == 0.0, "bias was weight-decayed"
    assert float(jnp.abs(upd["ln_scale"]).max()) == 0.0, "1-d scale was weight-decayed"
    assert float(jnp.abs(upd["w"]).max()) > 0.0, "wd should move the 2-d weight"


@pytest.mark.parametrize("name", NAMES)
def test_lazy_mask_without_params(name):
    """The CLI path: factory built with params=None."""
    tx = create_optimizer(opt=name, lr=1e-3, weight_decay=0.01)
    state = tx.init(PARAMS)
    upd, _ = tx.update(ZERO_GRADS, state, PARAMS)
    _assert_masked(upd)


@pytest.mark.parametrize("name", ["adamw", "adamp", "sgdp", "rmsproptf", "nvnovograd", "adafactor"])
def test_eager_mask_with_params(name):
    """The lockstep-test path: params passed eagerly still masks."""
    tx = create_optimizer(opt=name, lr=1e-3, weight_decay=0.01, params=PARAMS)
    state = tx.init(PARAMS)
    upd, _ = tx.update(ZERO_GRADS, state, PARAMS)
    _assert_masked(upd)


def test_adahessian_lazy_mask():
    """adahessian consumes hessian_diag as an extra arg; its decoupled wd must
    honor the lazy mask too (create_optimizer wires mask through)."""
    tx = create_optimizer(opt="adahessian", lr=1e-3, weight_decay=0.01)
    state = tx.init(PARAMS)
    ones_diag = jax.tree.map(jnp.ones_like, PARAMS)
    upd, _ = tx.update(ZERO_GRADS, state, PARAMS, hessian_diag=ones_diag)
    _assert_masked(upd)


def test_direct_adahessian_callable_mask():
    from transmil_deepgraft_tpu.train.optimizers import weight_decay_mask

    tx = adahessian(lr=1e-3, weight_decay=0.01, mask=weight_decay_mask)
    state = tx.init(PARAMS)
    ones_diag = jax.tree.map(jnp.ones_like, PARAMS)
    upd, _ = tx.update(ZERO_GRADS, state, PARAMS, hessian_diag=ones_diag)
    _assert_masked(upd)
