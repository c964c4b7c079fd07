"""AdaHessian: Adam-like optimizer preconditioned by a Hutchinson diagonal
Hessian estimate (ref vendored ``MyOptimizer/adahessian.py``, 156 LoC torch).

JAX makes the second-order piece cheap to express: the diagonal estimate is
``E_z[z * (H z)]`` with Rademacher z, and ``H z`` is one ``jax.jvp`` through
``jax.grad`` (forward-over-reverse). The transformation is an
``optax.GradientTransformationExtraArgs`` consuming ``hessian_diag`` from the
train step; :func:`value_grad_and_diag_hessian` computes everything in one pass.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def hutchinson_diag_hessian(loss_fn: Callable, params: Any, rng: jax.Array) -> Any:
    """Single-probe Hutchinson estimate of diag(H) at ``params``."""
    leaves, treedef = jax.tree.flatten(params)
    keys = list(jax.random.split(rng, len(leaves)))
    zs = jax.tree.unflatten(
        treedef,
        [
            jax.random.rademacher(k, l.shape, dtype=l.dtype if jnp.issubdtype(l.dtype, jnp.floating) else jnp.float32)
            for k, l in zip(keys, leaves)
        ],
    )
    _, hvp = jax.jvp(jax.grad(loss_fn), (params,), (zs,))
    return jax.tree.map(lambda h, z: h * z, hvp, zs)


def value_grad_and_diag_hessian(loss_fn: Callable, params: Any, rng: jax.Array):
    """(loss, grads, diag_hessian) in one combined computation."""
    loss, grads = jax.value_and_grad(loss_fn)(params)
    diag = hutchinson_diag_hessian(loss_fn, params, rng)
    return loss, grads, diag


class AdaHessianState(NamedTuple):
    mu: Any
    nu: Any
    count: jax.Array


def adahessian(
    lr: float = 1e-1,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    hessian_power: float = 1.0,
    mask: Any = None,
) -> optax.GradientTransformationExtraArgs:
    """AdaHessian update; ``update`` requires ``hessian_diag=`` extra arg.

    ``mask``: pytree of bools selecting which leaves receive the (decoupled,
    AdamW-placement) weight decay — the reference factory's ``add_weight_decay``
    ndim>1 grouping exempts biases/1-d params for adahessian like every name.
    """
    b1, b2 = betas

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdaHessianState(mu=zeros(), nu=zeros(), count=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None, *, hessian_diag=None, **extra):
        del extra
        if hessian_diag is None:
            raise ValueError("adahessian.update needs hessian_diag= (use value_grad_and_diag_hessian)")
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, d: b2 * v + (1 - b2) * d * d, state.nu, hessian_diag)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def step(m, v, p, decayed):
            denom = (jnp.sqrt(v / bc2) ** hessian_power) + eps
            upd = -lr * (m / bc1) / denom
            if weight_decay and p is not None and decayed:
                upd = upd - lr * weight_decay * p
            return upd

        tgt = params if params is not None else mu
        if mask is None:
            mask_tree = jax.tree.map(lambda _: True, tgt)
        else:
            mask_tree = mask(tgt) if callable(mask) else mask
        updates = jax.tree.map(step, mu, nu, tgt, mask_tree)
        return updates, AdaHessianState(mu, nu, count)

    return optax.GradientTransformationExtraArgs(init, update)
