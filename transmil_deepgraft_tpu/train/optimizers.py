"""Optimizer factory over optax, mirroring the reference's name-keyed surface.

Ref ``code/MyOptimizer/optim_factory.py:25-123``: optimizers resolved by
``cfg.Optimizer.opt`` (``sgd/momentum/adam/adamw/nadam/radam/adamp/sgdp/adadelta/
adafactor/rmsprop/rmsproptf/novograd/...``) with a ``lookahead_`` prefix wrapping
any of them (the default config is ``lookahead_radam``), and weight decay skipped
for 1-d params and biases (``add_weight_decay``).

TPU-native notes: everything is an ``optax.GradientTransformation``; the apex
``fused*`` names map to their plain counterparts (XLA fuses optimizer updates
into single kernels on its own). Lookahead is implemented as a transformation
holding the slow weights in its *state* (unlike ``optax.lookahead`` which splits
the param pytree), so it composes transparently with any train-state container.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params: Any) -> Any:
    """True for params that should receive weight decay: ndim > 1 (ref
    ``optim_factory.py:25-37``: skip 1-d tensors and biases)."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


def _resolve_mask(mask: Any, params: Any) -> Any:
    """Mask as a bool pytree: accepts a pytree, a callable (params -> pytree —
    optax's lazy-mask convention, used when the factory is built before the
    model is initialized), or None (decay everything)."""
    if mask is None:
        return jax.tree.map(lambda _: True, params)
    return mask(params) if callable(mask) else mask


def _invert_mask(mask: Any) -> Any:
    if callable(mask):
        return lambda tree: jax.tree.map(lambda b: not b, mask(tree))
    return jax.tree.map(lambda b: not b, mask)


def mutable_lr_scale() -> optax.GradientTransformation:
    """Final update scaling whose state the trainer mutates on val-loss plateau
    (the optax-side of torch ReduceLROnPlateau, ref ``model_interface.py:873``).

    Placement matters for lookahead: the reference's scheduler scales the
    INNER optimizer's lr (timm ``Lookahead`` exposes the inner param_groups),
    so ``create_optimizer`` chains this INSIDE ``lookahead_wrap`` — scaling the
    post-sync interpolation jump instead would both deviate from the reference
    and break the "fast params land exactly at slow + alpha*(fast-slow)"
    invariant whenever lr_scale != 1 (tests/test_composed_fit_parity.py)."""

    def init(params):
        del params
        return {"lr_scale": jnp.ones([], jnp.float32)}

    def update(updates, state, params=None):
        del params
        scale = state["lr_scale"]
        return jax.tree.map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    inner_state: optax.OptState
    slow_params: Any
    step: jax.Array


def lookahead_wrap(
    inner: optax.GradientTransformation, sync_period: int = 6, slow_step_size: float = 0.5
) -> optax.GradientTransformation:
    """Lookahead (Zhang 2019) with slow weights carried in optimizer state.

    Defaults k=6, alpha=0.5 match the reference's vendored timm Lookahead
    (``MyOptimizer/lookahead.py:12``). Every ``sync_period`` steps the update is
    adjusted so the post-update fast params land at
    ``slow + alpha * (fast - slow)``, and the slow weights sync there.
    """

    def init(params: Any) -> LookaheadState:
        return LookaheadState(
            inner_state=inner.init(params),
            slow_params=jax.tree.map(jnp.copy, params),
            step=jnp.zeros([], jnp.int32),
        )

    def update(updates: Any, state: LookaheadState, params: Any = None) -> tuple[Any, LookaheadState]:
        inner_updates, inner_state = inner.update(updates, state.inner_state, params)
        step = state.step + 1
        sync = (step % sync_period) == 0

        def synced(fast_after: jax.Array, slow: jax.Array) -> jax.Array:
            return slow + slow_step_size * (fast_after - slow)

        fast_after = jax.tree.map(lambda p, u: p + u, params, inner_updates)
        new_fast = jax.tree.map(
            lambda fa, slow: jnp.where(sync, synced(fa, slow), fa),
            fast_after,
            state.slow_params,
        )
        new_slow = jax.tree.map(
            lambda slow, nf: jnp.where(sync, nf, slow), state.slow_params, new_fast
        )
        final_updates = jax.tree.map(lambda nf, p: nf - p, new_fast, params)
        return final_updates, LookaheadState(inner_state, new_slow, step)

    return optax.GradientTransformation(init, update)


def rmsprop_tf(
    lr: float, alpha: float = 0.9, momentum: float = 0.9, eps: float = 1e-10,
    weight_decay: float = 0.0, mask: Any = None,
) -> optax.GradientTransformation:
    """TF1-style RMSprop (eps inside sqrt, ones-init RMS) like the reference's
    vendored ``rmsprop_tf.py``. ``mask`` selects the decayed leaves (the
    factory's add_weight_decay ndim>1 split)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
        optax.scale_by_rms(decay=alpha, eps=eps, initial_scale=1.0, eps_in_sqrt=True),
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale(-lr),
    )


def adafactor_ref(
    lr: Optional[float] = None,
    eps: float = 1e-30,
    eps_scale: float = 1e-3,
    clip_threshold: float = 1.0,
    decay_rate: float = -0.8,
    beta1: Optional[float] = None,
    weight_decay: float = 0.0,
    scale_parameter: bool = True,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Adafactor with the reference's vendored fairseq semantics
    (``MyOptimizer/adafactor.py``), which differ from ``optax.adafactor``:

    - ANY ndim>=2 param is factored (optax only factors dims >= 128);
    - with an explicit ``lr`` (the factory always passes one) the step is the
      plain lr — NO multiply-by-parameter-scale (optax applies it regardless);
    - ``lr=None`` selects the relative-step schedule
      ``min(1e-2, 1/sqrt(t)) * max(eps_scale, RMS(p))``;
    - decoupled weight decay ``p -= wd * lr_t * p`` (optax's
      ``weight_decay_rate`` is unscaled by lr);
    - beta2 schedule ``1 - t**decay_rate`` with eps added to g**2 BEFORE the
      factored means.

    ``mask``: pytree of bools selecting which leaves receive weight decay
    (the reference's add_weight_decay ndim>1 split).
    """

    def _factored(p) -> bool:
        return jnp.ndim(p) >= 2

    def _rms(t):
        return jnp.linalg.norm(t.ravel()) / math.sqrt(t.size)

    def init(params):
        row = jax.tree.map(
            lambda p: jnp.zeros(p.shape[:-1], jnp.float32) if _factored(p) else jnp.zeros([], jnp.float32),
            params,
        )
        col = jax.tree.map(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            if _factored(p)
            else jnp.zeros([], jnp.float32),
            params,
        )
        v = jax.tree.map(
            lambda p: jnp.zeros([], jnp.float32) if _factored(p) else jnp.zeros_like(p, jnp.float32),
            params,
        )
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, jnp.float32) if beta1 is not None else jnp.zeros([], jnp.float32),
            params,
        )
        return (jnp.zeros([], jnp.int32), row, col, v, mu)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adafactor_ref requires params")
        count, rows, cols, vs, mus = state
        count = count + 1
        step = count.astype(jnp.float32)
        beta2t = 1.0 - step**decay_rate
        mask_tree = _resolve_mask(mask, params)

        def leaf(g, p, row, col, v, m, decayed):
            g = g.astype(jnp.float32)
            if lr is None:
                lr_t = jnp.minimum(1e-2, 1.0 / jnp.sqrt(step))
                if scale_parameter:
                    lr_t = lr_t * jnp.maximum(eps_scale, _rms(p.astype(jnp.float32)))
            else:
                lr_t = lr
            u = g * g + eps
            if _factored(p):
                row = beta2t * row + (1.0 - beta2t) * u.mean(axis=-1)
                col = beta2t * col + (1.0 - beta2t) * u.mean(axis=-2)
                r_factor = jax.lax.rsqrt(row / row.mean(axis=-1, keepdims=True))[..., None]
                c_factor = jax.lax.rsqrt(col)[..., None, :]
                u = r_factor * c_factor * g
            else:
                v = beta2t * v + (1.0 - beta2t) * u
                u = jax.lax.rsqrt(v) * g
            u = u / jnp.maximum(1.0, _rms(u) / clip_threshold)
            u = u * lr_t
            if beta1 is not None:
                m = beta1 * m + (1.0 - beta1) * u
                u = m
            if weight_decay and decayed:
                u = u + weight_decay * lr_t * p
            return (-u).astype(p.dtype), row, col, v, m

        out = jax.tree.map(leaf, grads, params, rows, cols, vs, mus, mask_tree)
        is_tup = lambda x: isinstance(x, tuple) and len(x) == 5 and not isinstance(x[0], tuple)
        pick = lambda i: jax.tree.map(lambda t: t[i], out, is_leaf=is_tup)
        return pick(0), (count, pick(1), pick(2), pick(3), pick(4))

    return optax.GradientTransformation(init, update)


class AdamPState(NamedTuple):
    mu: Any
    nu: Any
    count: jax.Array


def _adamp_projection(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """The AdamP/SGDP radial projection (Heo 2021, arXiv:2006.08217), with the
    official algorithm's exact two-stage view logic: try the CHANNEL view
    (rows = output channels) first, then the LAYER view (whole tensor), each
    gated on max |cos(grad, p)| < delta / sqrt(view_width); whichever fires
    first projects the perturbation off p's radial direction and scales weight
    decay by ``wd_ratio``. jit-safe: both candidate projections are computed
    and selected with ``where`` (shapes are static)."""
    expand = (-1,) + (1,) * (p.ndim - 1)

    def for_view(channel: bool):
        view = (lambda x: x.reshape(x.shape[0], -1)) if channel else (
            lambda x: x.reshape(1, -1)
        )
        gv, pv = view(grad), view(p)
        cos = jnp.abs(jnp.sum(gv * pv, axis=1)) / (
            (jnp.linalg.norm(gv, axis=1) + eps) * (jnp.linalg.norm(pv, axis=1) + eps)
        )
        fires = jnp.max(cos) < delta / math.sqrt(pv.shape[1])
        p_n = p / (jnp.linalg.norm(pv, axis=1).reshape(expand if channel else (1,) * p.ndim) + eps)
        projected = perturb - p_n * view(p_n * perturb).sum(axis=1).reshape(
            expand if channel else (1,) * p.ndim
        )
        return fires, projected

    fires_c, proj_c = for_view(True)
    fires_l, proj_l = for_view(False)
    out = jnp.where(fires_c, proj_c, jnp.where(fires_l, proj_l, perturb))
    ratio = jnp.where(fires_c | fires_l, wd_ratio, 1.0)
    return out, ratio


def adamp(
    lr: float,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.01,
    nesterov: bool = True,
    mask: Any = None,
) -> optax.GradientTransformation:
    """AdamP (Heo 2021): Adam with updates projected off the radial direction
    for >1-d params, exactly as the reference configures it
    (``MyOptimizer/optim_factory.py:81``: wd_ratio=0.01, nesterov=True;
    ``MyOptimizer/adamp.py`` semantics: denom = sqrt(v)/sqrt(bc2) + eps,
    step = lr/bc1 * perturb, multiplicative weight decay scaled by the
    projection's wd_ratio). ``mask`` selects decayed leaves (the reference
    factory's add_weight_decay groups give 1-d params wd=0). Lockstep-tested
    vs a torch oracle."""
    b1, b2 = betas

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamPState(mu=zeros(), nu=zeros(), count=jnp.zeros([], jnp.int32))

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        mask_tree = _resolve_mask(mask, params)

        def apply_one(p, m, v, g, decayed):
            denom = jnp.sqrt(v / bc2) + eps
            perturb = ((b1 * m + (1 - b1) * g) if nesterov else m) / denom
            ratio = 1.0
            if p.ndim > 1:
                perturb, ratio = _adamp_projection(p, g, perturb, delta, wd_ratio, eps)
            new = -(lr / bc1) * perturb
            if weight_decay and decayed:
                # official: p *= (1 - lr*wd*ratio) BEFORE the step — additively
                # exact since the perturbation is computed from the undecayed p
                new = new - lr * weight_decay * ratio * p
            return new

        updates = jax.tree.map(apply_one, params, mu, nu, grads, mask_tree)
        return updates, AdamPState(mu, nu, count)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    momentum: Any


def sgdp(
    lr: float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = True,
    eps: float = 1e-8,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    dampening: float = 0.0,
    mask: Any = None,
) -> optax.GradientTransformation:
    """SGDP (Heo 2021): momentum SGD with the radial projection, the FULL
    official algorithm (``MyOptimizer/sgdp.py``; was an approximation before
    round 4): buf = mom*buf + (1-damp)*g; d_p = g + mom*buf (nesterov);
    projection for >1-d params; weight decay multiplies p by
    ``1 - lr*wd*wd_ratio/(1-momentum)`` before the step. Lockstep-tested."""

    def init(params):
        return SGDPState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        bufs = jax.tree.map(
            lambda b, g: momentum * b + (1.0 - dampening) * g, state.momentum, grads
        )
        mask_tree = _resolve_mask(mask, params)

        def apply_one(p, buf, g, decayed):
            d_p = (g + momentum * buf) if nesterov else buf
            ratio = 1.0
            if p.ndim > 1:
                d_p, ratio = _adamp_projection(p, g, d_p, delta, wd_ratio, eps)
            new = -lr * d_p
            if weight_decay and decayed:
                new = new - (lr * weight_decay * ratio / (1.0 - momentum)) * p
            return new

        updates = jax.tree.map(apply_one, params, bufs, grads, mask_tree)
        return updates, SGDPState(momentum=bufs)

    return optax.GradientTransformation(init, update)


class NadamRefState(NamedTuple):
    mu: Any
    nu: Any
    m_schedule: jax.Array
    count: jax.Array


def nadam_ref(
    lr: float,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    schedule_decay: float = 4e-3,
) -> optax.GradientTransformation:
    """Nadam with the reference's vendored semantics (``MyOptimizer/nadam.py``,
    the pytorch/pytorch#1408 implementation of Dozat 2016): warming momentum
    schedule ``mu_t = b1*(1 - 0.5*0.96^(t*sd))`` with running product
    ``m_schedule``, grad and momentum terms separately de-biased by
    ``1-m_schedule`` products. optax.nadam implements the simplified
    scheduleless variant — this one is what reference configs train with."""
    b1, b2 = betas

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return NadamRefState(
            mu=zeros(), nu=zeros(),
            m_schedule=jnp.ones([], jnp.float32),
            count=jnp.zeros([], jnp.int32),
        )

    def update(grads, state, params=None):
        del params
        t = (state.count + 1).astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * schedule_decay))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * schedule_decay))
        m_schedule_new = state.m_schedule * mu_t
        m_schedule_next = m_schedule_new * mu_t1

        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc2 = 1 - b2 ** t

        def upd(g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            return (
                -lr * (1.0 - mu_t) / (1.0 - m_schedule_new) * g / denom
                - lr * mu_t1 / (1.0 - m_schedule_next) * m / denom
            )

        updates = jax.tree.map(upd, grads, mu, nu)
        return updates, NadamRefState(mu, nu, m_schedule_new, state.count + 1)

    return optax.GradientTransformation(init, update)


def create_optimizer(
    opt: str = "lookahead_radam",
    lr: float = 2e-4,
    weight_decay: float = 0.01,
    momentum: float | None = 0.9,
    opt_eps: float | None = None,
    opt_betas: tuple[float, float] | None = None,
    params: Any = None,
    grad_accum_steps: int = 1,
    **_: Any,
) -> optax.GradientTransformation:
    """Build an optax optimizer from config fields (``cfg.Optimizer``).

    ``lookahead_`` prefix wraps the base optimizer; weight decay is ALWAYS
    masked to >1-d params (ref ``add_weight_decay``, applied for every
    optimizer name when wd != 0): eagerly when ``params`` is provided, else
    lazily via optax's callable-mask convention (resolved against the real
    params at the first update). ``grad_accum_steps > 1`` wraps the result in
    ``optax.MultiSteps`` (the reference's Lightning ``accumulate_grad_batches``).
    """
    opt_lower = opt.lower()
    parts = opt_lower.split("_")
    use_lookahead = len(parts) > 1 and parts[0] == "lookahead"
    name = parts[-1]
    name = name.removeprefix("fused")  # apex fused* -> plain (XLA fuses on its own)
    if name == "":
        name = parts[-1]

    eps = opt_eps if opt_eps is not None else 1e-8
    betas = tuple(opt_betas) if opt_betas else (0.9, 0.999)
    mom = momentum if momentum is not None else 0.9
    mask = weight_decay_mask(params) if params is not None else weight_decay_mask

    def wd_kwargs():
        return {"weight_decay": weight_decay, "mask": mask} if weight_decay else {"weight_decay": 0.0}

    if name in ("sgd", "nesterov"):
        tx = optax.sgd(lr, momentum=mom, nesterov=True)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    elif name == "momentum":
        tx = optax.sgd(lr, momentum=mom, nesterov=False)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    elif name == "adam":
        # torch.optim.Adam applies L2 (coupled) weight decay; adamw-style mask not used.
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
            optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    elif name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, **wd_kwargs())
    elif name == "nadam":
        # reference-vendored Nadam (warming momentum schedule), not optax.nadam
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
            nadam_ref(lr, betas=betas, eps=eps),
        )
    elif name == "radam":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
            optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    elif name == "adamp":
        tx = adamp(lr, betas=betas, eps=eps, weight_decay=weight_decay, mask=mask)
    elif name == "sgdp":
        tx = sgdp(lr, momentum=mom, weight_decay=weight_decay, eps=eps, mask=mask)
    elif name == "adadelta":
        # torch.optim.Adadelta defaults: rho=0.9, eps=1e-6 (NOT the adam 1e-8);
        # coupled L2 weight decay masked like the reference's param groups
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
            optax.adadelta(lr, rho=0.9, eps=opt_eps if opt_eps is not None else 1e-6),
        )
    elif name == "adafactor":
        # reference (fairseq-vendored) semantics, NOT optax.adafactor: explicit
        # lr disables the parameter-scale multiply, every ndim>=2 leaf is
        # factored, decoupled wd scaled by lr_t (see adafactor_ref docstring)
        tx = adafactor_ref(
            lr if lr else None,
            eps=opt_eps if opt_eps is not None else 1e-30,
            beta1=opt_betas[0] if opt_betas else None,
            weight_decay=weight_decay,
            mask=mask,
        )
    elif name == "adahessian":
        from transmil_deepgraft_tpu.train.adahessian import adahessian

        tx = adahessian(lr, betas=betas, eps=eps, weight_decay=weight_decay, mask=mask)
    elif name == "rmsprop":
        # torch.optim.RMSprop semantics: eps OUTSIDE the sqrt (optax's default
        # rmsprop uses sqrt(nu+eps)), zeros-init RMS, raw momentum buffer
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask) if weight_decay else optax.identity(),
            optax.scale_by_rms(decay=0.9, eps=eps, initial_scale=0.0, eps_in_sqrt=False),
            optax.trace(decay=mom) if mom else optax.identity(),
            optax.scale(-lr),
        )
    elif name == "rmsproptf":
        tx = rmsprop_tf(lr, alpha=0.9, momentum=mom, eps=eps, weight_decay=weight_decay, mask=mask)
    elif name in ("novograd", "nvnovograd"):
        # optax.novograd == the reference's NvNovoGrad update (per-tensor nu,
        # first-step nu init to ||g||^2); 'novograd' (timm's experimental
        # double-normalizing variant) maps here too — deviation pinned in
        # PARITY.md. Reference default betas for these names are (0.95, 0.98).
        # wd lives inside the novograd update (added post-normalization), so
        # the add_weight_decay 1-d exemption is expressed as two disjoint
        # masked instances (decayed / undecayed leaves — states are per-leaf).
        nb = tuple(opt_betas) if opt_betas else (0.95, 0.98)
        if weight_decay:
            tx = optax.chain(
                optax.masked(
                    optax.novograd(lr, b1=nb[0], b2=nb[1], eps=eps, weight_decay=weight_decay),
                    mask,
                ),
                optax.masked(
                    optax.novograd(lr, b1=nb[0], b2=nb[1], eps=eps, weight_decay=0.0),
                    _invert_mask(mask),
                ),
            )
        else:
            tx = optax.novograd(lr, b1=nb[0], b2=nb[1], eps=eps, weight_decay=0.0)
    elif name == "lamb":
        tx = optax.lamb(lr, b1=betas[0], b2=betas[1], eps=eps, **wd_kwargs())
    else:
        raise KeyError(f"unknown optimizer '{opt}'")

    if use_lookahead:
        # the trainer's plateau lr_scale must scale the INNER optimizer's
        # update, not the lookahead sync jump (see mutable_lr_scale docstring);
        # the Trainer detects the embedded scale and skips adding its own
        tx = lookahead_wrap(optax.chain(tx, mutable_lr_scale()))
    if grad_accum_steps and grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def create_dtfd_optimizer(
    steps_per_epoch: int,
    lr: float = 1e-4,
    weight_decay: float = 1e-2,
    milestone_epochs: tuple[int, ...] = (100,),
    gamma: float = 0.2,
) -> optax.GradientTransformation:
    """DTFD's two-optimizer setup (ref ``model_interface_dtfd.py:594-607``):
    Adam(1e-4, wd 1e-2) separately over tier-1 (dimreduction/attention/classifier)
    and tier-2 (attCls) parameter groups, each with MultiStepLR(milestones=[100],
    gamma=0.2). Expressed as optax.multi_transform over the param partition; the
    step schedule converts epochs -> steps via ``steps_per_epoch``."""
    boundaries = {int(e * steps_per_epoch): gamma for e in milestone_epochs}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)

    def make_adam():
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_schedule(schedule),
            optax.scale(-1.0),
        )

    def label_fn(params):
        return jax.tree.map_with_path(
            lambda path, _: "tier2" if (path and getattr(path[0], "key", None) == "attCls") else "tier1",
            params,
        )

    return optax.multi_transform({"tier1": make_adam(), "tier2": make_adam()}, label_fn)


def create_optimizer_from_config(optimizer_cfg: Any, params: Any = None, grad_accum_steps: int = 1) -> optax.GradientTransformation:
    """Build from a ``cfg.Optimizer`` section (opt/lr/opt_eps/opt_betas/momentum/weight_decay)."""
    opt_name = optimizer_cfg.opt or "lookahead_radam"
    # reference: a falsy lr selects Adafactor's relative-step schedule
    # (optim_factory.py:86-88); every other name needs a real lr (default 2e-4)
    if str(opt_name).lower().endswith("adafactor") and not optimizer_cfg.lr:
        lr = 0.0
    else:
        lr = float(optimizer_cfg.lr or 2e-4)
    return create_optimizer(
        opt=opt_name,
        lr=lr,
        weight_decay=float(optimizer_cfg.weight_decay or 0.0),
        momentum=optimizer_cfg.momentum if optimizer_cfg.momentum else 0.9,
        opt_eps=optimizer_cfg.opt_eps if optimizer_cfg.opt_eps else None,
        opt_betas=optimizer_cfg.opt_betas if optimizer_cfg.opt_betas else None,
        params=params,
        grad_accum_steps=grad_accum_steps,
    )
