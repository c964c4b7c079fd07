"""Loss factory: name-keyed losses over logits, mirroring the reference surface.

Ref ``code/MyLoss/loss_factory.py:21-62``: any ``torch.nn`` loss by name (default
``CrossEntropyLoss``), plus focal / poly / dice / jaccard variants. The reference
trains with *soft* targets - ``loss(logits, one_hot(label).float())`` - which for
torch CE means ``-sum(target * log_softmax(logits))`` averaged over the batch;
:func:`cross_entropy` reproduces exactly that. All losses are pure jittable
functions ``(logits, targets_onehot) -> scalar``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

LossFn = Callable[[jax.Array, jax.Array], jax.Array]


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Soft-target CE: mean over batch of -sum(p * log_softmax(logits))."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def label_smoothing_cross_entropy(smoothing: float = 0.2) -> LossFn:
    """Uniform label smoothing CE (ref LabelSmoothingCrossEntropy(smoothing=0.2),
    ``model_interface.py:152``)."""

    def loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
        n = logits.shape[-1]
        smoothed = targets * (1.0 - smoothing) + smoothing / n
        return cross_entropy(logits, smoothed)

    return loss


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_loss(gamma: float = 2.0, alpha: float = 0.25) -> LossFn:
    """Multiclass focal loss over softmax probabilities (ref ``MyLoss/focal_loss_ori.py``)."""

    def loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        per_class = -targets * ((1.0 - p) ** gamma) * logp
        return jnp.mean(alpha * jnp.sum(per_class, axis=-1))

    return loss


def poly_loss(epsilon: float = 1.0) -> LossFn:
    """PolyLoss (Leng 2022): CE + eps * (1 - p_t) (ref ``MyLoss/poly_loss.py``)."""

    def loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(targets * logp, axis=-1)
        pt = jnp.sum(targets * jnp.exp(logp), axis=-1)
        return jnp.mean(ce + epsilon * (1.0 - pt))

    return loss


def dice_loss(logits: jax.Array, targets: jax.Array, eps: float = 1e-6) -> jax.Array:
    p = jax.nn.softmax(logits, axis=-1)
    inter = jnp.sum(p * targets)
    return 1.0 - (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(targets) + eps)


def jaccard_loss(logits: jax.Array, targets: jax.Array, eps: float = 1e-6) -> jax.Array:
    p = jax.nn.softmax(logits, axis=-1)
    inter = jnp.sum(p * targets)
    union = jnp.sum(p) + jnp.sum(targets) - inter
    return 1.0 - (inter + eps) / (union + eps)


def lovasz_softmax(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Lovasz-softmax (Berman 2018), flat multi-class variant - the reference
    factory registers 'lovasz' from its segmentation zoo
    (``MyLoss/loss_factory.py:21-62``, ``lovasz.py``). Per class c: errors
    ``|1{y=c} - p_c|`` sorted descending, weighted by the Lovasz extension
    gradient of the IoU, averaged over present classes. Static shapes (sort,
    cumsum) keep it XLA-friendly."""
    p = jax.nn.softmax(logits, axis=-1).reshape(-1, logits.shape[-1])
    fg = targets.reshape(-1, logits.shape[-1]).astype(jnp.float32)  # one-hot
    n, c = p.shape

    def class_loss(errors: jax.Array, fg_c: jax.Array) -> jax.Array:
        order = jnp.argsort(-errors)
        err_sorted = errors[order]
        fg_sorted = fg_c[order]
        gts = jnp.sum(fg_c)
        inter = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum(1.0 - fg_sorted)
        jaccard = 1.0 - inter / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        return jnp.dot(err_sorted, grad)

    losses = jax.vmap(class_loss, in_axes=(1, 1))(jnp.abs(fg - p), fg)  # (C,)
    present = (jnp.sum(fg, axis=0) > 0).astype(jnp.float32)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


_LOSSES: dict[str, Callable[..., LossFn] | LossFn] = {
    "CrossEntropyLoss": cross_entropy,
    "BCEWithLogitsLoss": bce_with_logits,
    "LabelSmoothingCrossEntropy": label_smoothing_cross_entropy,
    "focal": focal_loss,
    "polyloss": poly_loss,
    "dice": dice_loss,
    "jaccard": jaccard_loss,
    "lovasz": lovasz_softmax,
}


def create_loss(base_loss: str = "CrossEntropyLoss", n_classes: int | None = None, **kwargs) -> LossFn:
    """Resolve a loss by config name (``cfg.Loss.base_loss``)."""
    if base_loss not in _LOSSES:
        raise KeyError(f"unknown loss '{base_loss}'; available: {sorted(_LOSSES)}")
    fn = _LOSSES[base_loss]
    if base_loss in ("LabelSmoothingCrossEntropy", "focal", "polyloss"):
        return fn(**kwargs)  # factory-style
    return fn
