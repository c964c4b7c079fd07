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


def dice_log_loss(logits: jax.Array, targets: jax.Array, eps: float = 1e-6) -> jax.Array:
    """-log(dice score) (ref factory 'dice_log' -> BinaryDiceLogLoss)."""
    return -jnp.log(jnp.maximum(1.0 - dice_loss(logits, targets, eps), eps))


def jaccard_log_loss(logits: jax.Array, targets: jax.Array, eps: float = 1e-6) -> jax.Array:
    """-log(jaccard score) (the 'log_jaccard' half of 'bce+log_jaccard')."""
    return -jnp.log(jnp.maximum(1.0 - jaccard_loss(logits, targets, eps), eps))


def reduced_focal_loss(gamma: float = 2.0, threshold: float = 0.5) -> LossFn:
    """Reduced focal loss (Sergievskiy 2019; ref 'reduced_focal' ->
    BinaryFocalLoss(reduced=True)): no down-weighting while p_t < threshold,
    then the focal factor normalized to 1 at the threshold."""

    def loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(logits, axis=-1)
        pt = jnp.sum(targets * jnp.exp(logp), axis=-1)
        ce = -jnp.sum(targets * logp, axis=-1)
        factor = jnp.where(
            pt < threshold, 1.0, ((1.0 - pt) / (1.0 - threshold)) ** gamma
        )
        return jnp.mean(factor * ce)

    return loss


def joint_loss(first: LossFn, second: LossFn, w1: float = 1.0, w2: float = 0.5) -> LossFn:
    """Weighted sum (ref JointLoss with the factory's w1=1.0, w2=0.5)."""

    def loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
        return w1 * first(logits, targets) + w2 * second(logits, targets)

    return loss


def mse_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch.nn.MSELoss on (logits, one-hot float) as the reference factory
    resolves any nn.* name (``loss_factory.py:31-32``)."""
    return jnp.mean((logits - targets) ** 2)


def l1_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(logits - targets))


def smooth_l1_loss(logits: jax.Array, targets: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(logits - targets)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


# Segmentation-era losses that exist as modules in the reference's MyLoss/
# zoo but are NOT registered by its factory (``loss_factory.py:21-62`` would
# hit the final assert) — a config naming one fails identically in both
# frameworks, here with an actionable message.
_UNSUPPORTED: dict[str, str] = {
    name: (
        f"'{name}' is a segmentation-era loss module the reference factory "
        "never registers (MyLoss/loss_factory.py:21-62 raises on it too); "
        "use 'dice'/'jaccard'/'lovasz' or a CE variant for MIL heads"
    )
    for name in ("boundary", "hausdorff", "hd", "nd_topk", "ndtopk", "topk")
}

_LOSSES: dict[str, Callable[..., LossFn] | LossFn] = {
    "CrossEntropyLoss": cross_entropy,
    "BCEWithLogitsLoss": bce_with_logits,
    "LabelSmoothingCrossEntropy": label_smoothing_cross_entropy,
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "focal": focal_loss,
    "reduced_focal": reduced_focal_loss,
    "polyloss": poly_loss,
    "dice": dice_loss,
    "dice_log": dice_log_loss,
    "jaccard": jaccard_loss,
    # ref quirk: 'jaccard_log' maps to the PLAIN jaccard loss
    # (loss_factory.py:39-40 instantiates BinaryJaccardLoss for both)
    "jaccard_log": jaccard_loss,
    "lovasz": lovasz_softmax,
}

_FACTORY_STYLE = ("LabelSmoothingCrossEntropy", "focal", "reduced_focal", "polyloss")


def create_loss(
    base_loss: str = "CrossEntropyLoss",
    n_classes: int | None = None,
    w1: float = 1.0,
    w2: float = 0.5,
    **kwargs,
) -> LossFn:
    """Resolve a loss by config name (``cfg.Loss.base_loss``).

    Mirrors the reference factory surface (``MyLoss/loss_factory.py:21-62``):
    torch.nn names, the focal/poly/dice/jaccard/lovasz zoo, and the
    ``bce+<x>`` JointLoss combos with weights ``w1``/``w2``. Names the
    reference factory itself rejects raise with a one-line reason."""
    if base_loss in _UNSUPPORTED:
        raise NotImplementedError(_UNSUPPORTED[base_loss])
    if base_loss.startswith("bce+"):
        second_name = {
            "bce+lovasz": "lovasz",
            "bce+jaccard": "jaccard",
            "bce+log_jaccard": "_log_jaccard",
            "bce+log_dice": "dice_log",
        }.get(base_loss)
        if second_name is None:
            raise KeyError(
                f"unknown joint loss '{base_loss}'; supported: bce+lovasz, "
                "bce+jaccard, bce+log_jaccard, bce+log_dice"
            )
        second = jaccard_log_loss if second_name == "_log_jaccard" else _LOSSES[second_name]
        return joint_loss(bce_with_logits, second, w1=w1, w2=w2)
    if base_loss not in _LOSSES:
        raise KeyError(f"unknown loss '{base_loss}'; available: {sorted(_LOSSES)}")
    fn = _LOSSES[base_loss]
    if base_loss in _FACTORY_STYLE:
        return fn(**kwargs)  # factory-style
    return fn
