"""SimCLR pretraining loop (VERDICT r3 item 6 — the reference's trainable
LightningModule, ``code/models/SimCLR.py:1-61``, as a functional fit loop).

Reference semantics mirrored:

* model: a feature backbone + the reference's projection MLP
  ``Linear(feat, 4*hidden) -> ReLU -> Linear(4*hidden, hidden)``
  (``SimCLR.py:11-16``; ``models/simclr.SimCLRModel`` with
  ``hidden_dim=4*h, proj_dim=h``),
* loss: InfoNCE/NT-Xent over the concatenated two-view batch with positives
  ``B`` apart (``SimCLR.py:25-46`` == ``models/simclr.nt_xent``),
* optimizer: AdamW + cosine annealing to ``lr/50`` over ``max_epochs``
  (``SimCLR.py:17-23``),
* logged ranking metrics: ``acc_top1`` / ``acc_top5`` / ``acc_mean_pos``
  (``SimCLR.py:47-55``), computed inside the jitted step.

Two augmented views come from the stain-augmentation stack
(``data/transforms.train_augment`` + ImageNet normalization) on the host,
while the previous batch trains on device (async dispatch overlap).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transmil_deepgraft_tpu.data.transforms import imagenet_normalize, train_augment
from transmil_deepgraft_tpu.models.simclr import SimCLRModel, nt_xent


def _ranking_metrics(z1: jax.Array, z2: jax.Array, temperature: float) -> dict:
    """The reference's top-1/top-5/mean-position ranking of the positive
    example among all 2B-1 candidates (``SimCLR.py:47-55``)."""
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    sim = (z @ z.T) / temperature
    self_mask = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(self_mask, -9e15, sim)
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    pos_sim = sim[jnp.arange(2 * b), pos_idx]
    # rank of the positive = number of OTHER candidates strictly above it
    others = jnp.where(self_mask, -9e15, sim).at[jnp.arange(2 * b), pos_idx].set(-9e15)
    rank = jnp.sum(others > pos_sim[:, None], axis=-1)
    return {
        "acc_top1": jnp.mean(rank == 0),
        "acc_top5": jnp.mean(rank < 5),
        "acc_mean_pos": 1.0 + jnp.mean(rank.astype(jnp.float32)),
    }


def two_view_batch(
    images: np.ndarray, idx: np.ndarray, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """uint8 images (N, H, W, 3) + batch indices -> two augmented normalized
    float32 views (B, H, W, 3) each."""
    views = []
    for _ in range(2):
        views.append(
            np.stack([imagenet_normalize(train_augment(images[i], rng)) for i in idx])
        )
    return views[0], views[1]


def fit_simclr(
    images: np.ndarray,
    *,
    backbone=None,
    hidden_dim: int = 128,
    epochs: int = 10,
    batch_size: int = 32,
    lr: float = 5e-4,
    weight_decay: float = 1e-4,
    temperature: float = 0.07,
    seed: int = 0,
    log_dir: Optional[str | Path] = None,
) -> tuple[SimCLRModel, dict, list[dict]]:
    """Pretrain on uint8 images (N, H, W, 3); returns (model, variables,
    per-epoch history). ``variables`` holds {'params', 'batch_stats'} — feed
    the backbone part to the feature extractor afterwards."""
    if backbone is None:
        from transmil_deepgraft_tpu.models.resnet import resnet18

        backbone = resnet18(num_classes=0)  # 512-d features, like the reference
    model = SimCLRModel(backbone, proj_dim=hidden_dim, hidden_dim=4 * hidden_dim)

    rng = np.random.default_rng(seed)
    n = images.shape[0]
    steps_per_epoch = max(1, n // batch_size)

    v1, v2 = two_view_batch(images, np.arange(min(batch_size, n)), rng)
    variables = model.init({"params": jax.random.key(seed)}, jnp.asarray(v1), train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # AdamW + cosine annealing to lr/50 over the full run (ref SimCLR.py:17-23)
    schedule = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch, alpha=1.0 / 50)
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, view1, view2):
        def loss_fn(p):
            z1, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, view1, train=True,
                mutable=["batch_stats"],
            )
            z2, mut = model.apply(
                {"params": p, "batch_stats": mut["batch_stats"]}, view2, train=True,
                mutable=["batch_stats"],
            )
            return nt_xent(z1, z2, temperature), (mut["batch_stats"], z1, z2)

        (loss, (new_stats, z1, z2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        metrics = _ranking_metrics(z1, z2, temperature)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss, metrics

    history: list[dict] = []
    logger = None
    if log_dir is not None:
        from transmil_deepgraft_tpu.utils.logging import MetricLogger

        logger = MetricLogger(log_dir)
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        pending = two_view_batch(images, order[: batch_size], rng)
        for s in range(steps_per_epoch):
            view1, view2 = pending
            params, batch_stats, opt_state, loss, metrics = step(
                params, batch_stats, opt_state, jnp.asarray(view1), jnp.asarray(view2)
            )
            if s + 1 < steps_per_epoch:  # augment next batch while device runs
                idx = order[(s + 1) * batch_size : (s + 2) * batch_size]
                pending = two_view_batch(images, idx, rng)
            losses.append(loss)
            accs.append(metrics)
        row = {
            "train_loss": float(np.mean([np.asarray(l) for l in losses])),
            **{k: float(np.mean([np.asarray(m[k]) for m in accs])) for k in accs[0]},
        }
        history.append(row)
        if logger is not None:
            logger.log(epoch, row)
        if log_dir is not None:
            from transmil_deepgraft_tpu.utils.checkpoints import save_pytree

            save_pytree(
                Path(log_dir) / "simclr_last.ckpt",
                {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(batch_stats)},
            )
    return model, {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}, history


def backbone_features(model: SimCLRModel, variables: dict, images: np.ndarray,
                      batch_size: int = 64) -> np.ndarray:
    """Pretrained BACKBONE features (proj head dropped) for linear probing /
    downstream extraction."""
    fwd = jax.jit(
        lambda v, x: model.backbone.apply(v, x, train=False)
    )
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables.get("batch_stats", {}).get("backbone", {})}
    outs = []
    for s in range(0, images.shape[0], batch_size):
        batch = np.stack([imagenet_normalize(img) for img in images[s : s + batch_size]])
        outs.append(np.asarray(fwd(bb_vars, jnp.asarray(batch))))
    return np.concatenate(outs)
