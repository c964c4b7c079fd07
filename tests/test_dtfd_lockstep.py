"""Lockstep parity for DTFD's two-optimizer training schedule (VERDICT r3
Missing #4: ``model_interface_dtfd.py:594-607`` had no lockstep evidence).

The reference trains DTFD with TWO torch.optim.Adam(lr=1e-4, weight_decay=1e-2)
instances — tier-1 (dimreduction/attention/classifier) and tier-2 (attCls) —
each under MultiStepLR(milestones=[100], gamma=0.2), on the averaged two-tier
loss ``(sub_loss + slide_loss)/2`` (``model_interface_dtfd.py:268,594-607``).
Ours expresses the same schedule as ``optax.multi_transform`` over the
parameter partition inside one jitted step (``train/optimizers.
create_dtfd_optimizer``).

Two rows:

1. **Lockstep**: our combined step (one grad, both tiers updated at the old
   params) vs a torch run that backprops the same averaged loss once and steps
   both Adams — mathematically the same simultaneous update. The LR milestone
   is placed INSIDE the run (epoch 2 of 3) so the MultiStepLR -> optax
   piecewise_constant_schedule epoch->step conversion is exercised, not just
   the flat-lr region.
2. **Deviation quantified (torch-vs-torch)**: Lightning's automatic
   optimization with two optimizers actually calls training_step/backward once
   PER optimizer, so tier-2 steps on a forward that already saw the tier-1
   update (Gauss–Seidel) while ours is simultaneous (Jacobi). The gap is
   measured on the same torch oracle and recorded in PARITY.md, mirroring how
   the pinv tie-break deviation was pinned.

Both sides run deterministic pseudo-bag splits (identity permutation) so the
instance grouping is identical.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.torch_ref import mil_torch  # noqa: E402
from transmil_deepgraft_tpu.models.dtfd import DTFDMIL  # noqa: E402
from transmil_deepgraft_tpu.train.optimizers import create_dtfd_optimizer  # noqa: E402
from transmil_deepgraft_tpu.utils.torch_weights import convert_dtfd_state_dict  # noqa: E402

IN_F, M_DIM, N_CLS = 64, 48, 2
N_TOK = 250  # -> g = min(8, 250//120) = 2 pseudo-bags of 120
LR, WD, GAMMA = 1e-4, 1e-2, 0.2
STEPS_PER_EPOCH, EPOCHS = 3, 3
MILESTONE_EPOCH = 2  # LR drops for epoch 2 (steps 6..8) — inside the run
STEPS = STEPS_PER_EPOCH * EPOCHS


def _batches(steps: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal((N_TOK, IN_F)).astype(np.float32) * 0.5,
         int(rng.integers(N_CLS)))
        for _ in range(steps)
    ]


def _torch_model():
    torch.manual_seed(0)
    return mil_torch.DTFDMIL(n_classes=N_CLS, in_features=IN_F, m_dim=M_DIM).eval()


def _torch_setup(model):
    tier1 = (
        list(model.dimreduction.parameters())
        + list(model.attention.parameters())
        + list(model.classifier.parameters())
    )
    tier2 = list(model.attCls.parameters())
    opt0 = torch.optim.Adam(tier1, lr=LR, weight_decay=WD)
    opt1 = torch.optim.Adam(tier2, lr=LR, weight_decay=WD)
    sch0 = torch.optim.lr_scheduler.MultiStepLR(opt0, [MILESTONE_EPOCH], gamma=GAMMA)
    sch1 = torch.optim.lr_scheduler.MultiStepLR(opt1, [MILESTONE_EPOCH], gamma=GAMMA)
    return (opt0, opt1), (sch0, sch1)


def _torch_loss(model, x, y):
    sub, slide = model(torch.from_numpy(x), deterministic=True)
    one_hot = F.one_hot(torch.tensor([y]), N_CLS).float()
    sub_labels = one_hot.expand(sub.shape[0], -1)
    return (F.cross_entropy(sub, sub_labels) + F.cross_entropy(slide, one_hot)) / 2


def _torch_run(batches, sequential: bool):
    """sequential=False: one backward, both optimizers step (simultaneous).
    sequential=True: Lightning two-optimizer semantics — a fresh
    forward/backward per optimizer, tier-2 sees the tier-1 update."""
    model = _torch_model()
    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    opts, schs = _torch_setup(model)
    losses = []
    for i, (x, y) in enumerate(batches):
        if sequential:
            for o in opts:
                loss = _torch_loss(model, x, y)
                o.zero_grad()
                # grads land on both tiers; each optimizer only steps its own
                for other in opts:
                    other.zero_grad()
                loss.backward()
                o.step()
            losses.append(loss.item())
        else:
            loss = _torch_loss(model, x, y)
            for o in opts:
                o.zero_grad()
            loss.backward()
            for o in opts:
                o.step()
            losses.append(loss.item())
        if (i + 1) % STEPS_PER_EPOCH == 0:
            for s in schs:
                s.step()
    return sd0, np.asarray(losses)


def _jax_run(sd0, batches):
    variables = convert_dtfd_state_dict(sd0)
    model = DTFDMIL(n_classes=N_CLS, in_features=IN_F, m_dim=M_DIM)
    params = jax.tree.map(jnp.asarray, variables["params"])
    tx = create_dtfd_optimizer(
        steps_per_epoch=STEPS_PER_EPOCH,
        lr=LR,
        weight_decay=WD,
        milestone_epochs=(MILESTONE_EPOCH,),
        gamma=GAMMA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            sub, slide = model.apply({"params": p}, x, deterministic=True)
            one_hot = jax.nn.one_hot(y, N_CLS)
            sub_oh = jnp.broadcast_to(one_hot[:1], (sub.shape[0], N_CLS))
            slide_loss = optax.softmax_cross_entropy(slide, one_hot).mean()
            sub_loss = optax.softmax_cross_entropy(sub, sub_oh).mean()
            return (sub_loss + slide_loss) / 2.0

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for x, y in batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray([y]))
        losses.append(float(loss))
    return np.asarray(losses)


def test_dtfd_two_optimizer_lockstep():
    batches = _batches(STEPS)
    sd0, t_losses = _torch_run(batches, sequential=False)
    j_losses = _jax_run(sd0, batches)
    deltas = np.abs(t_losses - j_losses)
    assert deltas.max() <= 5e-5, (deltas, t_losses, j_losses)
    assert np.abs(np.diff(t_losses)).max() > 1e-6  # the run must actually move
    # milestone sanity: losses before/after the LR drop both tracked, i.e. the
    # epoch->step boundary conversion agrees with torch MultiStepLR
    assert deltas[STEPS_PER_EPOCH * MILESTONE_EPOCH:].max() <= 5e-5


def test_dtfd_sequential_vs_simultaneous_deviation():
    """Quantify (torch-vs-torch) the Lightning sequential two-optimizer update
    vs the simultaneous one our jitted step implements. Small but nonzero —
    recorded in PARITY.md deviations; the lockstep row above is exact against
    the simultaneous semantics."""
    batches = _batches(STEPS)
    _, sim = _torch_run(batches, sequential=False)
    _, seq = _torch_run(batches, sequential=True)
    gap = np.abs(sim - seq).max()
    # O(lr) second-order effect: must be tiny relative to the ~0.7 loss scale
    # but will not be exactly zero (tier-2 sees post-step tier-1 activations)
    assert gap < 5e-3, (gap, sim, seq)
