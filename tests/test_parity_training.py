"""Lockstep training-dynamics parity vs the torch reference path.

VERDICT round-2 item 2: forward/eval parity was pinned with fixtures; this
closes the training axis. With converted weights, identical batches, and
dropout off, N optimization steps run in torch (tests/torch_ref TransMIL +
reference-semantics optimizers) and in the JAX stack; per-step losses must
track.

Reference training path: ``/root/reference/code/models/model_interface.py:
333-383`` (training_step = CE on logits), optimizer ``lookahead_radam``
(``MyOptimizer/lookahead.py:12``, ``radam.py:21-86``).

The documented gradient deviation (ops/pinv.py: init-scale stop_gradient) is
quantified here by running the torch side BOTH ways — autograd through the
tie-break vs detached — on the same weights/batches; measured numbers go into
PARITY.md.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests.torch_ref import mil_torch  # noqa: E402
from tests.torch_ref.torch_opt import Lookahead, ReferenceRAdam  # noqa: E402
from transmil_deepgraft_tpu.models import TransMIL  # noqa: E402
from transmil_deepgraft_tpu.train.optimizers import create_optimizer  # noqa: E402
from transmil_deepgraft_tpu.utils.torch_weights import (  # noqa: E402
    convert_transmil_state_dict,
)

IN_F, OUT_F, N_TOK, N_CLS = 256, 128, 100, 2


def _batches(steps: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal((1, N_TOK, IN_F)).astype(np.float32) * 0.5,
         int(rng.integers(N_CLS)))
        for _ in range(steps)
    ]


def _detached_iter_pinv(mat: torch.Tensor, iters: int = 6) -> torch.Tensor:
    """iter_pinv with the init scale detached — the JAX side's documented
    gradient semantics (ops/pinv.py stop_gradient)."""
    a = torch.abs(mat)
    z = mat.transpose(-1, -2) / (a.sum(-1).max() * a.sum(-2).max()).detach()
    eye = torch.eye(mat.shape[-1], dtype=mat.dtype)
    for _ in range(iters):
        mz = mat @ z
        z = 0.25 * z @ (13 * eye - mz @ (15 * eye - mz @ (7 * eye - mz)))
    return z


def _torch_run(batches, make_opt, detach_pinv: bool):
    torch.manual_seed(0)
    model = mil_torch.TransMIL(N_CLS, IN_F, OUT_F).eval()  # eval: dropout off
    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    opt = make_opt(model.parameters())
    orig_pinv = mil_torch.iter_pinv
    if detach_pinv:
        mil_torch.iter_pinv = _detached_iter_pinv
    try:
        losses = []
        for x, y in batches:
            logits = model(torch.from_numpy(x))
            loss = F.cross_entropy(logits, torch.tensor([y]))
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(loss.item())
    finally:
        mil_torch.iter_pinv = orig_pinv
    return sd0, np.asarray(losses)


def _jax_run(sd0, batches, opt_name: str, lr: float):
    variables = convert_transmil_state_dict(sd0, in_features=IN_F)
    model = TransMIL(n_classes=N_CLS, in_features=IN_F, out_features=OUT_F)
    params = jax.tree.map(jnp.asarray, variables["params"])
    tx = create_optimizer(opt=opt_name, lr=lr, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, deterministic=True)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for x, y in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray([y])
        )
        losses.append(float(loss))
    return np.asarray(losses)


def test_lockstep_sgd():
    """15 SGD steps: per-step loss deltas <= 1e-4 (measured ~1e-6).

    'sgd' in the factory is Nesterov momentum SGD (timm semantics, like the
    reference's optimizer factory), so the torch mirror matches that. This
    also exercises the depthwise-conv custom VJP (ops/depthwise.py) and the
    analytic Nystrom backward end to end against torch autograd."""
    batches = _batches(15)
    sd0, t_losses = _torch_run(
        batches,
        lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9, nesterov=True),
        detach_pinv=True,
    )
    j_losses = _jax_run(sd0, batches, "sgd", lr=1e-2)
    deltas = np.abs(t_losses - j_losses)
    assert deltas.max() <= 1e-4, (deltas, t_losses, j_losses)


def test_lockstep_lookahead_radam():
    """15 steps of the reference's default optimizer (lookahead_radam,
    lr=2e-4 per its README): losses must track through two lookahead syncs.
    Tolerance covers the documented eps-placement difference between
    optax.radam and the original-repo RAdam (O(eps) per step)."""
    batches = _batches(15)

    def make_opt(ps):
        ps = list(ps)
        return Lookahead(ReferenceRAdam(ps, lr=2e-4), ps, k=6, alpha=0.5)

    sd0, t_losses = _torch_run(batches, make_opt, detach_pinv=True)
    j_losses = _jax_run(sd0, batches, "lookahead_radam", lr=2e-4)
    deltas = np.abs(t_losses - j_losses)
    assert deltas.max() <= 5e-4, (deltas, t_losses, j_losses)


def test_pinv_tiebreak_deviation_quantified():
    """The pinv init-scale stop_gradient deviation, measured on the SAME
    framework (torch vs torch): autograd-through-tie-break vs detached.
    Bound documents that the deviation is far below optimization noise."""
    batches = _batches(15)

    def make_opt(ps):
        return torch.optim.SGD(ps, lr=1e-2, momentum=0.9, nesterov=True)

    _, detached = _torch_run(batches, make_opt, detach_pinv=True)
    _, through = _torch_run(batches, make_opt, detach_pinv=False)
    dev = np.abs(detached - through)
    # measured: report in PARITY.md; the tie-break gradient's training impact
    # stays below the SGD lockstep tolerance itself
    print("pinv tie-break per-step loss deviation:", dev)
    assert dev.max() <= 1e-4, dev
