"""Torch optimizers with the reference training stack's exact semantics,
for lockstep training-dynamics parity tests.

Written fresh from the algorithm as the reference configures it — NOT copied:

- RAdam (Liu et al. 2019) in the original-repo formulation the reference
  vendors (``/root/reference/code/MyOptimizer/radam.py:21-86``): variance
  rectification kicks in at rho >= 5; in the rectified regime the update is
  ``lr * rect * sqrt(1-b2^t) / (1-b1^t) * m / (sqrt(v) + eps)`` (eps added to
  the *uncorrected* second-moment root, the original repo's placement; the
  paper/optax place eps after bias correction — an O(eps) difference), and in
  the unrectified regime plain bias-corrected momentum SGD.
- Lookahead (Zhang et al. 2019) with the reference's defaults k=6, alpha=0.5
  (``MyOptimizer/lookahead.py:12``): every k-th base step the fast weights are
  pulled to ``slow + alpha * (fast - slow)`` and the slow weights sync there —
  the same semantics as ``train/optimizers.lookahead_wrap``.
"""

from __future__ import annotations

import math

import torch


class ReferenceRAdam:
    """Minimal RAdam with the reference's (original-repo) semantics."""

    def __init__(self, params, lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd = eps, weight_decay
        self.t = 0
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]

    @torch.no_grad()
    def step(self) -> None:
        self.t += 1
        t, b1, b2 = self.t, self.b1, self.b2
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        b2t = b2 ** t
        rho = rho_inf - 2.0 * t * b2t / (1.0 - b2t)
        if rho >= 5.0:
            rect = math.sqrt(
                (1.0 - b2t) * (rho - 4.0) / (rho_inf - 4.0)
                * (rho - 2.0) / rho * rho_inf / (rho_inf - 2.0)
            )
            step_size = self.lr * rect / (1.0 - b1 ** t)
        else:
            step_size = self.lr / (1.0 - b1 ** t)
        for p, m, v in zip(self.params, self.m, self.v):
            if p.grad is None:
                continue
            g = p.grad
            m.mul_(b1).add_(g, alpha=1.0 - b1)
            v.mul_(b2).addcmul_(g, g, value=1.0 - b2)
            if self.wd:
                p.add_(p, alpha=-self.wd * self.lr)
            if rho >= 5.0:
                p.addcdiv_(m, v.sqrt().add(self.eps), value=-step_size)
            else:
                p.add_(m, alpha=-step_size)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class Lookahead:
    """Wrap any optimizer exposing ``step``/``zero_grad`` over shared params."""

    def __init__(self, base, params, k: int = 6, alpha: float = 0.5):
        self.base, self.k, self.alpha = base, k, alpha
        self.params = [p for p in params if p.requires_grad]
        self.slow = [p.detach().clone() for p in self.params]
        self.counter = 0

    @torch.no_grad()
    def step(self) -> None:
        self.base.step()
        self.counter += 1
        if self.counter % self.k == 0:
            for p, s in zip(self.params, self.slow):
                s.add_(p - s, alpha=self.alpha)
                p.copy_(s)

    def zero_grad(self) -> None:
        self.base.zero_grad()


def _proj_views(p: torch.Tensor, grad: torch.Tensor, perturb: torch.Tensor,
                delta: float, wd_ratio: float, eps: float):
    """AdamP/SGDP radial projection (Heo et al. 2021, arXiv:2006.08217):
    channel view first, then layer view; fires on max |cos(grad, p)| below
    delta/sqrt(view_width)."""
    for channel in (True, False):
        view = (lambda x: x.view(x.size(0), -1)) if channel else (lambda x: x.view(1, -1))
        gv, pv = view(grad), view(p)
        cos = (gv * pv).sum(dim=1).abs() / ((gv.norm(dim=1) + eps) * (pv.norm(dim=1) + eps))
        if cos.max() < delta / math.sqrt(pv.size(1)):
            expand = [-1] + [1] * (p.dim() - 1) if channel else [1] * p.dim()
            p_n = p / (view(p).norm(dim=1).view(expand) + eps)
            perturb = perturb - p_n * view(p_n * perturb).sum(dim=1).view(expand)
            return perturb, wd_ratio
    return perturb, 1.0


class ReferenceAdamP:
    """AdamP with the reference's configuration (wd_ratio=0.01, nesterov=True)."""

    def __init__(self, params, lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, delta: float = 0.1, wd_ratio: float = 0.01,
                 nesterov: bool = True):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd = eps, weight_decay
        self.delta, self.wd_ratio, self.nesterov = delta, wd_ratio, nesterov
        self.t = 0
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]

    @torch.no_grad()
    def step(self) -> None:
        self.t += 1
        bc1 = 1 - self.b1 ** self.t
        bc2 = 1 - self.b2 ** self.t
        for p, m, v in zip(self.params, self.m, self.v):
            if p.grad is None:
                continue
            g = p.grad
            m.mul_(self.b1).add_(g, alpha=1 - self.b1)
            v.mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            denom = (v.sqrt() / math.sqrt(bc2)).add_(self.eps)
            perturb = ((self.b1 * m + (1 - self.b1) * g) if self.nesterov else m) / denom
            wd_r = 1.0
            if p.dim() > 1:
                perturb, wd_r = _proj_views(p, g, perturb, self.delta, self.wd_ratio, self.eps)
            if self.wd > 0:
                p.mul_(1 - self.lr * self.wd * wd_r)
            p.add_(perturb, alpha=-(self.lr / bc1))

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceSGDP:
    """SGDP (Heo et al. 2021) with the reference's config: nesterov=True."""

    def __init__(self, params, lr: float, momentum: float = 0.9, weight_decay: float = 0.0,
                 nesterov: bool = True, eps: float = 1e-8, delta: float = 0.1,
                 wd_ratio: float = 0.1, dampening: float = 0.0):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.mom, self.wd = lr, momentum, weight_decay
        self.nesterov, self.eps = nesterov, eps
        self.delta, self.wd_ratio, self.damp = delta, wd_ratio, dampening
        self.buf = [torch.zeros_like(p) for p in self.params]

    @torch.no_grad()
    def step(self) -> None:
        for p, buf in zip(self.params, self.buf):
            if p.grad is None:
                continue
            g = p.grad
            buf.mul_(self.mom).add_(g, alpha=1 - self.damp)
            d_p = g + self.mom * buf if self.nesterov else buf.clone()
            wd_r = 1.0
            if p.dim() > 1:
                d_p, wd_r = _proj_views(p, g, d_p, self.delta, self.wd_ratio, self.eps)
            if self.wd != 0:
                p.mul_(1 - self.lr * self.wd * wd_r / (1 - self.mom))
            p.add_(d_p, alpha=-self.lr)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceNadam:
    """Nadam as the reference vendors it (pytorch/pytorch#1408 / Dozat 2016
    with the warming momentum schedule, schedule_decay=4e-3)."""

    def __init__(self, params, lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, schedule_decay: float = 4e-3):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd, self.sd = eps, weight_decay, schedule_decay
        self.t = 0
        self.m_schedule = 1.0
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]

    @torch.no_grad()
    def step(self) -> None:
        self.t += 1
        t = self.t
        mu_t = self.b1 * (1.0 - 0.5 * 0.96 ** (t * self.sd))
        mu_t1 = self.b1 * (1.0 - 0.5 * 0.96 ** ((t + 1) * self.sd))
        m_schedule_new = self.m_schedule * mu_t
        m_schedule_next = m_schedule_new * mu_t1
        self.m_schedule = m_schedule_new
        for p, m, v in zip(self.params, self.m, self.v):
            if p.grad is None:
                continue
            g = p.grad
            if self.wd:
                g = g.add(p, alpha=self.wd)
            m.mul_(self.b1).add_(g, alpha=1 - self.b1)
            v.mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            denom = (v / (1 - self.b2 ** t)).sqrt_().add_(self.eps)
            p.addcdiv_(g, denom, value=-self.lr * (1 - mu_t) / (1 - m_schedule_new))
            p.addcdiv_(m, denom, value=-self.lr * mu_t1 / (1 - m_schedule_next))

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceRMspropTF:
    """TF1-semantics RMSprop as the reference vendors it: ones-init square
    avg, eps INSIDE the sqrt, lr accumulated in the momentum buffer."""

    def __init__(self, params, lr: float, alpha: float = 0.9, eps: float = 1e-10,
                 momentum: float = 0.9, weight_decay: float = 0.0):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.alpha, self.eps = lr, alpha, eps
        self.mom, self.wd = momentum, weight_decay
        self.sq = [torch.ones_like(p) for p in self.params]
        self.buf = [torch.zeros_like(p) for p in self.params]

    @torch.no_grad()
    def step(self) -> None:
        for p, sq, buf in zip(self.params, self.sq, self.buf):
            if p.grad is None:
                continue
            g = p.grad
            if self.wd:
                g = g.add(p, alpha=self.wd)  # coupled L2 (reference default)
            sq.add_(g.pow(2) - sq, alpha=1 - self.alpha)
            avg = sq.add(self.eps).sqrt_()
            if self.mom > 0:
                # lr_in_momentum=True (the vendored default)
                buf.mul_(self.mom).addcdiv_(g, avg, value=self.lr)
                p.add_(-buf)
            else:
                p.addcdiv_(g, avg, value=-self.lr)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceNvNovoGrad:
    """NovoGrad (Ginsburg et al. 2019) with NVIDIA's semantics (per-tensor
    scalar second moment initialized to ||g_1||^2) — what both 'novograd'
    names resolve to in the JAX factory."""

    def __init__(self, params, lr: float, betas=(0.95, 0.98), eps: float = 1e-8,
                 weight_decay: float = 0.0, grad_averaging: bool = False):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd, self.ga = eps, weight_decay, grad_averaging
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [None for _ in self.params]

    @torch.no_grad()
    def step(self) -> None:
        for i, (p, m) in enumerate(zip(self.params, self.m)):
            if p.grad is None:
                continue
            g = p.grad.clone()
            norm2 = torch.sum(g * g)
            if self.v[i] is None:
                self.v[i] = norm2
            else:
                self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * norm2
            g = g / (self.v[i].sqrt() + self.eps)
            if self.wd:
                g = g.add(p, alpha=self.wd)
            if self.ga:
                g = g * (1 - self.b1)
            m.mul_(self.b1).add_(g)
            p.add_(m, alpha=-self.lr)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None
