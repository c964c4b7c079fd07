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
