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


class ReferenceAdafactor:
    """Adafactor with the reference's vendored fairseq semantics
    (``MyOptimizer/adafactor.py``): any ndim>=2 param is row/col-factored,
    beta2 schedule 1 - t**-0.8, eps added to g^2 before the factored means,
    RMS clipping at 1.0, explicit lr (no parameter-scale multiply), decoupled
    wd scaled by lr_t, optional first moment (beta1) as an EMA of the final
    scaled update."""

    def __init__(self, params, lr=None, eps: float = 1e-30, eps_scale: float = 1e-3,
                 clip_threshold: float = 1.0, decay_rate: float = -0.8,
                 beta1=None, weight_decay: float = 0.0, scale_parameter: bool = True):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.eps, self.eps_scale = lr, eps, eps_scale
        self.clip, self.decay_rate, self.b1 = clip_threshold, decay_rate, beta1
        self.wd, self.scale_parameter = weight_decay, scale_parameter
        self.step_n = 0
        self.row = [torch.zeros(p.shape[:-1]) if p.dim() >= 2 else None for p in self.params]
        self.col = [torch.zeros(p.shape[:-2] + p.shape[-1:]) if p.dim() >= 2 else None
                    for p in self.params]
        self.v = [torch.zeros_like(p) if p.dim() < 2 else None for p in self.params]
        self.m = [torch.zeros_like(p) if beta1 is not None else None for p in self.params]

    @staticmethod
    def _rms(t: torch.Tensor) -> torch.Tensor:
        return t.norm(2) / (t.numel() ** 0.5)

    @torch.no_grad()
    def step(self) -> None:
        self.step_n += 1
        beta2t = 1.0 - self.step_n ** self.decay_rate
        for i, p in enumerate(self.params):
            if p.grad is None:
                continue
            g = p.grad
            if self.lr is None:
                lr_t = min(1e-2, 1.0 / (self.step_n ** 0.5))
                if self.scale_parameter:
                    lr_t = lr_t * max(self.eps_scale, float(self._rms(p)))
            else:
                lr_t = self.lr
            u = g.pow(2) + self.eps
            if p.dim() >= 2:
                self.row[i].mul_(beta2t).add_(u.mean(dim=-1), alpha=1 - beta2t)
                self.col[i].mul_(beta2t).add_(u.mean(dim=-2), alpha=1 - beta2t)
                r_factor = (self.row[i] / self.row[i].mean(dim=-1, keepdim=True)).rsqrt().unsqueeze(-1)
                c_factor = self.col[i].unsqueeze(-2).rsqrt()
                u = r_factor * c_factor * g
            else:
                self.v[i].mul_(beta2t).add_(u, alpha=1 - beta2t)
                u = self.v[i].rsqrt() * g
            u = u / (self._rms(u) / self.clip).clamp_(min=1.0)
            u = u * lr_t
            if self.b1 is not None:
                self.m[i].mul_(self.b1).add_(u, alpha=1 - self.b1)
                u = self.m[i]
            if self.wd:
                p.add_(p, alpha=-self.wd * lr_t)
            p.add_(-u)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceAdaHessian:
    """AdaHessian (ref vendored ``MyOptimizer/adahessian.py``): Adam-like with
    the second moment over a Hutchinson diagonal-Hessian estimate and
    AdamW-style decoupled weight decay applied BEFORE the update. The
    Rademacher probes are supplied per step (``set_z``) so the JAX side can
    use identical ones."""

    def __init__(self, params, lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, hessian_power: float = 1.0,
                 decay_flags=None):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd, self.k = eps, weight_decay, hessian_power
        # per-param weight-decay gate (the factory's add_weight_decay ndim>1
        # split expressed on ONE instance — the hutchinson pass must run
        # jointly over all params, so param groups can't be separate instances)
        self.decay_flags = decay_flags if decay_flags is not None else [True] * len(self.params)
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.step_n = 0
        self._z = None

    def set_z(self, zs) -> None:
        self._z = [torch.as_tensor(z, dtype=torch.float32) for z in zs]

    def hutchinson(self, loss: torch.Tensor) -> None:
        """Populate p.hess = z * (H z) from the supplied probes; call before
        ``step`` with ``loss`` built with create_graph-able grads."""
        grads = torch.autograd.grad(loss, self.params, create_graph=True)
        h_zs = torch.autograd.grad(grads, self.params, grad_outputs=self._z)
        self.hess = [hz * z for hz, z in zip(h_zs, self._z)]
        # first-order grads for the Adam numerator
        for p, g in zip(self.params, grads):
            p.grad = g.detach()

    @torch.no_grad()
    def step(self) -> None:
        self.step_n += 1
        bc1 = 1 - self.b1 ** self.step_n
        bc2 = 1 - self.b2 ** self.step_n
        for p, m, v, d, decayed in zip(self.params, self.m, self.v, self.hess, self.decay_flags):
            if p.grad is None:
                continue
            if decayed:
                p.mul_(1 - self.lr * self.wd)
            m.mul_(self.b1).add_(p.grad, alpha=1 - self.b1)
            v.mul_(self.b2).addcmul_(d, d, value=1 - self.b2)
            denom = (v / bc2).pow(self.k / 2).add_(self.eps)
            p.addcdiv_(m, denom, value=-self.lr / bc1)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None


class ReferenceTimmNovoGrad:
    """timm's EXPERIMENTAL 'novograd' (Kimura impl the reference vendors as
    ``MyOptimizer/novograd.py``) — the double-normalizing variant its own
    docstring flags: the gradient is normalized by a per-tensor EMA of its
    norm FIRST, then the normalized gradient's norm feeds a second moment v,
    and the momentum accumulates grad/(sqrt(v)+eps) + wd*p with a
    sqrt(bc2)/bc1 stepsize. Exists purely to QUANTIFY the deviation of our
    novograd->NvNovoGrad mapping (PARITY deviation 8)."""

    def __init__(self, params, lr: float, betas=(0.95, 0.98), eps: float = 1e-8,
                 weight_decay: float = 0.0, grad_averaging: bool = False):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.b1, self.b2 = lr, betas[0], betas[1]
        self.eps, self.wd, self.ga = eps, weight_decay, grad_averaging
        self.initialized = False
        self.step_n = 0
        self.v = [None for _ in self.params]
        self.m = [None for _ in self.params]
        self.grad_ema = [None for _ in self.params]

    @torch.no_grad()
    def step(self) -> None:
        if not self.initialized:
            for i, p in enumerate(self.params):
                if p.grad is None:
                    continue
                g = p.grad
                v = torch.norm(g) ** 2
                self.v[i] = v
                self.m[i] = g / (v.sqrt() + self.eps) + self.wd * p
            self.initialized = True
        self.step_n += 1
        for i, p in enumerate(self.params):
            if p.grad is None:
                continue
            g = p.grad.clone()
            g2 = torch.norm(g) ** 2
            self.grad_ema[i] = (
                g2 if self.grad_ema[i] is None
                else self.grad_ema[i] * self.b2 + g2 * (1 - self.b2)
            )
            g = g / (self.grad_ema[i].sqrt() + self.eps)
            if self.ga:
                g = g * (1 - self.b1)
            g2 = torch.norm(g) ** 2
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g2
            self.m[i] = self.b1 * self.m[i] + (g / (self.v[i].sqrt() + self.eps) + self.wd * p)
            bc1 = 1 - self.b1 ** self.step_n
            bc2 = 1 - self.b2 ** self.step_n
            p.add_(self.m[i], alpha=-self.lr * (bc2 ** 0.5) / bc1)

    def zero_grad(self) -> None:
        for p in self.params:
            p.grad = None
