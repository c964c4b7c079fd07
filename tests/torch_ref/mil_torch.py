"""Torch implementations of the reference MIL heads, for numeric parity tests.

Everything here is written from the published math (Nystromformer, Ilse gated
attention, CLAM, DTFD-MIL) plus the architecture facts recorded in SURVEY.md
section 2.2 — NOT copied from the reference repo or the ``nystrom_attention``
pip package. The state-dict key layout intentionally matches the reference
models (``_fc1.0.weight``, ``layer1.attn.to_qkv.weight``,
``pos_layer.proj.weight``, ...) so that ``utils/torch_weights`` converters are
tested against the exact naming a real reference checkpoint has.

Reference architecture sources (for key layout / hyperparameters only):
  TransMIL     /root/reference/code/models/TransMIL.py:78-211
  NystromAttn  the lucidrains ``nystrom_attention`` package the reference
               imports (semantics documented in SURVEY.md section 2.2)
  AttMIL       /root/reference/code/models/AttMIL.py:20-110
  CLAM         /root/reference/code/models/model_clam.py:22-280
  DTFD         /root/reference/code/models/DTFDMIL.py:14-108 +
               model_interface_dtfd.py:174-224
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------- #
# Nystrom attention (math per Xiong et al. 2021 + the pip package's choices)
# --------------------------------------------------------------------------- #


def iter_pinv(mat: torch.Tensor, iters: int = 6) -> torch.Tensor:
    """Newton-Schulz order-3 pseudo-inverse.

    Init divides the transpose by the GLOBAL (all batches/heads) max row-sum
    times max col-sum — a quirk of the reference dependency that the JAX op
    replicates (ops/pinv.py docstring)."""
    a = torch.abs(mat)
    z = mat.transpose(-1, -2) / (a.sum(-1).max() * a.sum(-2).max())
    eye = torch.eye(mat.shape[-1], dtype=mat.dtype)
    for _ in range(iters):
        mz = mat @ z
        z = 0.25 * z @ (13 * eye - mz @ (15 * eye - mz @ (7 * eye - mz)))
    return z


class NystromSelfAttention(nn.Module):
    """O(n*m) landmark attention with depthwise-conv value residual."""

    def __init__(
        self,
        dim: int = 512,
        heads: int = 8,
        dim_head: int = 64,
        num_landmarks: int = 256,
        pinv_iterations: int = 6,
        residual: bool = True,
        residual_kernel: int = 33,
        dropout: float = 0.0,
    ):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.m, self.iters = num_landmarks, pinv_iterations
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(dropout))
        self.residual = residual
        if residual:
            self.res_conv = nn.Conv2d(
                heads, heads, (residual_kernel, 1),
                padding=(residual_kernel // 2, 0), groups=heads, bias=False,
            )

    def forward(self, x: torch.Tensor, return_attn: bool = False):
        b, n, _ = x.shape
        h, m = self.heads, self.m

        pad = (m - n % m) % m
        if pad:
            x = F.pad(x, (0, 0, pad, 0))  # front zero-pad the sequence
        n_p = x.shape[1]

        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (
            t.view(b, n_p, h, self.dim_head).permute(0, 2, 1, 3) for t in (q, k, v)
        )
        q = q * self.scale

        seg = n_p // m
        q_lm = q.reshape(b, h, m, seg, -1).mean(dim=3)
        k_lm = k.reshape(b, h, m, seg, -1).mean(dim=3)

        attn1 = (q @ k_lm.transpose(-1, -2)).softmax(-1)    # (b,h,n_p,m)
        attn2 = (q_lm @ k_lm.transpose(-1, -2)).softmax(-1)  # (b,h,m,m)
        attn3 = (q_lm @ k.transpose(-1, -2)).softmax(-1)    # (b,h,m,n_p)
        attn2_inv = iter_pinv(attn2, self.iters)

        out = (attn1 @ attn2_inv) @ (attn3 @ v)  # (b,h,n_p,d)
        if self.residual:
            out = out + self.res_conv(v)

        out = out.permute(0, 2, 1, 3).reshape(b, n_p, -1)
        out = self.to_out(out)
        out = out[:, -n:]

        if return_attn:
            full = attn1 @ attn2_inv @ attn3  # (b, h, n_p, n_p)
            return out, full
        return out


class TransLayer(nn.Module):
    """Pre-norm residual Nystrom block: dim 512, 8 heads, m=dim/2, dropout 0.7."""

    def __init__(self, dim: int = 512):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.attn = NystromSelfAttention(
            dim=dim, heads=8, dim_head=dim // 8, num_landmarks=dim // 2,
            pinv_iterations=6, residual=True, dropout=0.7,
        )

    def forward(self, x: torch.Tensor):
        out, attn = self.attn(self.norm(x), return_attn=True)
        return x + out, attn


class PPEG(nn.Module):
    """cls bypass + identity + summed depthwise 7/5/3 convs on the token grid."""

    def __init__(self, dim: int = 512):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
        self.proj1 = nn.Conv2d(dim, dim, 5, 1, 2, groups=dim)
        self.proj2 = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x: torch.Tensor, grid_h: int, grid_w: int):
        b, _, c = x.shape
        cls_tok, feat = x[:, :1], x[:, 1:]
        grid = feat.transpose(1, 2).reshape(b, c, grid_h, grid_w)
        out = grid + self.proj(grid) + self.proj1(grid) + self.proj2(grid)
        out = out.flatten(2).transpose(1, 2)
        return torch.cat([cls_tok, out], dim=1)


def make_fc1(in_features: int, out_features: int) -> nn.Sequential:
    """Input-projection variants (SURVEY section 2.2; the 1024 branch's LN dims
    are corrected to executable shapes, matching the flax side's deviation
    note in PARITY.md)."""
    half = in_features // 2
    if in_features == 2048:
        return nn.Sequential(
            nn.Linear(in_features, half), nn.GELU(), nn.LayerNorm(half),
            nn.Linear(half, out_features), nn.GELU(),
        )
    if in_features == 1024:
        return nn.Sequential(
            nn.Linear(in_features, in_features), nn.GELU(), nn.Dropout(0.2),
            nn.LayerNorm(in_features),
            nn.Linear(in_features, out_features), nn.GELU(), nn.Dropout(0.6),
            nn.LayerNorm(out_features),
        )
    if in_features == 768:
        return nn.Sequential(
            nn.Linear(in_features, in_features), nn.GELU(), nn.Dropout(0.6),
            nn.LayerNorm(in_features),
            nn.Linear(in_features, out_features), nn.GELU(), nn.Dropout(0.6),
            nn.LayerNorm(out_features),
        )
    return nn.Sequential(nn.Linear(in_features, out_features), nn.GELU())


class TransMIL(nn.Module):
    def __init__(self, n_classes: int, in_features: int, out_features: int = 512):
        super().__init__()
        self.pos_layer = PPEG(dim=out_features)
        self._fc1 = make_fc1(in_features, out_features)
        self.cls_token = nn.Parameter(torch.randn(1, 1, out_features))
        self.layer1 = TransLayer(dim=out_features)
        self.layer2 = TransLayer(dim=out_features)
        self.norm = nn.LayerNorm(out_features)
        self._fc = nn.Linear(out_features, n_classes)

    def forward(self, x: torch.Tensor, return_attn: bool = False):
        if x.dim() == 2:
            x = x.unsqueeze(0)
        h = self._fc1(x.float())

        n = h.shape[1]
        side = int(math.ceil(math.sqrt(n)))
        add = side * side - n
        h = torch.cat([h, h[:, :add]], dim=1)

        b = h.shape[0]
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)

        h, _ = self.layer1(h)
        seq = h.shape[1]
        padding = (256 - seq % 256) % 256  # the reference hard-codes 256
        h = self.pos_layer(h, side, side)
        h, attn2 = self.layer2(h)

        h = self.norm(h)[:, 0]
        logits = self._fc(h)
        if return_attn:
            return logits, (attn2, padding)
        return logits


# --------------------------------------------------------------------------- #
# AttMIL (Ilse gated attention pooling)
# --------------------------------------------------------------------------- #


class AttMIL(nn.Module):
    def __init__(self, n_classes: int, in_features: int = 2048, out_features: int = 512):
        super().__init__()
        L, D, K = out_features, 128, 1
        if in_features == 2048:
            self._fc1 = nn.Sequential(
                nn.Linear(in_features, in_features // 2), nn.GELU(), nn.Dropout(0.6),
                nn.LayerNorm(in_features // 2),
                nn.Linear(in_features // 2, out_features), nn.GELU(),
            )
        else:
            self._fc1 = nn.Sequential(
                nn.Linear(in_features, out_features), nn.GELU(), nn.Dropout(0.6),
                nn.LayerNorm(out_features),
            )
        self.attention_V = nn.Sequential(nn.Linear(L, D), nn.Tanh())
        self.attention_U = nn.Sequential(nn.Linear(L, D), nn.Sigmoid())
        self.attention_weights = nn.Linear(D, K)
        self.classifier = nn.Sequential(nn.Linear(L * K, n_classes))

    def forward(self, x: torch.Tensor):
        x = x.squeeze()
        h = self._fc1(x)                                   # (N, L)
        a = self.attention_weights(self.attention_V(h) * self.attention_U(h))
        a = F.softmax(a.transpose(1, 0), dim=1)            # (K, N)
        m = a @ h                                          # (K, L)
        return self.classifier(m)


# --------------------------------------------------------------------------- #
# CLAM (single / multi branch)
# --------------------------------------------------------------------------- #


class AttnNetGated(nn.Module):
    def __init__(self, L: int = 512, D: int = 256, dropout: bool = False, n_classes: int = 1):
        super().__init__()
        a = [nn.Linear(L, D), nn.Tanh()]
        b = [nn.Linear(L, D), nn.Sigmoid()]
        if dropout:
            a.append(nn.Dropout(0.25))
            b.append(nn.Dropout(0.25))
        self.attention_a = nn.Sequential(*a)
        self.attention_b = nn.Sequential(*b)
        self.attention_c = nn.Linear(D, n_classes)

    def forward(self, x: torch.Tensor):
        return self.attention_c(self.attention_a(x) * self.attention_b(x)), x


class CLAM_SB(nn.Module):
    SIZES = {"small": [1024, 512, 256], "big": [1024, 512, 384]}

    def __init__(
        self, gate: bool = True, size_arg: str = "small", dropout: bool = False,
        k_sample: int = 8, n_classes: int = 2, subtyping: bool = False,
        in_features: int | None = None,
    ):
        super().__init__()
        size = list(self.SIZES[size_arg])
        if in_features is not None:
            size[0] = in_features
        fc = [nn.Linear(size[0], size[1]), nn.ReLU()]
        if dropout:
            fc.append(nn.Dropout(0.25))
        fc.append(AttnNetGated(L=size[1], D=size[2], dropout=dropout, n_classes=1))
        self.attention_net = nn.Sequential(*fc)
        self.classifiers = nn.Linear(size[1], n_classes)
        self.instance_classifiers = nn.ModuleList(
            [nn.Linear(size[1], 2) for _ in range(n_classes)]
        )
        self.k_sample = k_sample
        self.n_classes = n_classes
        self.subtyping = subtyping

    def _inst_in(self, scores: torch.Tensor, h: torch.Tensor, clf: nn.Module):
        k = self.k_sample
        top = h[torch.topk(scores, k)[1][-1]]
        bot = h[torch.topk(-scores, k, dim=1)[1][-1]]
        logits = clf(torch.cat([top, bot], dim=0))
        targets = torch.cat([torch.ones(k), torch.zeros(k)]).long()
        return F.cross_entropy(logits, targets)

    def _inst_out(self, scores: torch.Tensor, h: torch.Tensor, clf: nn.Module):
        k = self.k_sample
        top = h[torch.topk(scores, k)[1][-1]]
        return F.cross_entropy(clf(top), torch.zeros(k).long())

    def forward(self, h: torch.Tensor, label=None, instance_eval: bool = False):
        scores, h = self.attention_net(h)          # (N, 1), (N, 512)
        scores = scores.transpose(1, 0)            # (1, N)
        attn = F.softmax(scores, dim=1)

        inst_loss = torch.tensor(0.0)
        if instance_eval:
            one_hot = F.one_hot(label, num_classes=self.n_classes).squeeze()
            for c, clf in enumerate(self.instance_classifiers):
                if one_hot[c].item() == 1:
                    inst_loss = inst_loss + self._inst_in(scores, h, clf)
                elif self.subtyping:
                    inst_loss = inst_loss + self._inst_out(scores, h, clf)
            if self.subtyping:
                inst_loss = inst_loss / self.n_classes

        m = attn @ h
        logits = self.classifiers(m)
        if instance_eval:
            return logits, inst_loss
        return logits


class CLAM_MB(CLAM_SB):
    def __init__(
        self, gate: bool = True, size_arg: str = "small", dropout: bool = False,
        k_sample: int = 8, n_classes: int = 2, subtyping: bool = False,
        in_features: int | None = None,
    ):
        nn.Module.__init__(self)
        size = list(self.SIZES[size_arg])
        if in_features is not None:
            size[0] = in_features
        fc = [nn.Linear(size[0], size[1]), nn.ReLU()]
        if dropout:
            fc.append(nn.Dropout(0.25))
        fc.append(AttnNetGated(L=size[1], D=size[2], dropout=dropout, n_classes=n_classes))
        self.attention_net = nn.Sequential(*fc)
        self.classifiers = nn.ModuleList([nn.Linear(size[1], 1) for _ in range(n_classes)])
        self.instance_classifiers = nn.ModuleList(
            [nn.Linear(size[1], 2) for _ in range(n_classes)]
        )
        self.k_sample = k_sample
        self.n_classes = n_classes
        self.subtyping = subtyping

    def forward(self, h: torch.Tensor, label=None, instance_eval: bool = False):
        scores, h = self.attention_net(h)          # (N, C), (N, 512)
        scores = scores.transpose(1, 0)            # (C, N)
        attn = F.softmax(scores, dim=1)

        inst_loss = torch.tensor(0.0)
        if instance_eval:
            one_hot = F.one_hot(label, num_classes=self.n_classes).squeeze()
            for c, clf in enumerate(self.instance_classifiers):
                row = scores[c].view(1, -1)
                if one_hot[c].item() == 1:
                    inst_loss = inst_loss + self._inst_in(row, h, clf)
                elif self.subtyping:
                    inst_loss = inst_loss + self._inst_out(row, h, clf)
            if self.subtyping:
                inst_loss = inst_loss / self.n_classes

        m = attn @ h                               # (C, 512)
        logits = torch.stack([self.classifiers[c](m[c]) for c in range(self.n_classes)], dim=1)
        if instance_eval:
            return logits, inst_loss
        return logits


# --------------------------------------------------------------------------- #
# DTFD-MIL (two-tier); module names mirror model_interface_dtfd.py
# --------------------------------------------------------------------------- #


class GatedAttention(nn.Module):
    def __init__(self, features: int = 512, D: int = 128, K: int = 1):
        super().__init__()
        self.attention_V = nn.Sequential(nn.Linear(features, D), nn.Tanh())
        self.attention_U = nn.Sequential(nn.Linear(features, D), nn.Sigmoid())
        self.attention_weights = nn.Linear(D, K)

    def forward(self, x: torch.Tensor, normalize: bool = True):
        a = self.attention_weights(self.attention_V(x) * self.attention_U(x))
        a = a.transpose(1, 0)
        return F.softmax(a, dim=1) if normalize else a


class Classifier1fc(nn.Module):
    def __init__(self, n_channels: int, n_classes: int, droprate: float = 0.0):
        super().__init__()
        self.fc = nn.Linear(n_channels, n_classes)
        self.droprate = droprate
        if droprate:
            self.dropout = nn.Dropout(droprate)

    def forward(self, x: torch.Tensor):
        if self.droprate:
            x = self.dropout(x)
        return self.fc(x)


class AttentionWithClassifier(nn.Module):
    def __init__(self, L: int = 512, D: int = 128, K: int = 1, num_cls: int = 2, droprate: float = 0.0):
        super().__init__()
        self.attention = GatedAttention(L, D, K)
        self.classifier = Classifier1fc(L, num_cls, droprate)

    def forward(self, x: torch.Tensor):
        return self.classifier(self.attention(x) @ x)


class DimReduction(nn.Module):
    def __init__(self, n_channels: int, m_dim: int = 512):
        super().__init__()
        self.fc1 = nn.Linear(n_channels, m_dim, bias=False)

    def forward(self, x: torch.Tensor):
        return F.relu(self.fc1(x))


class DTFDMIL(nn.Module):
    """Tier-1 per-pseudo-bag attention+classifier, tier-2 over pooled features.

    ``deterministic=True`` uses an identity permutation (arange) for the
    pseudo-bag split so the torch and flax sides group instances identically."""

    def __init__(self, n_classes: int, in_features: int = 1024, m_dim: int = 512,
                 bag_size: int = 120, max_pseudo_bags: int = 8):
        super().__init__()
        self.dimreduction = DimReduction(in_features, m_dim)
        self.attention = GatedAttention(features=m_dim)
        self.classifier = Classifier1fc(m_dim, n_classes)
        self.attCls = AttentionWithClassifier(L=m_dim, num_cls=n_classes)
        self.bag_size = bag_size
        self.max_pseudo_bags = max_pseudo_bags

    def forward(self, x: torch.Tensor, deterministic: bool = True):
        if x.dim() == 3:
            x = x[0]
        n = x.shape[0]
        g = max(1, min(self.max_pseudo_bags, n // self.bag_size))
        pb = min(self.bag_size, n)

        feats = self.dimreduction(x.float())
        idx = torch.arange(n) if deterministic else torch.randperm(n)

        pooled, sub_preds = [], []
        for i in range(g):
            bag = feats[idx[pb * i: pb * (i + 1)]]
            a = self.attention(bag).squeeze(0)            # (pb,)
            pooled_feat = (bag * a.unsqueeze(1)).sum(0, keepdim=True)  # (1, 512)
            sub_preds.append(self.classifier(pooled_feat))
            pooled.append(pooled_feat)

        pooled = torch.cat(pooled, dim=0)                 # (G, 512)
        sub_predictions = torch.cat(sub_preds, dim=0)     # (G, C)
        slide_prediction = self.attCls(pooled)            # (1, C)
        return sub_predictions, slide_prediction


class Chowder(nn.Module):
    """Ref ``Chowder.py:19-50``: Conv1d instance scorer, top/bottom-R scores,
    MLP 2R -> 200 -> 100 -> n_classes, cat order (min, max)."""

    def __init__(self, n_classes: int, features: int = 512, r: int = 5):
        super().__init__()
        self.R = r
        self.f1 = nn.Sequential(nn.Conv1d(features, 1, 1))
        self.f2 = nn.Sequential(
            nn.Linear(r * 2, 200), nn.Linear(200, 100), nn.Linear(100, n_classes)
        )

    def forward(self, x: torch.Tensor):
        x = x.float().transpose(1, 2)          # (B, L, N)
        x = self.f1(x)                          # (B, 1, N)
        max_v = torch.topk(x, self.R).values
        min_v = torch.topk(x, self.R, largest=False).values
        cat = torch.cat((min_v, max_v), dim=2)  # (B, 1, 2R)
        return self.f2(cat).squeeze(0), None


class _ViTAttention(nn.Module):
    """Ref ``_transformer.py:16-44``."""

    def __init__(self, dim=512, heads=8, dim_head=64, dropout=0.0):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(dropout))

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.reshape(b, n, self.heads, -1).transpose(1, 2) for t in qkv)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class _ViTFeedForward(nn.Module):
    """Ref ``_transformer.py:46-58``."""

    def __init__(self, dim=512, hidden_dim=512, dropout=0.0):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, hidden_dim), nn.GELU(), nn.Dropout(dropout),
            nn.Linear(hidden_dim, dim), nn.Dropout(dropout),
        )

    def forward(self, x):
        return self.net(x)


class _PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _ViTTransformer(nn.Module):
    """Ref ``TransformerMIL.py:18-32``."""

    def __init__(self, dim, depth, heads, dim_head, mlp_dim, dropout=0.0):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleList([
                _PreNorm(dim, _ViTAttention(dim, heads, dim_head, dropout)),
                _PreNorm(dim, _ViTFeedForward(dim, mlp_dim, dropout)),
            ])
            for _ in range(depth)
        ])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class TransformerMIL(nn.Module):
    """Ref ``TransformerMIL.py:74-152`` ACTIVE forward (fc1 -> cls ->
    transformer1 -> transformer2 -> cls pool -> norm -> fc2; the conv/PPEG/
    TransLayer members are dead code in the reference)."""

    def __init__(self, n_classes: int, in_features: int = 2048, out_features: int = 512):
        super().__init__()
        if in_features == 2048:
            self.fc1 = nn.Sequential(
                nn.Linear(in_features, in_features // 2), nn.GELU(), nn.Dropout(0.6),
                nn.LayerNorm(in_features // 2),
                nn.Linear(in_features // 2, out_features), nn.GELU(),
            )
        elif in_features == 1024:
            self.fc1 = nn.Sequential(
                nn.Linear(in_features, out_features), nn.GELU(), nn.Dropout(0.6),
                nn.LayerNorm(out_features),
            )
        else:
            self.fc1 = nn.Sequential(nn.Linear(in_features, out_features), nn.ReLU())
        self.cls_token = nn.Parameter(torch.randn(1, 1, out_features))
        self.transformer1 = _ViTTransformer(out_features, 2, 8, 64, 512, dropout=0.5)
        self.transformer2 = _ViTTransformer(out_features, 2, 8, 64, 512, dropout=0.5)
        self.dropout = nn.Dropout(0.5)
        self.norm = nn.LayerNorm(out_features)
        self._fc2 = nn.Linear(out_features, n_classes)

    def forward(self, x):
        if x.dim() == 2:
            x = x.unsqueeze(0)
        x = self.fc1(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = self.dropout(x)
        x = self.transformer1(x)
        x = self.transformer2(x)
        x = self.norm(x[:, 0])
        return self._fc2(x)


# --------------------------------------------------------------------------- #
# MDMIL + CTMIL (the two heads parity-blocked on reference bugs; fixtures
# freeze the CORRECTED semantics on both sides — PARITY deviations 4 / 4b)
# --------------------------------------------------------------------------- #


class MDMIL(nn.Module):
    """MDMIL head (ref ``models/MDMIL.py:60-115``): the TransMIL pipeline with
    a single Linear(1024->512)+GELU input projection, ``_fc2`` classifier,
    cls-row attention export. The reference's IQGM stub (``MDMIL.py:47-58``,
    references undefined ``self``) is not mirrored (documented deviation 4)."""

    def __init__(self, n_classes: int, in_features: int = 1024, out_features: int = 512):
        super().__init__()
        self.pos_layer = PPEG(dim=out_features)
        self._fc1 = nn.Sequential(nn.Linear(in_features, out_features), nn.GELU())
        self.cls_token = nn.Parameter(torch.randn(1, 1, out_features))
        self.layer1 = TransLayer(dim=out_features)
        self.layer2 = TransLayer(dim=out_features)
        self.norm = nn.LayerNorm(out_features)
        self._fc2 = nn.Linear(out_features, n_classes)
        self.m = out_features // 2

    def forward(self, x: torch.Tensor, return_attn: bool = False):
        if x.dim() == 2:
            x = x.unsqueeze(0)
        h = self._fc1(x.float())
        n = h.shape[1]
        side = int(math.ceil(math.sqrt(n)))
        add = side * side - n
        h = torch.cat([h, h[:, :add]], dim=1)
        b = h.shape[0]
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
        h, _ = self.layer1(h)
        h = self.pos_layer(h, side, side)
        seq = h.shape[1]
        padding = (self.m - seq % self.m) % self.m
        h, attn2 = self.layer2(h)
        h = self.norm(h)[:, 0]
        logits = self._fc2(h)
        if return_attn:
            return logits, (attn2, padding)
        return logits


class CTMIL(nn.Module):
    """Conv-tokenized TransMIL (ref ``models/CTMIL.py:74-165``) with the two
    documented deviations applied on THIS side so the fixture freezes the
    corrected semantics in both frameworks (PARITY deviation 4b):

    - tokens are (H*W, C) via permute+reshape, not the reference's NCHW
      ``.view`` memory reinterpretation that scrambles channels across
      positions (``CTMIL.py:144``);
    - no hardcoded ``.cuda()`` (the reference forward cannot run on CPU).

    The reference's dead ``_fc1`` weights (declared, never called in forward)
    ARE declared so the state dict carries them and the converter must skip
    them like it would on a real checkpoint."""

    def __init__(self, n_classes: int, in_features: int = 1024, out_features: int = 512):
        super().__init__()
        self.pos_layer_0 = PPEG(dim=out_features)
        half = in_features // 2
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_features, half, 3, 1, 1, bias=False),
            nn.BatchNorm2d(half), nn.GELU(), nn.MaxPool2d(3, 2, 1),
        )
        self.conv2 = nn.Sequential(
            nn.Conv2d(half, out_features, 3, 1, 1, bias=False),
            nn.BatchNorm2d(out_features), nn.GELU(), nn.MaxPool2d(3, 2, 1),
        )
        if in_features == 1024:  # dead weights, as in the reference
            self._fc1 = nn.Sequential(
                nn.Linear(in_features, out_features), nn.GELU(),
                nn.Dropout(0.6), nn.LayerNorm(out_features),
            )
        self.cls_token = nn.Parameter(torch.randn(1, 1, out_features))
        self.layer1 = TransLayer(dim=out_features)
        self.layer2 = TransLayer(dim=out_features)
        self.norm = nn.LayerNorm(out_features)
        self._fc2 = nn.Linear(out_features, n_classes)

    def forward(self, x: torch.Tensor):
        # x: (B, C, H, W) feature volume
        h = self.conv2(self.conv1(x))
        c = h.shape[1]
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1, c)  # (B, H*W, C)
        n = h.shape[1]
        side = int(math.ceil(math.sqrt(n)))
        add = side * side - n
        h = torch.cat([h, h[:, :add]], dim=1)
        b = h.shape[0]
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
        h, _ = self.layer1(h)
        h = self.pos_layer_0(h, side, side)
        h, _ = self.layer2(h)
        h = self.norm(h)[:, 0]
        return self._fc2(h)
