"""Torch backbone fixtures with hub-compatible state-dict layouts.

EfficientNet-B0 follows torchvision's ``features.{i}.{b}.block.{j}`` layout
(with an optional NVIDIA 'widese' SE-width switch - the reference loads
``nvidia_efficientnet_widese_b0``); the ViT follows DINO/timm naming
(``patch_embed.proj``, ``blocks.{i}.attn.qkv``). Written from the published
architectures; used to golden-test ``utils/torch_weights`` converters.
"""

from __future__ import annotations

import torch
import torch.nn as nn

B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


def _cna(cin, cout, k, s=1, groups=1, act=True):
    mods = [
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout, eps=1e-3),
    ]
    if act:
        mods.append(nn.SiLU())
    return nn.Sequential(*mods)


class SE(nn.Module):
    def __init__(self, channels, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.nn.functional.silu(self.fc1(s))))


class MBConv(nn.Module):
    def __init__(self, cin, cout, expand, k, s, widese=False):
        super().__init__()
        mid = cin * expand
        mods = []
        if expand != 1:
            mods.append(_cna(cin, mid, 1))
        mods.append(_cna(mid, mid, k, s, groups=mid))
        se_base = mid if widese else cin
        mods.append(SE(mid, max(1, int(se_base * 0.25))))
        mods.append(_cna(mid, cout, 1, act=False))
        self.block = nn.Sequential(*mods)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        out = self.block(x)
        return out + x if self.residual else out


class EfficientNetB0(nn.Module):
    def __init__(self, widese=False):
        super().__init__()
        feats = [_cna(3, 32, 3, 2)]
        cin = 32
        for e, k, s, c, r in B0_STAGES:
            blocks = []
            for b in range(r):
                blocks.append(MBConv(cin, c, e, k, s if b == 0 else 1, widese=widese))
                cin = c
            feats.append(nn.Sequential(*blocks))
        feats.append(_cna(cin, 1280, 1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean((2, 3))  # (B, 1280)


class ViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        qkv = self.attn.qkv(self.norm1(x)).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1) * (d // h) ** -0.5).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(out)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class DinoViT(nn.Module):
    """DINO ViT with timm state-dict naming; image size == pos-embed grid."""

    def __init__(self, img_size=32, patch=8, dim=64, depth=2, heads=2):
        super().__init__()
        n = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim).normal_(0, 0.02))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim).normal_(0, 0.02))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.blocks = nn.ModuleList([ViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        feat = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B, N, D)
        cls = self.cls_token.expand(b, -1, -1)
        feat = torch.cat([cls, feat], dim=1) + self.pos_embed
        for blk in self.blocks:
            feat = blk(feat)
        return self.norm(feat)[:, 0]
