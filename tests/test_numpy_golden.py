"""Independent pure-numpy TransMIL forward (fp64) vs the flax model.

This is a from-first-principles reimplementation of the entire TransMIL math
(fc1 MLP, duplicate-pad square, cls token, pre-norm Nystrom attention with
Newton-Schulz pinv and value depthwise residual, PPEG multi-scale depthwise
convs, final LN + head) sharing no code with the framework - a golden check
that the flax model and the numpy math agree, not just that two copies of the
same code agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import TransMIL

HEADS = 8


def _gelu(x):
    # erf-form GELU: torch nn.GELU() default, which the reference uses throughout.
    # (The flax models pass approximate=False to match.)
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _pinv(a, iters=6):
    abs_a = np.abs(a)
    z = np.swapaxes(a, -1, -2) / (abs_a.sum(-1).max() * abs_a.sum(-2).max())
    eye = np.eye(a.shape[-1])
    for _ in range(iters):
        az = a @ z
        z = 0.25 * z @ (13 * eye - az @ (15 * eye - az @ (7 * eye - az)))
    return z


def _nystrom_layer(x, p, m=256):
    """Pre-norm Nystrom attention block; x (n, dim); p = layer params."""
    n, dim = x.shape
    h = HEADS
    dh = dim // h
    normed = _layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])

    pad = (m - n % m) % m
    xp = np.concatenate([np.zeros((pad, dim)), normed], 0)  # front zero-pad
    np_len = xp.shape[0]

    qkv = xp @ p["attn"]["to_qkv"]["kernel"]  # (np, 3*dim)
    qkv = qkv.reshape(np_len, 3, h, dh)
    q = qkv[:, 0].transpose(1, 0, 2) * dh**-0.5  # (h, np, dh)
    k = qkv[:, 1].transpose(1, 0, 2)
    v = qkv[:, 2].transpose(1, 0, 2)

    seg = np_len // m
    q_lm = q.reshape(h, m, seg, dh).mean(2)
    k_lm = k.reshape(h, m, seg, dh).mean(2)

    attn1 = _softmax(np.einsum("hnd,hmd->hnm", q, k_lm))
    attn2 = _softmax(np.einsum("hmd,hld->hml", q_lm, k_lm))
    attn3 = _softmax(np.einsum("hmd,hnd->hmn", q_lm, k))
    out = attn1 @ _pinv(attn2) @ (attn3 @ v)  # (h, np, dh)

    # depthwise (33,) residual conv on v per head
    ks = 33
    w = p["attn"]["res_conv"]  # (33, h)
    vpad = np.concatenate([np.zeros((h, ks // 2, dh)), v, np.zeros((h, ks // 2, dh))], 1)
    res = np.zeros_like(v)
    for t in range(ks):
        res += vpad[:, t : t + np_len] * w[t][:, None, None]
    out = out + res

    out = out.transpose(1, 0, 2).reshape(np_len, dim)
    out = out @ p["attn"]["to_out"]["kernel"] + p["attn"]["to_out"]["bias"]
    out = out[-n:]  # strip front pad
    return x + out


def _ppeg(x, p, side):
    """cls bypass; identity + depthwise 7/5/3 convs on the side x side grid."""
    cls_tok, feat = x[:1], x[1:]
    dim = x.shape[1]
    grid = feat.reshape(side, side, dim)
    out = grid.copy()
    for name, ks in (("proj", 7), ("proj1", 5), ("proj2", 3)):
        w = p[name][..., 0, :]  # (ks, ks, dim)
        b = p[f"{name}_bias"]
        padded = np.zeros((side + ks - 1, side + ks - 1, dim))
        off = ks // 2
        padded[off : off + side, off : off + side] = grid
        conv = np.zeros_like(grid)
        for dy in range(ks):
            for dx in range(ks):
                conv += padded[dy : dy + side, dx : dx + side] * w[dy, dx]
        out = out + conv + b
    return np.concatenate([cls_tok, out.reshape(-1, dim)], 0)


def numpy_transmil(bag, params, n_classes, in_features):
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    h = np.asarray(bag, np.float64)

    # fc1 (384-dim variant: Linear + GELU)
    h = _gelu(h @ p["fc1_0"]["kernel"] + p["fc1_0"]["bias"])

    n = h.shape[0]
    side = int(np.ceil(np.sqrt(n)))
    add = side * side - n
    h = np.concatenate([h, h[:add]], 0)
    h = np.concatenate([p["cls_token"][0], h], 0)  # (side^2+1, dim)

    h = _nystrom_layer(h, p["layer1"])
    h = _ppeg(h, p["pos_layer"], side)
    h = _nystrom_layer(h, p["layer2"])

    cls = _layer_norm(h, p["norm"]["scale"], p["norm"]["bias"])[0]
    return cls @ p["fc"]["kernel"] + p["fc"]["bias"]


def test_numpy_golden_transmil(rng):
    n, d, c = 130, 384, 3
    model = TransMIL(n_classes=c, in_features=d)
    bag = rng.standard_normal((n, d)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(bag)[None])
    got = np.asarray(model.apply(variables, jnp.asarray(bag)[None]))[0]
    want = numpy_transmil(bag, variables["params"], c, d)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
