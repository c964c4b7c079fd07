"""Fused int8 bottleneck-stage kernel: a run of ResNet blocks per tile in VMEM.

Profiling the int8 PTQ backbone (BENCHMARKS.md) shows stage1 running at
~70 TOPS (18% of the 394 TOPS int8 peak) and stage2 at ~153 TOPS while
stage3/4 sit near peak. The early stages are HBM-bandwidth-bound: XLA
materializes every 56x56 activation between convs, so each bottleneck block
moves ~4 MB/tile through HBM for ~11 MFLOPs/KB of work. This kernel runs an
entire run of stride-1 bottleneck blocks for one image tile INSIDE VMEM
(~1 MB working set vs 16 MB VMEM): HBM traffic drops to one input read plus
one output write per tile, and the MXU sees back-to-back int8 matmuls.

Everything stays in the quantized domain exactly as ``models/resnet_int8``:
per-conv folded fma requant (``q = clip(round(acc*m + z))``, ReLU free via the
clip floor), explicit -128 padding for the 3x3 convs, residuals in the folded
domain. The 3x3 conv is materialized im2col in VMEM ((di, dj, ci) column
order matching the HWIO kernel reshape) so the contraction dim is 9*Cmid --
full MXU K-occupancy even at stage1's 64 channels.

Restrictions (by design): every block stride 1; a downsample projection is
allowed only when stride 1 (stage1 block0). Stage-entry stride-2 blocks stay
on the XLA path -- they read the previous stage's resolution once and are not
the bandwidth problem.

Ref: the quantized forward semantics mirror ``models/resnet_int8.apply_qresnet50``
(itself from ``/root/reference/code/models/ResNet.py:119-399`` eval mode).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _requant(acc_i32, sc):
    """int32 accumulator -> next int8 code; sc is (2, C): [m; z]."""
    m = sc[0:1, :]
    z = sc[1:2, :]
    y = acc_i32.astype(jnp.float32) * m + z
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def _dot_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _stage_kernel(x_ref, *refs, meta):
    """refs = per-block (w1, sc1, w2im, sc2, w3, sc3[, wd, md | idm]) + (o_ref,)."""
    t, hh, ww = meta["tiles"], meta["h"], meta["w"]
    o_ref = refs[-1]
    refs = refs[:-1]
    m_rows = t * hh * ww

    x = x_ref[...]
    cur = x.reshape(m_rows, x.shape[-1])
    pos = 0
    for has_ds in meta["plan"]:
        w1, sc1, w2, sc2, w3, sc3 = refs[pos : pos + 6]
        pos += 6
        cmid = w1.shape[-1]

        h = _requant(_dot_i8(cur, w1[...]), sc1[...])

        hs = h.reshape(t, hh, ww, cmid)
        hp = jnp.pad(
            hs, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(-128)
        )
        # 3x3 conv as 3 accumulated K=3*Cmid dots (one per di row-tap): peak
        # VMEM is one (M, 3C) im2col slab + the i32 accumulator, ~3x less
        # than materializing the full (M, 9C) im2col
        acc2 = None
        for di in range(3):
            cols = jnp.concatenate(
                [
                    hp[:, di : di + hh, dj : dj + ww, :].reshape(m_rows, cmid)
                    for dj in range(3)
                ],
                axis=1,
            )
            part = _dot_i8(cols, w2[di * 3 * cmid : (di + 1) * 3 * cmid, :])
            acc2 = part if acc2 is None else acc2 + part
        h2 = _requant(acc2, sc2[...])

        acc3 = _dot_i8(h2, w3[...]).astype(jnp.float32) * sc3[0:1, :]
        if has_ds:
            wd, md = refs[pos : pos + 2]
            pos += 2
            idn = _dot_i8(cur, wd[...]).astype(jnp.float32) * md[0:1, :]
        else:
            idm = refs[pos]
            pos += 1
            idn = cur.astype(jnp.float32) * idm[0, 0]
        cur = jnp.clip(jnp.round(acc3 + idn + sc3[1:2, :]), -128, 127).astype(
            jnp.int8
        )

    o_ref[...] = cur.reshape(t, hh, ww, cur.shape[-1])


def _pack_block(blk) -> tuple[list, bool]:
    """QBlock -> (kernel arrays, has_ds). jnp ops only: blocks may be traced
    (the whole fused net is typically called under an outer jit)."""
    w1 = jnp.reshape(blk.w1, (blk.w1.shape[-2], blk.w1.shape[-1]))
    w2 = jnp.reshape(blk.w2, (-1, blk.w2.shape[-1]))  # (9*Cmid, Cmid)
    w3 = jnp.reshape(blk.w3, (blk.w3.shape[-2], blk.w3.shape[-1]))
    sc1 = jnp.stack([blk.m1, blk.z1])
    sc2 = jnp.stack([blk.m2, blk.z2])
    sc3 = jnp.stack([blk.m3, blk.z3])
    arrays = [w1, sc1, w2, sc2, w3, sc3]
    if blk.wd is not None:
        wd = jnp.reshape(blk.wd, (blk.wd.shape[-2], blk.wd.shape[-1]))
        arrays += [wd, jnp.reshape(blk.md, (1, -1))]
        has_ds = True
    else:
        arrays += [jnp.reshape(jnp.asarray(blk.id_mult, jnp.float32), (1, 1))]
        has_ds = False
    return arrays, has_ds


@functools.partial(
    jax.jit, static_argnames=("meta_static", "tiles_per_step", "interpret")
)
def _run(x_q, flat, *, meta_static, tiles_per_step, interpret):
    n, hh, ww, cin = x_q.shape
    plan = meta_static
    pos, cout = 0, cin
    for has_ds in plan:
        cout = flat[pos + 4].shape[-1]  # this block's w3 output width
        pos += 8 if has_ds else 7

    t = tiles_per_step
    grid = (n // t,)
    kernel = functools.partial(
        _stage_kernel, meta={"tiles": t, "h": hh, "w": ww, "plan": plan}
    )
    in_specs = [
        pl.BlockSpec(
            (t, hh, ww, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    for arr in flat:
        in_specs.append(
            pl.BlockSpec(
                arr.shape,
                lambda i, _nd=arr.ndim: (0,) * _nd,
                memory_space=pltpu.VMEM,
            )
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, cout), jnp.int8),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (t, hh, ww, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_q, *flat)


def pack_wpair_block(blk):
    """Re-express a QBlock on the W-pair-packed grid: (T, H, W, C) viewed as
    (T, H, W/2, 2C) — a FREE reshape (C minor, W next) — with weights rebuilt
    so every matmul runs at lane-aligned K, N >= 128.

    Stage1's C=64 half-fills int8 lane tiles (native (32, 128)) and its N=64
    matmuls cap at ~89-200 TOPS (BENCHMARKS.md dot ceilings). Packing pairs of
    W-pixels into lanes makes the 1x1 convs block-diagonal over parity
    ((2C, 2Cmid), 2x FLOPs at the 336-TOPS K128/N128 rate => ~168 effective)
    and maps the 3x3 conv onto the SAME 3x3 im2col over the packed grid:
    output parity pi_out at packed col p reads original cols 2p+pi_out+d-1,
    d in 0..2  =>  packed tap offset floor((pi_out+d-1)/2) in {-1,0,1} with
    input parity (pi_out+d-1) mod 2. Unused (tap, parity) slots get weight 0,
    so the -128 pad code and the folded zero-point bias stay exact.
    """
    from transmil_deepgraft_tpu.models.resnet_int8 import QBlock

    def diag2(w):  # (1,1,Cin,Cout) -> (1,1,2Cin,2Cout) parity-block-diagonal
        ci, co = w.shape[-2], w.shape[-1]
        out = np.zeros((1, 1, 2 * ci, 2 * co), np.int8)
        w = np.asarray(w).reshape(ci, co)
        out[0, 0, :ci, :co] = w
        out[0, 0, ci:, co:] = w
        return out

    def pair2(v):
        return np.tile(np.asarray(v), 2)

    w2 = np.asarray(blk.w2)  # (3, 3, Cmid, Cmid)
    c = w2.shape[-2]
    w2p = np.zeros((3, 3, 2 * c, 2 * c), np.int8)
    for pi_out in range(2):
        for d in range(3):
            j = pi_out + d - 1
            dp = (j // 2) + 1  # packed tap index 0..2
            pi_in = j % 2
            w2p[:, dp, pi_in * c : (pi_in + 1) * c, pi_out * c : (pi_out + 1) * c] = w2[:, d]

    return QBlock(
        w1=jnp.asarray(diag2(blk.w1)), m1=jnp.asarray(pair2(blk.m1)),
        z1=jnp.asarray(pair2(blk.z1)),
        w2=jnp.asarray(w2p), m2=jnp.asarray(pair2(blk.m2)),
        z2=jnp.asarray(pair2(blk.z2)),
        w3=jnp.asarray(diag2(blk.w3)), m3=jnp.asarray(pair2(blk.m3)),
        z3=jnp.asarray(pair2(blk.z3)),
        wd=None if blk.wd is None else jnp.asarray(diag2(blk.wd)),
        md=None if blk.md is None else jnp.asarray(pair2(blk.md)),
        id_mult=blk.id_mult,
    )


def fused_stage_wpacked(
    x_q: jax.Array,
    blocks: Sequence,
    *,
    tiles_per_step: int = 1,
    interpret: bool | None = None,
    packed_blocks: Sequence | None = None,
) -> jax.Array:
    """``fused_bottleneck_stage`` on the W-pair-packed grid (for C=64 stages).

    x_q: (N, H, W, C) int8, W even. Pass ``packed_blocks`` (from
    ``pack_wpair_block``) to skip re-packing weights on every call.
    """
    n, hh, ww, cin = x_q.shape
    if ww % 2:
        raise ValueError(f"W={ww} must be even for W-pair packing")
    if packed_blocks is None:
        packed_blocks = [pack_wpair_block(b) for b in blocks]
    xp = x_q.reshape(n, hh, ww // 2, 2 * cin)
    out = fused_bottleneck_stage(
        xp, packed_blocks, tiles_per_step=tiles_per_step, interpret=interpret
    )
    return out.reshape(n, hh, ww, out.shape[-1] // 2)


def _take_even(x, axis):
    """x[..., ::2, ...] along ``axis`` via reshape + static slice (strided
    slices and jnp.take both hit unsupported Mosaic gathers; a static
    index lowers to slice+squeeze)."""
    n = x.shape[axis]
    shape = list(x.shape)
    shape[axis : axis + 1] = [n // 2, 2]
    return jax.lax.index_in_dim(x.reshape(shape), 0, axis + 1, keepdims=False)


def _entry_kernel(x_ref, w1, sc1, w2, sc2, w3, sc3, wd, md_z, o_ref, *, meta):
    """One stride-2 bottleneck (stage entry): conv1 at full res, 3x3/s2 im2col,
    conv3, plus the 1x1/s2 downsample projection - input read ONCE from HBM."""
    t, hh, ww = meta["tiles"], meta["h"], meta["w"]
    ho, wo = hh // 2, ww // 2
    x = x_ref[...]
    cin = x.shape[-1]
    xf = x.reshape(t * hh * ww, cin)

    cmid = w1.shape[-1]
    h = _requant(_dot_i8(xf, w1[...]), sc1[...])

    hs = h.reshape(t, hh, ww, cmid)
    hp = jnp.pad(hs, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(-128))
    m_out = t * ho * wo
    acc2 = None
    for di in range(3):  # di-split dots: ~3x lower peak VMEM than full im2col
        rows = _take_even(hp[:, di : di + hh, :, :], 1)  # (t, ho, ww+2, cmid)
        cols = jnp.concatenate(
            [
                _take_even(rows[:, :, dj : dj + ww, :], 2).reshape(m_out, cmid)
                for dj in range(3)
            ],
            axis=1,
        )
        part = _dot_i8(cols, w2[di * 3 * cmid : (di + 1) * 3 * cmid, :])
        acc2 = part if acc2 is None else acc2 + part
    h2 = _requant(acc2, sc2[...])

    acc3 = _dot_i8(h2, w3[...]).astype(jnp.float32) * sc3[0:1, :]

    xs = _take_even(_take_even(x, 1), 2).reshape(m_out, cin)
    idn = _dot_i8(xs, wd[...]).astype(jnp.float32) * md_z[0:1, :]
    out = jnp.clip(jnp.round(acc3 + idn + sc3[1:2, :]), -128, 127).astype(jnp.int8)
    o_ref[...] = out.reshape(t, ho, wo, out.shape[-1])


@functools.partial(
    jax.jit, static_argnames=("tiles_per_step", "interpret")
)
def _run_entry(x_q, flat, *, tiles_per_step, interpret):
    n, hh, ww, cin = x_q.shape
    cout = flat[4].shape[-1]
    t = tiles_per_step
    kernel = functools.partial(_entry_kernel, meta={"tiles": t, "h": hh, "w": ww})
    in_specs = [
        pl.BlockSpec((t, hh, ww, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ]
    for arr in flat:
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda i, _nd=arr.ndim: (0,) * _nd, memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        kernel,
        grid=(n // t,),
        out_shape=jax.ShapeDtypeStruct((n, hh // 2, ww // 2, cout), jnp.int8),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (t, hh // 2, ww // 2, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_q, *flat)


def fused_entry_block(
    x_q: jax.Array,
    blk,
    *,
    tiles_per_step: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused stride-2 stage-entry bottleneck (layer{2,3,4}_0): XLA reads the
    big previous-stage activation twice (conv1 + downsample) and materializes
    the full-res conv1 output in HBM; here the tile stays in VMEM throughout.
    Numerics match the XLA ``apply_qresnet50`` block (same folded-fma f32 ops).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if blk.wd is None:
        raise ValueError("entry block must carry a downsample projection")
    arrays, _ = _pack_block(blk)
    w1, sc1, w2, sc2, w3, sc3, wd, md = arrays
    if x_q.shape[0] % tiles_per_step:
        raise ValueError(
            f"N={x_q.shape[0]} not divisible by tiles_per_step={tiles_per_step}"
        )
    flat = tuple(jnp.asarray(a) for a in (w1, sc1, w2, sc2, w3, sc3, wd, md))
    return _run_entry(x_q, flat, tiles_per_step=tiles_per_step, interpret=interpret)


def fused_bottleneck_stage(
    x_q: jax.Array,
    blocks: Sequence,
    *,
    tiles_per_step: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """Run stride-1 QBlocks fused per-tile in VMEM.

    x_q: (N, H, W, Cin) int8 codes (zero point -128). Returns (N, H, W, Cout)
    int8. N must be divisible by tiles_per_step. Numerics match the XLA
    ``apply_qresnet50`` block loop (same folded-fma ops in f32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flat: list = []
    plan: list[bool] = []
    for blk in blocks:
        arrays, has_ds = _pack_block(blk)
        flat += arrays
        plan.append(has_ds)
    if x_q.shape[0] % tiles_per_step:
        raise ValueError(
            f"N={x_q.shape[0]} not divisible by tiles_per_step={tiles_per_step}"
        )
    flat = [jnp.asarray(a) for a in flat]
    return _run(
        x_q,
        tuple(flat),
        meta_static=tuple(plan),
        tiles_per_step=tiles_per_step,
        interpret=interpret,
    )
