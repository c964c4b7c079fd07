"""Int8 post-training-quantized ResNet50 feature extractor (inference path).

The frozen RetCCL/CLAM backbones (``models/resnet.py``) dominate the end-to-end
slide latency: a 40,960-patch slide is 40960 x 8.2 GFLOPs = 336 TFLOPs of conv
work, which caps bf16 (197 TFLOP/s peak) at ~1.7 s/slide no matter the
implementation. The v5e int8 MXU path doubles the ceiling.

Design (everything stays in the quantized domain end to end):

- BN folds into per-channel conv scale/bias; weights quantize per-output-channel
  symmetric int8; activations are ReLU outputs everywhere post-stem, so they
  quantize ASYMMETRICALLY to the full int8 range with zero point -128 (8
  effective bits; the zero-point term folds into the bias - see
  ``ops/quantization.zero_point_bias``).
- Every conv epilogue is ONE folded per-channel fma on the int32 accumulator:
  ``q_next = clip(round(acc * m + z), -128, 127)`` where ``m = s_in*s_w/s_next``
  and ``z`` absorbs the BN bias, the zero-point correction, and the -128 shift.
  The ReLU is FREE: relu output 0 maps exactly to code -128, which is the clip's
  lower bound. Measured on-chip: 356 TOPS for a composed bottleneck vs 234 with
  a separate f32 dequant->relu->requant chain (BENCHMARKS.md).
- Residual adds happen in the same folded domain: the identity path contributes
  ``id_q * (s_id/s_out)`` (one extra int8-read fma), the downsample path
  contributes its own folded accumulator.
- 3x3 convs pad explicitly with -128 (the zero-point code for x=0); XLA's
  implicit SAME padding would inject q=0 == x=128*s.
- The stem (7x7, 3 input channels - MXU-hostile either way, ~3% of FLOPs) runs
  bf16 with f32 accumulation.

Accuracy: feature cosine vs the fp32 model 0.9999 on a random-init net
(``tests/test_int8_resnet.py``); trained nets quantize better still.

Ref architecture: ``code/models/ResNet.py:119-399`` (RetCCL resnet50, feature
mode), ``code/utils/custom_resnet50.py`` (layer3-truncated baseline).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.ops.quantization import (
    fold_bn,
    quantize_act_relu,
    quantize_weight,
    zero_point_bias,
)

LAYERS_R50 = (3, 4, 6, 3)
PLANES = (64, 128, 256, 512)
STRIDES = (1, 2, 2, 2)
EXPANSION = 4


def _block_plan(truncate_after: int = 4):
    """Yields (name, stride, has_downsample) for every bottleneck block."""
    in_planes = 64
    for stage in range(truncate_after):
        p, s = PLANES[stage], STRIDES[stage]
        for b in range(LAYERS_R50[stage]):
            stride = s if b == 0 else 1
            has_ds = b == 0 and (stride != 1 or in_planes != p * EXPANSION)
            yield f"layer{stage + 1}_{b}", stride, has_ds
            in_planes = p * EXPANSION


def _fold_all(variables: dict, truncate_after: int) -> dict:
    """{key: (folded_kernel f64, folded_bias f64)} for stem + every block conv."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold(conv_tree, bn_p, bn_s):
        return fold_bn(
            np.asarray(conv_tree["kernel"], np.float64),
            np.asarray(bn_p["scale"], np.float64),
            np.asarray(bn_p["bias"], np.float64),
            np.asarray(bn_s["mean"], np.float64),
            np.asarray(bn_s["var"], np.float64),
        )

    folded = {"conv1": fold(params["conv1"], params["bn1"], stats["bn1"])}
    for name, _, has_ds in _block_plan(truncate_after):
        bp, bs = params[name], stats[name]
        for i in (1, 2, 3):
            folded[f"{name}.conv{i}"] = fold(bp[f"conv{i}"], bp[f"bn{i}"], bs[f"bn{i}"])
        if has_ds:
            folded[f"{name}.downsample"] = fold(
                bp["downsample_conv"], bp["downsample_bn"], bs["downsample_bn"]
            )
    return folded


def _conv_f32(x, kernel, bias, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + jnp.asarray(bias, jnp.float32)


def _stem(x, kernel, bias):
    """bf16 stem conv + relu + 3x3/2 maxpool; f32 output."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), (2, 2),
        [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = jax.nn.relu(out + bias)
    return jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _calibrate(folded: dict, tiles: np.ndarray, truncate_after: int) -> dict:
    """f32 forward with folded weights, recording max|x| per conv input (plus
    the final block output under key 'final')."""
    record: dict[str, float] = {}

    def note(key, x):
        record[key] = float(jnp.max(jnp.abs(x)))
        return x

    x = jnp.asarray(tiles, jnp.float32)
    record["input"] = float(jnp.max(jnp.abs(x)))
    out = _stem(x, jnp.asarray(folded["conv1"][0], jnp.float32),
                jnp.asarray(folded["conv1"][1], jnp.float32))
    for name, stride, has_ds in _block_plan(truncate_after):
        identity = out
        note(f"{name}.conv1", out)
        h = jax.nn.relu(_conv_f32(out, *folded[f"{name}.conv1"]))
        note(f"{name}.conv2", h)
        h = jax.nn.relu(_conv_f32(h, *folded[f"{name}.conv2"], stride))
        note(f"{name}.conv3", h)
        h = _conv_f32(h, *folded[f"{name}.conv3"])
        if has_ds:
            identity = _conv_f32(out, *folded[f"{name}.downsample"], stride)
        out = jax.nn.relu(h + identity)
    note("final", out)
    return record


class QBlock(NamedTuple):
    """One bottleneck with every scale folded into per-channel fma constants."""

    w1: jax.Array  # int8 (1,1,Cin,Mid)
    m1: jax.Array  # (Mid,) f32: s_in1*s_w1 / s_in2
    z1: jax.Array  # (Mid,) f32: bias'/s_in2 - 128
    w2: jax.Array  # int8 (3,3,Mid,Mid)
    m2: jax.Array
    z2: jax.Array
    w3: jax.Array  # int8 (1,1,Mid,Cout)
    m3: jax.Array  # (Cout,) f32: s_in3*s_w3 / s_out
    z3: jax.Array  # (Cout,) f32: combined conv3+identity bias in out units, -128
    wd: Optional[jax.Array]  # int8 downsample kernel or None
    md: Optional[jax.Array]  # (Cout,) or None
    id_mult: jax.Array  # () f32: s_id/s_out (identity fma; unused when wd set)


class QResNet50(NamedTuple):
    stem_w: jax.Array  # int8 (4,4,12,64): space-to-depth folded 7x7/s2 stem
    stem_m: jax.Array  # (64,) f32 folded fma multiplier
    stem_z: jax.Array  # (64,) f32 folded fma bias (-128-shifted)
    input_scale: jax.Array  # () f32: symmetric input quantization scale
    blocks: tuple  # tuple[QBlock, ...]
    final_scale: jax.Array  # () f32: dequant scale for the pooled features
    truncate_after: int
    feature_dim: int


jax.tree_util.register_pytree_node(
    QBlock, lambda b: (tuple(b), None), lambda _, c: QBlock(*c)
)
jax.tree_util.register_pytree_node(
    QResNet50,
    lambda q: (
        (q.stem_w, q.stem_m, q.stem_z, q.input_scale, q.blocks, q.final_scale),
        (q.truncate_after, q.feature_dim),
    ),
    lambda aux, c: QResNet50(*c, aux[0], aux[1]),
)


def build_qresnet50(
    variables: dict, calib_tiles: np.ndarray, truncate_after: int = 4
) -> QResNet50:
    """variables: the fp32 ResNet50 {'params','batch_stats'} (e.g. converted from
    ``retccl_best_ckpt.pth``); calib_tiles: (N, 224, 224, 3) representative tiles
    for activation-scale calibration (N=64-256 is plenty)."""
    folded = _fold_all(variables, truncate_after)
    record = _calibrate(folded, calib_tiles, truncate_after)

    def act_scale(key: str) -> float:
        return max(record[key], 1e-12) / 255.0

    plan = list(_block_plan(truncate_after))
    blocks: list[QBlock] = []
    for i, (name, stride, has_ds) in enumerate(plan):
        s_in1 = act_scale(f"{name}.conv1")
        s_in2 = act_scale(f"{name}.conv2")
        s_in3 = act_scale(f"{name}.conv3")
        s_out = (
            act_scale(f"{plan[i + 1][0]}.conv1") if i + 1 < len(plan) else act_scale("final")
        )

        def qc(key, s_in):
            k, b = folded[key]
            w_q, s_w = quantize_weight(np.asarray(k, np.float32))
            bias_eff = np.asarray(b, np.float64) + zero_point_bias(w_q, s_in, s_w)
            return w_q, s_in * s_w.astype(np.float64), bias_eff

        w1, sk1, b1 = qc(f"{name}.conv1", s_in1)
        w2, sk2, b2 = qc(f"{name}.conv2", s_in2)
        w3, sk3, b3 = qc(f"{name}.conv3", s_in3)

        z3 = b3 / s_out - 128.0
        if has_ds:
            wd, skd, bd = qc(f"{name}.downsample", s_in1)
            md = jnp.asarray(skd / s_out, jnp.float32)
            wd = jnp.asarray(wd)
            z3 = z3 + bd / s_out
            id_mult = np.float64(0.0)
        else:
            wd = md = None
            # identity q (zero point -128): y_id = (id_q + 128) * s_in1
            id_mult = s_in1 / s_out
            z3 = z3 + 128.0 * id_mult

        blocks.append(QBlock(
            w1=jnp.asarray(w1), m1=jnp.asarray(sk1 / s_in2, jnp.float32),
            z1=jnp.asarray(b1 / s_in2 - 128.0, jnp.float32),
            w2=jnp.asarray(w2), m2=jnp.asarray(sk2 / s_in3, jnp.float32),
            z2=jnp.asarray(b2 / s_in3 - 128.0, jnp.float32),
            w3=jnp.asarray(w3), m3=jnp.asarray(sk3 / s_out, jnp.float32),
            z3=jnp.asarray(z3, jnp.float32),
            wd=wd, md=md,
            id_mult=jnp.asarray(id_mult, jnp.float32),
        ))

    # Stem as a space-to-depth int8 conv: the 7x7/s2 conv on (224,224,3) is
    # exactly a 4x4/s1 conv on the s2d-by-2 input (112,112,12) with the kernel
    # zero-padded to 8x8 at the top-left (receptive fields start at odd rows)
    # and reshaped to match the (di, dj, ci) channel packing. 3-input-channel
    # convs are MXU-hostile (K=27); s2d lifts K to 192. Inputs quantize
    # SYMMETRICALLY (images, not relu outputs) so implicit zero padding and
    # the s2d reshape stay exact. The stem epilogue requantizes straight to
    # the first block's input scale; maxpool then runs on int8 codes
    # (order-preserving, and max(post-pool) == max(pre-pool) since stride-2
    # size-3 windows cover every position - the calibrated scale transfers).
    stem_k, stem_b = folded["conv1"]
    k8 = np.zeros((8, 8, 3, 64))
    k8[1:, 1:] = np.asarray(stem_k)
    k_s2d = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)
    stem_wq, stem_sw = quantize_weight(np.asarray(k_s2d, np.float32))
    s_inp = max(record["input"], 1e-12) / 127.0
    s_block1 = act_scale(f"{plan[0][0]}.conv1")
    return QResNet50(
        stem_w=jnp.asarray(stem_wq),
        stem_m=jnp.asarray(s_inp * stem_sw.astype(np.float64) / s_block1, jnp.float32),
        stem_z=jnp.asarray(np.asarray(stem_b, np.float64) / s_block1 - 128.0, jnp.float32),
        input_scale=jnp.asarray(s_inp, jnp.float32),
        blocks=tuple(blocks),
        final_scale=jnp.asarray(act_scale("final"), jnp.float32),
        truncate_after=truncate_after,
        feature_dim=PLANES[truncate_after - 1] * EXPANSION,
    )


class QResNet50Fused(NamedTuple):
    """``QResNet50`` plus the W-pair-packed stage1 weights the fused Pallas
    path needs (packing is numpy work — done once here, outside jit)."""

    q: QResNet50
    stage1_packed: tuple  # tuple[QBlock, ...] from pack_wpair_block


jax.tree_util.register_pytree_node(
    QResNet50Fused,
    lambda p: ((p.q, p.stage1_packed), None),
    lambda _, c: QResNet50Fused(*c),
)

# ResNet50 block-index boundaries: layer1 = blocks[0:3] (all stride 1),
# layer{2,3,4} = one stride-2 entry + stride-1 interiors.
_STAGE_SLICES = ((0, 3), (3, 7), (7, 13), (13, 16))


def prepare_qresnet50_fused(q: QResNet50) -> QResNet50Fused:
    from transmil_deepgraft_tpu.ops.pallas.qstage_kernel import pack_wpair_block

    if q.truncate_after != 4:
        raise ValueError("fused path currently supports the full 4-stage net")
    s1 = tuple(pack_wpair_block(b) for b in q.blocks[0:3])
    return QResNet50Fused(q=q, stage1_packed=s1)


def apply_qresnet50_fused(
    prep: QResNet50Fused,
    tiles: jax.Array,
    *,
    t_cfg: tuple = (1, 2, 4, 4, 4, 4, 4),
    interpret: bool | None = None,
) -> jax.Array:
    """Fused-Pallas int8 forward: identical folded-fma numerics to
    ``apply_qresnet50`` (bit-exact, see tests/test_qstage_kernel.py) with the
    per-stage HBM round-trips eliminated:

    - stage1 runs W-pair-packed (free (56,56,64)->(56,28,128) reshape) so its
      MXU-hostile C=64 matmuls become lane-aligned block-diagonal K,N>=128;
    - each stage entry (stride-2 + downsample) reads its big input ONCE;
    - each stride-1 interior run executes per-tile entirely in VMEM.

    ``t_cfg`` = tiles-per-grid-step for (s1, e2, i2, e3, i3, e4, i4); each must
    divide the batch. A ``0`` entry routes THAT segment through the XLA block
    loop instead (mixed composition — lets benchmarking pick fused kernels
    only where they beat XLA). Ref semantics:
    ``/root/reference/code/models/ResNet.py:119-399`` eval mode.
    """
    from transmil_deepgraft_tpu.ops.pallas.qstage_kernel import (
        fused_bottleneck_stage,
        fused_entry_block,
        fused_stage_wpacked,
    )

    def xla_blocks(x, blocks, strides):
        for blk, s in zip(blocks, strides):
            h = _rq(_conv_q(x, blk.w1), blk.m1, blk.z1)
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
            h = _rq(_conv_q(h, blk.w2, s, padding="VALID"), blk.m2, blk.z2)
            acc3 = _conv_q(h, blk.w3).astype(jnp.float32) * blk.m3
            if blk.wd is not None:
                idn = _conv_q(x, blk.wd, s).astype(jnp.float32) * blk.md
            else:
                idn = x.astype(jnp.float32) * blk.id_mult
            x = jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)
        return x

    q = prep.q
    t1, te2, ti2, te3, ti3, te4, ti4 = t_cfg
    n, hh, ww, _ = tiles.shape
    x_q = jnp.clip(
        jnp.round(tiles.astype(jnp.float32) / q.input_scale), -127, 127
    ).astype(jnp.int8)
    x_q = x_q.reshape(n, hh // 2, 2, ww // 2, 2, 3)
    x_q = x_q.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 2, ww // 2, 12)
    acc = jax.lax.conv_general_dilated(
        x_q, q.stem_w, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    stem_q = _rq(acc, q.stem_m, q.stem_z)
    out = jax.lax.reduce_window(
        stem_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    if t1:
        out = fused_stage_wpacked(
            out, q.blocks[0:3], tiles_per_step=t1, interpret=interpret,
            packed_blocks=prep.stage1_packed,
        )
    else:
        out = xla_blocks(out, q.blocks[0:3], [1, 1, 1])
    for (lo, hi), te, ti in (
        (_STAGE_SLICES[1], te2, ti2),
        (_STAGE_SLICES[2], te3, ti3),
        (_STAGE_SLICES[3], te4, ti4),
    ):
        if te:
            out = fused_entry_block(out, q.blocks[lo], tiles_per_step=te, interpret=interpret)
        else:
            out = xla_blocks(out, q.blocks[lo : lo + 1], [2])
        if ti:
            out = fused_bottleneck_stage(
                out, q.blocks[lo + 1 : hi], tiles_per_step=ti, interpret=interpret
            )
        else:
            out = xla_blocks(out, q.blocks[lo + 1 : hi], [1] * (hi - lo - 1))
    pooled = jnp.mean(out.astype(jnp.float32), axis=(1, 2)) + 128.0
    return pooled * q.final_scale


def _conv_q(x_q, w_q, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _rq(acc, m, z):
    """int32 accumulator -> next layer's int8 code: one per-channel fma + round.
    ReLU is implicit: y<=0 lands at/below code -128 == the clip floor."""
    return jnp.clip(jnp.round(acc.astype(jnp.float32) * m + z), -128, 127).astype(jnp.int8)


def apply_qresnet50_wpack1(prep: QResNet50Fused, tiles: jax.Array) -> jax.Array:
    """``apply_qresnet50`` with stage1 on the W-pair-packed grid (XLA convs,
    lane-aligned shapes; see ``apply_stage_wpacked_xla``). Bit-exact."""
    q = prep.q
    n, hh, ww, _ = tiles.shape
    x_q = jnp.clip(
        jnp.round(tiles.astype(jnp.float32) / q.input_scale), -127, 127
    ).astype(jnp.int8)
    x_q = x_q.reshape(n, hh // 2, 2, ww // 2, 2, 3)
    x_q = x_q.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 2, ww // 2, 12)
    acc = jax.lax.conv_general_dilated(
        x_q, q.stem_w, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    stem_q = _rq(acc, q.stem_m, q.stem_z)
    out = jax.lax.reduce_window(
        stem_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    out = apply_stage_wpacked_xla(out, prep.stage1_packed)
    plan = list(_block_plan(q.truncate_after))
    for blk, (_, stride, has_ds) in zip(q.blocks[3:], plan[3:]):
        h = _rq(_conv_q(out, blk.w1), blk.m1, blk.z1)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
        h = _rq(_conv_q(h, blk.w2, stride, padding="VALID"), blk.m2, blk.z2)
        acc3 = _conv_q(h, blk.w3).astype(jnp.float32) * blk.m3
        if has_ds:
            idn = _conv_q(out, blk.wd, stride).astype(jnp.float32) * blk.md
        else:
            idn = out.astype(jnp.float32) * blk.id_mult
        out = jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)
    pooled = jnp.mean(out.astype(jnp.float32), axis=(1, 2)) + 128.0
    return pooled * q.final_scale


def apply_stage_wpacked_xla(x_q: jax.Array, packed_blocks) -> jax.Array:
    """Stride-1 stage on the W-pair-packed grid via XLA convs.

    Same numerics as the per-block XLA loop (bit-exact; integer dots + the
    identical folded f32 fma), but every matmul is lane-aligned: the free
    (N, H, W, C) -> (N, H, W/2, 2C) reshape + parity-packed weights
    (``ops/pallas/qstage_kernel.pack_wpair_block``) turn stage1's MXU-hostile
    C=64 convs into K,N >= 128 shapes while keeping XLA's conv pipeline.
    The packed 3x3 kernel runs as a DENSE (3,3,2C,2C) conv (the parity
    structure lives inside the weights)."""
    n, hh, ww, cin = x_q.shape
    out = x_q.reshape(n, hh, ww // 2, 2 * cin)
    for blk in packed_blocks:
        h = _rq(_conv_q(out, blk.w1), blk.m1, blk.z1)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
        h = _rq(_conv_q(h, blk.w2, 1, padding="VALID"), blk.m2, blk.z2)
        acc3 = _conv_q(h, blk.w3).astype(jnp.float32) * blk.m3
        if blk.wd is not None:
            idn = _conv_q(out, blk.wd).astype(jnp.float32) * blk.md
        else:
            idn = out.astype(jnp.float32) * blk.id_mult
        out = jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)
    return out.reshape(n, hh, ww, out.shape[-1] // 2)


class BF16Stage1(NamedTuple):
    """Folded bf16 stem+stage1 for the mixed-precision backbone variant.

    Motivation (BENCHMARKS.md stage budget): stem+stage1 is MXU-SHAPE-bound
    at C=64 — int8 only reaches ~23% of int8 peak there, so the 2x
    precision speedup never materializes; bf16 runs the same shapes at a
    higher fraction of its (halved) peak. Stages 2-4 stay int8 (~90-107% of
    peak). The stage1 output quantizes ONCE into the exact int8 code
    stage2 expects (same calibrated scale as ``build_qresnet50``), so
    stages 2-4 are bit-identical to the full-int8 path given the same
    stage2 input codes — and stage1 itself is MORE accurate than int8."""

    stem_k: jax.Array  # bf16 (7,7,3,64) BN-folded stem kernel
    stem_b: jax.Array  # (64,) f32
    convs: tuple  # per stage1 block: (k1,b1,k2,b2,k3,b3[,kd,bd])
    out_scale: jax.Array  # () f32: s(layer2_0.conv1) — stage2's input scale


jax.tree_util.register_pytree_node(
    BF16Stage1,
    lambda s: ((s.stem_k, s.stem_b, s.convs, s.out_scale), None),
    lambda _, c: BF16Stage1(*c),
)


def build_bf16_stage1(variables: dict, calib_tiles: np.ndarray) -> BF16Stage1:
    """Companion to ``build_qresnet50`` (SAME calib tiles → identical stage2
    input scale)."""
    folded = _fold_all(variables, 4)
    record = _calibrate(folded, calib_tiles, 4)
    s_out = max(record["layer2_0.conv1"], 1e-12) / 255.0
    convs = []
    for i in range(3):
        name = f"layer1_{i}"
        parts = []
        for conv in ("conv1", "conv2", "conv3"):
            k, b = folded[f"{name}.{conv}"]
            parts += [jnp.asarray(np.asarray(k), jnp.bfloat16),
                      jnp.asarray(np.asarray(b), jnp.float32)]
        if f"{name}.downsample" in folded:
            kd, bd = folded[f"{name}.downsample"]
            parts += [jnp.asarray(np.asarray(kd), jnp.bfloat16),
                      jnp.asarray(np.asarray(bd), jnp.float32)]
        convs.append(tuple(parts))
    k, b = folded["conv1"]
    return BF16Stage1(
        stem_k=jnp.asarray(np.asarray(k), jnp.bfloat16),
        stem_b=jnp.asarray(np.asarray(b), jnp.float32),
        convs=tuple(convs),
        out_scale=jnp.asarray(s_out, jnp.float32),
    )


def _conv_bf16(x, k, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def apply_qresnet50_bf16s1(q: QResNet50, s1: BF16Stage1, tiles: jax.Array) -> jax.Array:
    """Mixed-precision forward: bf16 stem+stage1, int8 stages 2-4."""
    h = jax.lax.conv_general_dilated(
        tiles.astype(jnp.bfloat16), s1.stem_k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    h = jax.nn.relu(h + s1.stem_b)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for parts in s1.convs:
        k1, b1, k2, b2, k3, b3 = parts[:6]
        y = jax.nn.relu(_conv_bf16(h, k1) + b1)
        y = jax.nn.relu(_conv_bf16(y, k2) + b2)
        y = _conv_bf16(y, k3) + b3
        if len(parts) == 8:
            idn = _conv_bf16(h, parts[6]) + parts[7]
        else:
            idn = h
        h = jax.nn.relu(y + idn)
    # one quantization into stage2's exact input code (zero point -128)
    out_q = jnp.clip(jnp.round(h / s1.out_scale) - 128.0, -128, 127).astype(jnp.int8)
    plan = list(_block_plan(q.truncate_after))
    for blk, (_, stride, has_ds) in zip(q.blocks[3:], plan[3:]):
        hh = _rq(_conv_q(out_q, blk.w1), blk.m1, blk.z1)
        hh = jnp.pad(hh, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
        hh = _rq(_conv_q(hh, blk.w2, stride, padding="VALID"), blk.m2, blk.z2)
        acc3 = _conv_q(hh, blk.w3).astype(jnp.float32) * blk.m3
        if has_ds:
            idn = _conv_q(out_q, blk.wd, stride).astype(jnp.float32) * blk.md
        else:
            idn = out_q.astype(jnp.float32) * blk.id_mult
        out_q = jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)
    pooled = jnp.mean(out_q.astype(jnp.float32), axis=(1, 2)) + 128.0
    return pooled * q.final_scale


def apply_qresnet50(q: QResNet50, tiles: jax.Array) -> jax.Array:
    """tiles (N, H, W, 3) f32/bf16 (H, W even) -> features (N, feature_dim) f32."""
    n, hh, ww, _ = tiles.shape
    x_q = jnp.clip(
        jnp.round(tiles.astype(jnp.float32) / q.input_scale), -127, 127
    ).astype(jnp.int8)
    # space-to-depth by 2: (N, H, W, 3) -> (N, H/2, W/2, 12), channel (di,dj,ci)
    x_q = x_q.reshape(n, hh // 2, 2, ww // 2, 2, 3)
    x_q = x_q.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 2, ww // 2, 12)
    acc = jax.lax.conv_general_dilated(
        x_q, q.stem_w, (1, 1), [(2, 1), (2, 1)],  # implicit 0-pad exact: symmetric quant
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    stem_q = _rq(acc, q.stem_m, q.stem_z)  # relu via the clip floor
    out_q = jax.lax.reduce_window(
        stem_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    plan = list(_block_plan(q.truncate_after))
    for blk, (_, stride, has_ds) in zip(q.blocks, plan):
        h = _rq(_conv_q(out_q, blk.w1), blk.m1, blk.z1)
        # explicit -128 pad: implicit SAME padding would inject q=0 == x=128*s
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
        h = _rq(_conv_q(h, blk.w2, stride, padding="VALID"), blk.m2, blk.z2)
        acc3 = _conv_q(h, blk.w3).astype(jnp.float32) * blk.m3
        if has_ds:
            idn = _conv_q(out_q, blk.wd, stride).astype(jnp.float32) * blk.md
        else:
            idn = out_q.astype(jnp.float32) * blk.id_mult
        out_q = jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)
    # dequantized global average pool: mean((q+128) * s)
    pooled = jnp.mean(out_q.astype(jnp.float32), axis=(1, 2)) + 128.0
    return pooled * q.final_scale
