"""Fused int8 bottleneck kernels (ops/pallas/qstage_kernel) vs the XLA
``apply_qresnet50`` block loop — bit-exact in interpret mode.

Ref semantics: ``models/resnet_int8.apply_qresnet50`` (itself from
``/root/reference/code/models/ResNet.py:119-399`` eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.resnet_int8 import QBlock, _conv_q, _rq
from transmil_deepgraft_tpu.ops.pallas.qstage_kernel import (
    fused_bottleneck_stage,
    fused_entry_block,
)


def _rand_block(rng, cin, cmid, cout, has_ds):
    def w(*shape):
        return jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))

    def sc(c, lo=5e-3, hi=2e-2):
        return jnp.asarray(rng.uniform(lo, hi, c), jnp.float32)

    def z(c):
        return jnp.asarray(rng.uniform(-128.0, -30.0, c), jnp.float32)

    return QBlock(
        w1=w(1, 1, cin, cmid), m1=sc(cmid), z1=z(cmid),
        w2=w(3, 3, cmid, cmid), m2=sc(cmid), z2=z(cmid),
        w3=w(1, 1, cmid, cout), m3=sc(cout), z3=z(cout),
        wd=w(1, 1, cin, cout) if has_ds else None,
        md=sc(cout) if has_ds else None,
        id_mult=jnp.asarray(rng.uniform(0.5, 1.5), jnp.float32),
    )


def _xla_block(blk, x, stride=1):
    h = _rq(_conv_q(x, blk.w1), blk.m1, blk.z1)
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-128)
    h = _rq(_conv_q(h, blk.w2, stride, padding="VALID"), blk.m2, blk.z2)
    acc3 = _conv_q(h, blk.w3).astype(jnp.float32) * blk.m3
    if blk.wd is not None:
        idn = _conv_q(x, blk.wd, stride).astype(jnp.float32) * blk.md
    else:
        idn = x.astype(jnp.float32) * blk.id_mult
    return jnp.clip(jnp.round(acc3 + idn + blk.z3), -128, 127).astype(jnp.int8)


@pytest.mark.parametrize("tiles_per_step", [1, 2])
def test_interior_run_bit_exact(tiles_per_step):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (4, 8, 8, 32), dtype=np.int8))
    blocks = [
        _rand_block(rng, 32, 8, 32, has_ds=True),  # stride-1 projection (layer1_0)
        _rand_block(rng, 32, 8, 32, has_ds=False),
        _rand_block(rng, 32, 8, 32, has_ds=False),
    ]
    ref = x
    for b in blocks:
        ref = _xla_block(b, ref)
    got = fused_bottleneck_stage(x, blocks, tiles_per_step=tiles_per_step, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("tiles_per_step", [1, 3])
def test_entry_block_bit_exact(tiles_per_step):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-128, 128, (3, 10, 10, 16), dtype=np.int8))
    blk = _rand_block(rng, 16, 8, 24, has_ds=True)
    ref = _xla_block(blk, x, stride=2)
    got = fused_entry_block(x, blk, tiles_per_step=tiles_per_step, interpret=True)
    assert got.shape == (3, 5, 5, 24)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("tiles_per_step", [1, 2])
def test_wpair_packed_stage_bit_exact(tiles_per_step):
    """W-pair packing (stage1's lane-alignment trick) == the unpacked loop."""
    from transmil_deepgraft_tpu.ops.pallas.qstage_kernel import fused_stage_wpacked

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(-128, 128, (4, 6, 8, 16), dtype=np.int8))
    blocks = [
        _rand_block(rng, 16, 8, 32, has_ds=True),
        _rand_block(rng, 32, 8, 32, has_ds=False),
    ]
    ref = x
    for b in blocks:
        ref = _xla_block(b, ref)
    got = fused_stage_wpacked(x, blocks, tiles_per_step=tiles_per_step, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_wpair_pack_requires_even_w():
    from transmil_deepgraft_tpu.ops.pallas.qstage_kernel import fused_stage_wpacked

    rng = np.random.default_rng(5)
    blk = _rand_block(rng, 16, 8, 16, has_ds=False)
    x = jnp.asarray(rng.integers(-128, 128, (1, 6, 7, 16), dtype=np.int8))
    with pytest.raises(ValueError):
        fused_stage_wpacked(x, [blk], interpret=True)


def test_full_fused_qresnet_bit_exact():
    """apply_qresnet50_fused == apply_qresnet50, code for code (the fused
    kernels replay the same int32 dots and f32 folded fmas)."""
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import (
        apply_qresnet50,
        apply_qresnet50_fused,
        build_qresnet50,
        prepare_qresnet50_fused,
    )

    rng = np.random.default_rng(6)
    model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    v = jax.device_get(model.init({"params": jax.random.key(0)}, jnp.asarray(calib)))
    q = build_qresnet50(v, calib)
    prep = prepare_qresnet50_fused(q)

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(apply_qresnet50(q, x))
    got = np.asarray(
        apply_qresnet50_fused(prep, x, t_cfg=(1, 1, 2, 2, 1, 1, 2), interpret=True)
    )
    np.testing.assert_array_equal(got, ref)

    # under an OUTER jit the prep pytree is traced - the kernel packers must
    # stay traceable (regression: numpy reshape on traced weights)
    jitted = jax.jit(
        lambda p, x: apply_qresnet50_fused(p, x, t_cfg=(1, 1, 2, 2, 1, 1, 2), interpret=True)
    )
    np.testing.assert_array_equal(np.asarray(jitted(prep, x)), ref)

    # mixed composition: 0 entries route those segments through the XLA loop
    mixed = np.asarray(
        apply_qresnet50_fused(prep, x, t_cfg=(1, 0, 2, 0, 0, 1, 0), interpret=True)
    )
    np.testing.assert_array_equal(mixed, ref)
    all_xla = np.asarray(
        apply_qresnet50_fused(prep, x, t_cfg=(0,) * 7, interpret=True)
    )
    np.testing.assert_array_equal(all_xla, ref)


def test_entry_block_requires_downsample():
    rng = np.random.default_rng(2)
    blk = _rand_block(rng, 16, 8, 16, has_ds=False)
    x = jnp.asarray(rng.integers(-128, 128, (1, 8, 8, 16), dtype=np.int8))
    with pytest.raises(ValueError):
        fused_entry_block(x, blk, interpret=True)


def test_tiles_divisibility_guard():
    rng = np.random.default_rng(3)
    blk = _rand_block(rng, 16, 8, 16, has_ds=False)
    x = jnp.asarray(rng.integers(-128, 128, (3, 8, 8, 16), dtype=np.int8))
    with pytest.raises(ValueError):
        fused_bottleneck_stage(x, [blk], tiles_per_step=2, interpret=True)


def test_wpack1_xla_variant_bit_exact():
    """apply_qresnet50_wpack1 (stage1 on the packed grid via XLA convs) ==
    apply_qresnet50."""
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import (
        apply_qresnet50,
        apply_qresnet50_wpack1,
        build_qresnet50,
        prepare_qresnet50_fused,
    )

    rng = np.random.default_rng(7)
    model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    v = jax.device_get(model.init({"params": jax.random.key(0)}, jnp.asarray(calib)))
    q = build_qresnet50(v, calib)
    prep = prepare_qresnet50_fused(q)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(apply_qresnet50_wpack1(prep, x)), np.asarray(apply_qresnet50(q, x))
    )
