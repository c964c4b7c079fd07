"""Tile-parallel embed (parallel/tile_parallel.py): dp-sharded backbone
embedding is bit-exact vs single-device, composes with the sp-sharded head,
and handles non-divisible batches via padding. Runs on the 8-device CPU mesh
(conftest forces it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.parallel.mesh import make_mesh
from transmil_deepgraft_tpu.parallel.tile_parallel import (
    make_tile_parallel_embed,
    tile_parallel_slide_embed,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

TILE = 32


@pytest.fixture(scope="module")
def int8_backbone():
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import apply_qresnet50, build_qresnet50

    rng = np.random.default_rng(0)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((4, TILE, TILE, 3)).astype(np.float32)
    v = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.asarray(calib[:1])))
    q = build_qresnet50(v, calib)
    return q, apply_qresnet50


def test_dp_sharded_embed_bit_exact(int8_backbone):
    q, apply_fn = int8_backbone
    rng = np.random.default_rng(1)
    tiles = rng.standard_normal((16, TILE, TILE, 3)).astype(np.float32)

    single = np.asarray(jax.jit(apply_fn)(q, jnp.asarray(tiles)))

    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1)
    run = make_tile_parallel_embed(apply_fn, mesh)
    sharded = np.asarray(run(q, jnp.asarray(tiles)))
    np.testing.assert_array_equal(sharded, single)  # bit-exact: per-tile compute


def test_nondivisible_batch_padded(int8_backbone):
    q, apply_fn = int8_backbone
    rng = np.random.default_rng(2)
    tiles = rng.standard_normal((13, TILE, TILE, 3)).astype(np.float32)  # 13 % 8 != 0
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1)
    run = make_tile_parallel_embed(apply_fn, mesh)
    out = np.asarray(run(q, jnp.asarray(tiles)))
    single = np.asarray(jax.jit(apply_fn)(q, jnp.asarray(tiles)))
    assert out.shape == (13, 2048)
    np.testing.assert_array_equal(out, single)


def test_chunked_slide_embed(int8_backbone):
    q, apply_fn = int8_backbone
    rng = np.random.default_rng(3)
    tiles = rng.standard_normal((35, TILE, TILE, 3)).astype(np.float32)
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1)
    out = tile_parallel_slide_embed(apply_fn, q, jnp.asarray(tiles), mesh, chunk=2)
    single = np.asarray(jax.jit(apply_fn)(q, jnp.asarray(tiles)))
    np.testing.assert_array_equal(np.asarray(out), single)


def test_compose_with_head_dp4_sp2(int8_backbone):
    """The full multi-chip slide path: tile-parallel embed over dp on a
    dp=4 x sp=2 mesh, head forward on the gathered features — logits match
    the single-device pipeline."""
    from transmil_deepgraft_tpu.models import TransMIL

    q, apply_fn = int8_backbone
    rng = np.random.default_rng(4)
    tiles = rng.standard_normal((24, TILE, TILE, 3)).astype(np.float32)
    head = TransMIL(n_classes=2, in_features=2048, out_features=64)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048)))

    feats_1dev = jax.jit(apply_fn)(q, jnp.asarray(tiles))
    logits_1dev = np.asarray(head.apply(hv, feats_1dev[None]))

    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    run = make_tile_parallel_embed(apply_fn, mesh)
    feats = run(q, jnp.asarray(tiles))
    logits = np.asarray(head.apply(hv, feats[None]))
    np.testing.assert_allclose(logits, logits_1dev, atol=1e-5, rtol=0)


def test_inference_pipeline_mesh(int8_backbone):
    """SlideInferencePipeline(mesh=...) produces the same probabilities as the
    single-device pipeline (per-chip chunking + gather inside embed())."""
    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    rng = np.random.default_rng(5)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bb_vars = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, TILE, TILE, 3)))
    )
    head = TransMIL(n_classes=2, in_features=2048, out_features=64)
    hv = jax.device_get(head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048))))
    tiles = rng.standard_normal((21, TILE, TILE, 3)).astype(np.float32)
    calib = tiles[:4]

    single = SlideInferencePipeline(bb_vars, head, hv, calib_tiles=calib, chunk=8)
    probs_single = single.predict_slide(tiles)

    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1)
    multi = SlideInferencePipeline(bb_vars, head, hv, calib_tiles=calib, chunk=1, mesh=mesh)
    assert multi.chunk == 8  # chunk scales per chip
    probs_multi = multi.predict_slide(tiles)
    np.testing.assert_allclose(probs_multi, probs_single, atol=1e-5, rtol=0)


def test_infer_cli_n_chips(tmp_path):
    """cli/infer --n_chips runs the tile-parallel serving path end to end."""
    from flax import serialization
    from PIL import Image

    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    rng = np.random.default_rng(0)
    root = tmp_path / "BLOCKS"
    d = root / "slideA"
    d.mkdir(parents=True)
    for t in range(8):
        arr = rng.integers(0, 255, (TILE, TILE, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tile_({t}-1).jpg")

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bb_vars = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, TILE, TILE, 3)))
    )
    (tmp_path / "bb.msgpack").write_bytes(serialization.msgpack_serialize(bb_vars))
    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = jax.device_get(head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048))))
    (tmp_path / "head.msgpack").write_bytes(serialization.msgpack_serialize(hv))

    from transmil_deepgraft_tpu.cli.infer import main

    results = main([
        "--tiles_root", str(root),
        "--backbone_ckpt", str(tmp_path / "bb.msgpack"),
        "--head_ckpt", str(tmp_path / "head.msgpack"),
        "--quantize", "int8", "--out_features", "32",
        "--chunk", "2", "--tile_size", str(TILE), "--topk", "2",
        "--n_chips", "4",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert len(results) == 1
    assert abs(sum(results[0]["probs"]) - 1.0) < 1e-3
