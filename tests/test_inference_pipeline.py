"""Production inference pipeline (int8 backbone + head) and int8 extraction."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.inference import SlideInferencePipeline
from transmil_deepgraft_tpu.models import TransMIL
from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet


@pytest.fixture(scope="module")
def resnet_vars():
    model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    return model, jax.device_get(v)


def test_pipeline_int8_vs_bf16(resnet_vars, rng):
    _, variables = resnet_vars
    tiles = rng.standard_normal((10, 64, 64, 3)).astype(np.float32)
    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 10, 2048)))

    p_int8 = SlideInferencePipeline(
        variables, head, hv, calib_tiles=tiles[:4], chunk=4
    )
    p_bf16 = SlideInferencePipeline(variables, head, hv, calib_tiles=None, chunk=4)

    probs_q = p_int8.predict_slide(tiles)
    probs_b = p_bf16.predict_slide(tiles)
    assert probs_q.shape == probs_b.shape == (2,)
    np.testing.assert_allclose(probs_q.sum(), 1.0, atol=1e-5)
    # int8 and bf16 paths agree on the prediction
    np.testing.assert_allclose(probs_q, probs_b, atol=0.05)

    probs, scores = p_int8.predict_slide_with_attention(tiles)
    assert scores.shape == (10,)
    np.testing.assert_allclose(probs, probs_q, atol=1e-4)

    # the device-resident embed (zero feature round-trips, what
    # predict_slide consumes) is bit-identical to the host-fetched embed
    np.testing.assert_array_equal(np.asarray(p_int8.embed_device(tiles)), p_int8.embed(tiles))
    # non-chunk-multiple N exercises the padded final chunk + slice
    np.testing.assert_array_equal(
        np.asarray(p_int8.embed_device(tiles[:7])), p_int8.embed(tiles[:7])
    )


@pytest.mark.parametrize("head_name", ["DSMIL", "AttMIL"])
def test_pipeline_attention_non_transmil_heads(resnet_vars, rng, head_name):
    """Heads whose return_attn yields plain weight arrays (no tile_scores()
    payload) serve attention through the pipeline too — the layout is
    normalized to (n,) exactly like serving._attn_forward."""
    from transmil_deepgraft_tpu.models import create_model

    _, variables = resnet_vars
    tiles = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    head = create_model(head_name, n_classes=2, in_features=2048)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 6, 2048)))

    p = SlideInferencePipeline(variables, head, hv, calib_tiles=None, chunk=4)
    probs, scores = p.predict_slide_with_attention(tiles)
    assert probs.shape == (2,) and scores.shape == (6,)
    assert np.isfinite(scores).all()
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs, p.predict_slide(tiles), atol=1e-5)


def test_pipeline_fused_backbone_matches_int8(resnet_vars, rng):
    """fused_backbone=True routes through the Pallas stage kernels (interpret
    mode off-TPU) and is bit-exact vs the XLA int8 path."""
    _, variables = resnet_vars
    tiles = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 6, 2048)))

    p_int8 = SlideInferencePipeline(variables, head, hv, calib_tiles=tiles[:4], chunk=2)
    p_fused = SlideInferencePipeline(
        variables, head, hv, calib_tiles=tiles[:4], chunk=2,
        fused_backbone=True, fused_t_cfg=(1, 1, 2, 1, 2, 1, 2),
    )
    np.testing.assert_array_equal(p_fused.embed(tiles), p_int8.embed(tiles))

    with pytest.raises(ValueError):
        SlideInferencePipeline(
            variables, head, hv, calib_tiles=tiles[:4], chunk=3,
            fused_backbone=True, fused_t_cfg=(1, 1, 2, 1, 2, 1, 2),
        )


def test_streaming_paths_match_in_memory(resnet_vars, rng, tmp_path):
    """The streaming disk->prediction path (predict_slide_paths: chunked
    decode on a worker thread overlapped with device embed, features never
    leave the device) produces EXACTLY the probabilities / attention of the
    in-memory path on the same decoded tiles — the VERDICT r4 item 1 contract."""
    from PIL import Image

    from transmil_deepgraft_tpu.inference import decode_tile_paths

    _, variables = resnet_vars
    slide = tmp_path / "slideS"
    slide.mkdir()
    paths = []
    for t in range(10):  # 10 tiles, chunk=4 -> 3 chunks incl. a padded one
        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        p = slide / f"tile_({t}-1).jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)

    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 10, 2048)))
    pipe = SlideInferencePipeline(variables, head, hv, calib_tiles=None, chunk=4)

    tiles_u8 = decode_tile_paths(paths, size=64)
    assert tiles_u8.dtype == np.uint8 and tiles_u8.shape == (10, 64, 64, 3)

    probs_stream = pipe.predict_slide_paths(paths, tile_size=64)
    probs_mem = pipe.predict_slide(tiles_u8)
    np.testing.assert_array_equal(probs_stream, probs_mem)

    p_s, a_s = pipe.predict_slide_paths_with_attention(paths, tile_size=64)
    p_m, a_m = pipe.predict_slide_with_attention(tiles_u8)
    np.testing.assert_array_equal(p_s, p_m)
    np.testing.assert_array_equal(a_s, a_m)

    # features themselves are bit-identical, streamed vs in-memory
    np.testing.assert_array_equal(
        np.asarray(pipe.embed_paths_device(paths, tile_size=64)),
        np.asarray(pipe.embed_device(tiles_u8)),
    )


def test_extract_cohort_int8(tmp_path, rng):
    from PIL import Image

    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort
    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset

    blocks = tmp_path / "BLOCKS" / "slideA"
    blocks.mkdir(parents=True)
    for t in range(5):
        arr = rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
        Image.fromarray(arr).save(blocks / f"tile_({t}-0).jpg")
    (tmp_path / "labels.json").write_text(json.dumps({"test": [["slideA", 0]]}))

    model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 224, 224, 3)))
    ds = JPGMILDataset(tmp_path, tmp_path / "labels.json", "test", 2)

    out_q = extract_cohort(model, variables, ds, tmp_path / "f_q", batch_size=5, quantize="int8")
    out_f = extract_cohort(model, variables, ds, tmp_path / "f_f", batch_size=5)

    import h5py

    with h5py.File(out_q[0], "r") as fq, h5py.File(out_f[0], "r") as ff:
        q, f = fq["features"][:], ff["features"][:]
    assert q.shape == f.shape == (5, 2048)
    cos = (q * f).sum(-1) / (np.linalg.norm(q, axis=-1) * np.linalg.norm(f, axis=-1))
    assert cos.min() > 0.995, cos
