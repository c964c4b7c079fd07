"""Native threaded JPEG tile loader (transmil_deepgraft_tpu/native/tileloader.cpp + ctypes binding)."""

import time

import numpy as np
import pytest
from PIL import Image

from transmil_deepgraft_tpu.data import native_tiles as nt
from transmil_deepgraft_tpu.data.jpg_bags import _load_tile
from transmil_deepgraft_tpu.data.transforms import imagenet_normalize

pytestmark = pytest.mark.skipif(not nt.available(), reason="libjpeg/native build unavailable")


def _write_jpegs(tmp_path, rng, n, size):
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        p = tmp_path / f"tile_({i}-0).jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_exact_match_vs_pil_at_native_size(tmp_path, rng):
    """Same libjpeg underneath + identity resize + same normalize: the native
    batch must match the PIL path bit-for-bit at the stored tile size."""
    paths = _write_jpegs(tmp_path, rng, 6, 64)
    batch, n_ok = nt.load_tiles(paths, size=64)
    assert n_ok == 6 and batch.shape == (6, 64, 64, 3)
    ref = np.stack([imagenet_normalize(_load_tile(p, 64)) for p in paths])
    np.testing.assert_allclose(batch, ref, atol=1e-6)


def test_resize_path_close_to_pil(tmp_path, rng):
    paths = _write_jpegs(tmp_path, rng, 3, 96)
    batch, n_ok = nt.load_tiles(paths, size=64)
    assert n_ok == 3
    ref = np.stack([imagenet_normalize(_load_tile(p, 64)) for p in paths])
    # different resamplers (bilinear vs PIL default); statistics must agree
    assert abs(float(batch.mean()) - float(ref.mean())) < 0.05
    assert abs(float(batch.std()) - float(ref.std())) < 0.2


def test_failed_decode_counts_and_zeros(tmp_path, rng):
    paths = _write_jpegs(tmp_path, rng, 2, 32)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    batch, n_ok = nt.load_tiles([paths[0], bad, paths[1]], size=32)
    assert n_ok == 2
    assert np.all(batch[1] == 0.0)
    assert not np.all(batch[0] == 0.0)


def test_extraction_uses_native_path(tmp_path, rng):
    """extract_slide_features(native) == PIL path for same-size jpegs."""
    from transmil_deepgraft_tpu.data.feature_extractor import extract_slide_features

    paths = _write_jpegs(tmp_path, rng, 5, 32)
    embed = lambda x: np.asarray(x).mean(axis=(1, 2))  # fake backbone
    f_native, c1 = extract_slide_features(
        embed, paths, batch_size=3, tile_size=32, native_tiles=True
    )
    f_pil, c2 = extract_slide_features(
        embed, paths, batch_size=3, tile_size=32, native_tiles=False
    )
    np.testing.assert_allclose(f_native, f_pil, atol=1e-5)
    np.testing.assert_array_equal(c1, c2)


def test_throughput_vs_pil(tmp_path, rng):
    """Informational: the threaded loader should not be slower than PIL."""
    paths = _write_jpegs(tmp_path, rng, 48, 224)

    def best_of(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best_of(lambda: nt.load_tiles(paths, size=224))
    t_pil = best_of(lambda: [imagenet_normalize(_load_tile(p, 224)) for p in paths])
    # generous bound: parallel decode must at least keep up (per-core parity;
    # real speedup needs multi-core hosts - the CI VM has 1 vCPU). min-of-3
    # timing + wide margin so scheduler noise under a concurrently loaded
    # host cannot flake this (it did once at 1 vCPU with a parallel suite).
    assert t_native < t_pil * 2.5, (t_native, t_pil)


def test_u8_loader_and_device_normalize_path(tmp_path, rng):
    """Raw-u8 decode (tl_load_batch_u8) + on-device normalization == the
    host-normalized f32 path (the 4x-less-transfer serving route)."""
    import jax.numpy as jnp

    paths = _write_jpegs(tmp_path, rng, 4, 48)
    u8, n_ok = nt.load_tiles_u8(paths, size=48)
    assert n_ok == 4 and u8.dtype == np.uint8
    # decode-only must match PIL bytes exactly at native size
    ref_u8 = np.stack([_load_tile(p, 48) for p in paths])
    np.testing.assert_array_equal(u8, ref_u8)

    # pipeline: u8 input + device normalize == f32 host-normalized input
    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    import jax

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 48, 48, 3))))
    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048)))
    f32 = imagenet_normalize(u8)
    p = SlideInferencePipeline(bv, head, hv, calib_tiles=f32, chunk=2)
    np.testing.assert_allclose(p.embed(u8), p.embed(f32), atol=2e-2, rtol=1e-4)


def test_corrupt_jpegs_fail_soft(tmp_path, rng):
    """Garbage/truncated JPEGs must not crash the native decoder: failed
    tiles stay zero and n_ok reflects only the good decodes."""
    if not nt.available():
        pytest.skip("native tile loader unavailable")
    good = _write_jpegs(tmp_path, rng, 2, 32)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 this is not a jpeg")
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(good[0].read_bytes()[:40])
    missing = tmp_path / "missing.jpg"

    paths = [good[0], bad, good[1], trunc, missing]
    batch, n_ok = nt.load_tiles(paths, size=32)
    assert n_ok == 2
    assert (batch[1] == 0).all() and (batch[3] == 0).all() and (batch[4] == 0).all()
    assert (batch[0] != 0).any() and (batch[2] != 0).any()

    u8, n_ok_u8 = nt.load_tiles_u8(paths, size=32)
    assert n_ok_u8 == 2
    assert (u8[1] == 0).all() and (u8[4] == 0).all()


def test_scaled_dct_identical_below_2x(tmp_path, rng):
    """scaled_dct must be a NO-OP (bit-identical) when sources are under 2x
    the target — including the exact-size common case — because the chosen
    libjpeg scale_denom stays 1."""
    for src in (64, 96):  # 96 < 2*64: still full decode
        d = tmp_path / f"s{src}"
        d.mkdir()
        paths = _write_jpegs(d, rng, 4, src)
        full, ok1 = nt.load_tiles_u8(paths, size=64)
        scal, ok2 = nt.load_tiles_u8(paths, size=64, scaled_dct=True)
        assert ok1 == ok2 == 4
        np.testing.assert_array_equal(full, scal)
        f_full, _ = nt.load_tiles(paths, size=64)
        f_scal, _ = nt.load_tiles(paths, size=64, scaled_dct=True)
        np.testing.assert_array_equal(f_full, f_scal)


def test_scaled_dct_oversized_close_and_correct_shape(tmp_path):
    """Oversized sources decode at 1/2-1/8 DCT scale then bilinear-finish:
    output shape unchanged, pixels close to the full-decode path on smooth
    (tissue-like) content. Uses low-frequency images — uniform noise is
    adversarial for ANY resampling comparison and unrepresentative of H&E."""
    from scipy.ndimage import gaussian_filter, zoom

    g = np.random.default_rng(7)
    paths = []
    for i in range(4):
        x = g.standard_normal((32, 32, 3))
        img = zoom(x, (8, 8, 1), order=1)  # 256x256
        img = gaussian_filter(img, (3, 3, 0))
        img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255
        p = tmp_path / f"big_{i}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(p, quality=90)
        paths.append(p)
    full, _ = nt.load_tiles_u8(paths, size=64)  # 256 -> 64: denom 4 applies
    scal, ok = nt.load_tiles_u8(paths, size=64, scaled_dct=True)
    assert ok == 4 and scal.shape == (4, 64, 64, 3)
    d = np.abs(full.astype(np.float32) - scal.astype(np.float32))
    assert d.mean() < 2.0, d.mean()  # u8 levels; measured ~0.7-0.9


def test_decode_tile_paths_scaled_default(tmp_path, rng):
    """The inference decode path defaults scaled_dct on; exact-size tiles stay
    bit-identical to the explicit full decode."""
    from transmil_deepgraft_tpu.inference import decode_tile_paths

    paths = _write_jpegs(tmp_path, rng, 5, 64)
    out = decode_tile_paths(paths, 64)
    full, _ = nt.load_tiles_u8(paths, size=64)
    np.testing.assert_array_equal(out, full)
