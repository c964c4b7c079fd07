"""Python bindings for the native threaded JPEG tile loader (ctypes).

``load_tiles`` decodes a batch of jpeg tile paths with a C++ thread pool
(libjpeg decompress + bilinear resize + ImageNet normalize) straight into one
(N, size, size, 3) float32 buffer — the host-side answer to the reference's
DALI jpeg pipeline (``code/datasets/dali_dataloader.py``) for the raw-image
MIL path, replacing single-threaded PIL decode at extraction/serving time.

The shared library auto-builds from ``transmil_deepgraft_tpu/native/tileloader.cpp`` (shipped in the wheel) on first use;
``available()`` gates callers so environments without libjpeg fall back to PIL.

Measured: per-core decode cost matches PIL (same libjpeg underneath; ~700
224px tiles/s/core); the win is the THREADED fan-out on multi-core hosts —
the dev VM has 1 vCPU, so in-repo tests only assert per-core parity.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from transmil_deepgraft_tpu.utils.native_build import ensure_native_lib

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        # builds into the package dir, or the user cache when site-packages
        # is read-only (system installs) — see utils/native_build.py
        lib = ctypes.CDLL(str(ensure_native_lib("tileloader", ["tileloader.cpp"])))
        lib.tl_load_batch.restype = ctypes.c_int
        lib.tl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.tl_load_batch_u8.restype = ctypes.c_int
        lib.tl_load_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ]
        _selftest(lib)
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def _selftest(lib: ctypes.CDLL) -> None:
    """Decode one tiny JPEG through the library before reporting available():
    catches ABI drift / wrong-result builds (advisor finding, round 2)."""
    import tempfile

    from PIL import Image

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "probe.jpg"
        Image.fromarray(np.full((8, 8, 3), 128, np.uint8)).save(p, quality=95)
        out = np.empty((1, 8, 8, 3), np.uint8)
        arr = (ctypes.c_char_p * 1)(str(p).encode())
        rc = lib.tl_load_batch_u8(
            arr, 1, 8, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 1, 0
        )
        if rc != 1 or abs(float(out.mean()) - 128.0) > 8.0:
            raise RuntimeError("native tileloader self-test failed")


def available() -> bool:
    return _load_lib() is not None


def load_tiles(
    paths: Sequence[str | Path],
    size: int = 224,
    n_threads: int | None = None,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    scaled_dct: bool = False,
) -> tuple[np.ndarray, int]:
    """Decode ``paths`` -> normalized (N, size, size, 3) float32.

    Returns ``(batch, n_ok)``; failed decodes leave zero tiles (callers may
    compare ``n_ok`` to ``len(paths)``).

    ``scaled_dct=True`` decodes sources >= 2x ``size`` at a reduced libjpeg
    DCT scale (1/2, 1/4, 1/8 — largest still covering ``size``), then bilinear
    resizes the < 2x remainder: near-quadratic decode-cost savings on
    oversized WSI tiles. Sources under 2x decode bit-identically to the
    default path. Pixel deviation on oversized sources is measured in
    BENCHMARKS.md ("Host decode ceiling").
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native tile loader unavailable (libjpeg / build failed)")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.float32)
    if n == 0:
        return out, 0
    c_paths = (ctypes.c_char_p * n)(
        *[os.fspath(p).encode() for p in paths]
    )
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    threads = n_threads or min(16, os.cpu_count() or 4)
    n_ok = lib.tl_load_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(scaled_dct),
    )
    return out, int(n_ok)


def load_tiles_u8(
    paths: Sequence[str | Path],
    size: int = 224,
    n_threads: int | None = None,
    scaled_dct: bool = False,
) -> tuple[np.ndarray, int]:
    """Decode ``paths`` -> RAW (N, size, size, 3) uint8 (no normalization).

    The device-side-normalize serving path: uint8 ships 4x less host->device
    data than normalized float32 tiles (77 MB -> 19 MB per 128-tile chunk).
    ``scaled_dct``: see :func:`load_tiles`."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native tile loader unavailable (libjpeg / build failed)")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    if n == 0:
        return out, 0
    c_paths = (ctypes.c_char_p * n)(*[os.fspath(p).encode() for p in paths])
    threads = n_threads or min(16, os.cpu_count() or 4)
    n_ok = lib.tl_load_batch_u8(
        c_paths, n, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        threads, int(scaled_dct),
    )
    return out, int(n_ok)
