"""Python bindings for the native bag store (ctypes).

``BagStore`` serves per-slide feature bags from the memory-mapped packed format
produced by :func:`write_bagstore` / :func:`convert_h5_dir`: full-bag reads are
one memcpy from the page cache, train-time random subsampling copies only the
sampled rows, and ``assemble_batch`` builds a whole (B, k, D) training batch
with native threads writing directly into the numpy output buffer. This is the
TPU-side answer to the reference's h5py-in-DataLoader-workers hot loop
(``feature_dataloader.py:252-255`` + worker processes) and its DALI dependency.

The shared library auto-builds from ``transmil_deepgraft_tpu/native/bagstore.cpp`` (shipped in the wheel) on first use.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from transmil_deepgraft_tpu.utils.native_build import ensure_native_lib

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # builds into the package dir, or the user cache when site-packages is
    # read-only (system installs) — see utils/native_build.py
    lib = ctypes.CDLL(str(ensure_native_lib("bagstore", ["bagstore.cpp"])))
    lib.bagstore_open.restype = ctypes.c_void_p
    lib.bagstore_open.argtypes = [ctypes.c_char_p]
    lib.bagstore_close.argtypes = [ctypes.c_void_p]
    for fn, res in (
        ("bagstore_n_slides", ctypes.c_uint64),
        ("bagstore_dim", ctypes.c_uint64),
    ):
        getattr(lib, fn).restype = res
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.bagstore_n_tiles.restype = ctypes.c_uint64
    lib.bagstore_n_tiles.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.bagstore_read_bag.restype = ctypes.c_int
    lib.bagstore_read_bag.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.bagstore_read_coords.restype = ctypes.c_int
    lib.bagstore_read_coords.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.bagstore_sample_bag.restype = ctypes.c_int64
    lib.bagstore_sample_bag.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.bagstore_assemble_batch.restype = ctypes.c_int
    lib.bagstore_assemble_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.bagstore_write.restype = ctypes.c_int
    lib.bagstore_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def write_bagstore(
    path: str | Path,
    bags: Sequence[np.ndarray],
    coords: Sequence[np.ndarray] | None = None,
) -> Path:
    """Pack per-slide (n_i, D) float32 bags (+ (n_i, 2) int32 coords) into one store."""
    lib = _load_lib()
    n_slides = len(bags)
    dim = bags[0].shape[1]
    n_tiles = np.array([b.shape[0] for b in bags], np.uint64)
    all_feats = np.ascontiguousarray(np.concatenate(bags).astype(np.float32))
    if coords is None:
        coords = [np.zeros((b.shape[0], 2), np.int32) for b in bags]
    all_coords = np.ascontiguousarray(np.concatenate(coords).astype(np.int32))
    rc = lib.bagstore_write(
        str(path).encode(), n_slides, dim,
        n_tiles.ctypes.data_as(ctypes.c_void_p),
        all_feats.ctypes.data_as(ctypes.c_void_p),
        all_coords.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise IOError(f"bagstore_write failed for {path}")
    return Path(path)


def convert_h5_dir(h5_dir: str | Path, out_path: str | Path, names: list[str] | None = None) -> tuple[Path, list[str]]:
    """Pack a directory of per-slide ``.h5`` feature files into one bag store."""
    import h5py

    h5_dir = Path(h5_dir)
    files = sorted(h5_dir.glob("*.h5")) if names is None else [h5_dir / f"{n}.h5" for n in names]
    bags, coords, slide_names = [], [], []
    for f in files:
        with h5py.File(f, "r") as h:
            bags.append(np.asarray(h["features"][:], np.float32))
            coords.append(
                np.asarray(h["coords"][:], np.int32) if "coords" in h
                else np.zeros((bags[-1].shape[0], 2), np.int32)
            )
        slide_names.append(f.stem)
    return write_bagstore(out_path, bags, coords), slide_names


class BagStore:
    def __init__(self, path: str | Path) -> None:
        self._lib = _load_lib()
        self._handle = self._lib.bagstore_open(str(path).encode())
        if not self._handle:
            raise IOError(f"cannot open bag store {path}")
        self.n_slides = int(self._lib.bagstore_n_slides(self._handle))
        self.dim = int(self._lib.bagstore_dim(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.bagstore_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def n_tiles(self, slide: int) -> int:
        return int(self._lib.bagstore_n_tiles(self._handle, slide))

    def read_bag(self, slide: int) -> np.ndarray:
        n = self.n_tiles(slide)
        out = np.empty((n, self.dim), np.float32)
        if self._lib.bagstore_read_bag(self._handle, slide, out.ctypes.data_as(ctypes.c_void_p)) != 0:
            raise IndexError(slide)
        return out

    def read_coords(self, slide: int) -> np.ndarray:
        n = self.n_tiles(slide)
        out = np.empty((n, 2), np.int32)
        if self._lib.bagstore_read_coords(self._handle, slide, out.ctypes.data_as(ctypes.c_void_p)) != 0:
            raise IndexError(slide)
        return out

    def sample_bag(self, slide: int, k: int, seed: int, pad: bool = True) -> tuple[np.ndarray, int]:
        out = np.empty((k, self.dim), np.float32)
        taken = self._lib.bagstore_sample_bag(
            self._handle, slide, k, seed, int(pad),
            out.ctypes.data_as(ctypes.c_void_p), None,
        )
        if taken < 0:
            raise IndexError(slide)
        return out, int(taken)

    def assemble_batch(self, slides: Sequence[int], k: int, seed: int, n_threads: int = 8) -> np.ndarray:
        slides_arr = np.asarray(slides, np.uint64)
        out = np.empty((len(slides_arr), k, self.dim), np.float32)
        rc = self._lib.bagstore_assemble_batch(
            self._handle, slides_arr.ctypes.data_as(ctypes.c_void_p),
            len(slides_arr), k, seed, n_threads,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError("assemble_batch failed")
        return out
