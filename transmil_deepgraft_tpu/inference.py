"""Production slide-inference pipeline: int8 PTQ backbone + fused-kernel head.

The serving-path composition of the round-2 performance work (the path
``bench.py`` measures): raw tiles stream through the int8 post-training-
quantized ResNet50 (``models/resnet_int8``, 1.4x over bf16) in fixed chunks,
and the feature bag runs the TransMIL head whose TransLayers execute as fused
Pallas kernels on TPU (``fused_inference=True``, 2.09x over the XLA layer).

Mirrors the reference's fused inference model (``test_visualize.py``
InferenceModel: backbone + mil head) with TPU-first execution.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.native_tiles import IMAGENET_MEAN, IMAGENET_STD


def decode_tile_paths(paths, size: int = 224, scaled_dct: bool = True) -> np.ndarray:
    """Decode a chunk of tile image paths -> raw (n, size, size, 3) uint8.

    JPEG chunks go through the native threaded loader when available
    (``data/native_tiles``); anything else (PNGs, decode failures, no
    libjpeg) falls back to per-tile PIL. Both paths return RAW uint8 —
    ImageNet normalization happens on device (4x less host->device data).

    ``scaled_dct`` (default on for this inference path) decodes sources
    >= 2x ``size`` at a reduced libjpeg DCT scale — up to ~2x decode
    throughput on oversized WSI tiles at a measured mean pixel deviation
    < 1 u8 level (BENCHMARKS.md "Host decode ceiling"); sources under 2x
    (incl. the exact-size common case) are bit-identical. Offline feature
    EXTRACTION keeps full decode by default (``data/feature_extractor``)."""
    from transmil_deepgraft_tpu.data import native_tiles as nt

    if nt.available() and all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths):
        batch, n_ok = nt.load_tiles_u8(paths, size, scaled_dct=scaled_dct)
        if n_ok == len(paths):
            return batch
    from transmil_deepgraft_tpu.data.jpg_bags import _load_tile

    return np.stack([_load_tile(p, size) for p in paths])


def chunked_device_embed(
    call: Callable[[np.ndarray], jax.Array], tiles: np.ndarray, chunk: int
) -> jax.Array:
    """Run ``call`` over ``tiles`` in fixed ``chunk``-size batches (zero-pad
    the last), concatenating features ON DEVICE — the shared slide-embed loop
    of ``SlideInferencePipeline.embed_device`` and
    ``ServingBundle.embed_tiles`` (one compiled program per chunk size, zero
    feature round-trips)."""
    n = tiles.shape[0]
    if n == 0:
        raise ValueError("empty tile batch")
    outs = []
    for start in range(0, n, chunk):
        batch = tiles[start : start + chunk]
        pad = chunk - batch.shape[0]
        if pad:
            batch = np.concatenate([batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
        outs.append(call(batch))
    return jnp.concatenate(outs, axis=0)[:n] if len(outs) > 1 else outs[0][:n]


class SlideInferencePipeline:
    """tiles (N, 224, 224, 3) -> slide probabilities (and attention scores).

    Args:
      backbone_variables: fp32 ResNet50 {'params','batch_stats'} (e.g. converted
        from ``retccl_best_ckpt.pth``).
      head_model: a bag-level flax head (TransMIL by default usage).
      head_variables: its variables.
      calib_tiles: representative tiles for int8 activation calibration;
        pass None to run the backbone in bf16 instead of int8.
      chunk: tile batch per backbone dispatch (one compiled program).
    """

    def __init__(
        self,
        backbone_variables: dict,
        head_model,
        head_variables: dict,
        *,
        calib_tiles: Optional[np.ndarray] = None,
        truncate_after: int = 4,
        chunk: int = 128,
        fused_backbone: bool = False,
        fused_t_cfg: tuple = (1, 2, 4, 4, 4, 4, 4),
        mesh=None,
        mesh_axis: str = "dp",
    ) -> None:
        """``mesh``: a ``jax.sharding.Mesh`` turns the embed stage
        tile-parallel (``parallel/tile_parallel``): each dispatch shards
        ``chunk`` tiles PER CHIP over ``mesh_axis``, params replicated,
        features gathered — the embed stage scales ~linearly over ICI
        (tiles are independent), which is how the <1 s/slide target is met
        at 2-3 chips (BENCHMARKS.md projection table)."""
        self.head = head_model
        self.hv = head_variables
        self.mesh = mesh
        n_shards = 1 if mesh is None else mesh.shape[mesh_axis]
        self.chunk = chunk * n_shards

        if calib_tiles is not None:
            from transmil_deepgraft_tpu.models.resnet_int8 import (
                apply_qresnet50,
                build_qresnet50,
            )

            self._q = build_qresnet50(
                backbone_variables, calib_tiles, truncate_after=truncate_after
            )
            if fused_backbone and mesh is not None:
                raise ValueError(
                    "fused_backbone (experimental Pallas kernels) does not "
                    "compose with tile-parallel mesh embedding; the XLA int8 "
                    "path is the production multi-chip path"
                )
            if fused_backbone:
                # fully-fused Pallas stage kernels (ops/pallas/qstage_kernel):
                # bit-exact vs apply_qresnet50; every t in fused_t_cfg must
                # divide `chunk` (embed() pads each batch to chunk)
                from functools import partial

                from transmil_deepgraft_tpu.models.resnet_int8 import (
                    apply_qresnet50_fused,
                    prepare_qresnet50_fused,
                )

                for t in fused_t_cfg:
                    if t and chunk % t:  # 0 = XLA for that segment (mixed)
                        raise ValueError(f"t={t} does not divide chunk={chunk}")
                self._q = prepare_qresnet50_fused(self._q)
                embed_core = partial(apply_qresnet50_fused, t_cfg=fused_t_cfg)
            else:
                embed_core = apply_qresnet50
            self._embed_args = (self._q,)
        else:
            from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

            model = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0,
                           truncate_after=truncate_after)
            bf16_vars = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                backbone_variables,
            )
            embed_core = lambda v, t: model.apply(v, t.astype(jnp.bfloat16)).astype(jnp.float32)
            self._embed_args = (bf16_vars,)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P(mesh_axis))
            jit_kwargs = {"in_shardings": (repl, data), "out_shardings": repl}
        else:
            jit_kwargs = {}
        self._embed = jax.jit(embed_core, **jit_kwargs)
        # uint8 serving path: raw u8 tiles ship 4x less host->device data;
        # ImageNet normalization runs ON DEVICE (data/native_tiles.load_tiles_u8
        # produces the matching raw tiles)
        _mean = jnp.asarray(IMAGENET_MEAN)
        _std = jnp.asarray(IMAGENET_STD)
        self._embed_u8 = jax.jit(
            lambda *a: embed_core(
                *a[:-1], (a[-1].astype(jnp.float32) / 255.0 - _mean) / _std
            ),
            **jit_kwargs,
        )

        # coord-aware heads (RoFormerMIL) take the tiles' grid coords as a
        # second forward argument (square-grid fallback when none supplied)
        self._coord_aware = bool(getattr(head_model, "coord_aware", False))
        if self._coord_aware:
            self._head_fwd = jax.jit(
                lambda v, f, c: jax.nn.softmax(
                    self.head.apply(v, f, c, deterministic=True), axis=-1
                )
            )
            self._head_attn = jax.jit(
                lambda v, f, c: self.head.apply(v, f, c, deterministic=True, return_attn=True)
            )
        else:
            self._head_fwd = jax.jit(
                lambda v, f: jax.nn.softmax(self.head.apply(v, f, deterministic=True), axis=-1)
            )
            self._head_attn = jax.jit(
                lambda v, f: self.head.apply(v, f, deterministic=True, return_attn=True)
            )

    def _coord_args(self, coords, n: int) -> tuple:
        if not self._coord_aware:
            return ()
        if coords is None:
            return (None,)  # model-internal square-grid fallback
        coords = np.asarray(coords, np.float32)
        if coords.shape != (n, 2):
            raise ValueError(f"coords must be ({n}, 2), got {coords.shape}")
        return (jnp.asarray(coords[None]),)

    def embed(self, tiles: np.ndarray) -> np.ndarray:
        """Chunked tile embedding -> (N, D) f32 features. Accepts normalized
        float32 tiles OR raw uint8 tiles (normalized on device: 4x less
        host->device transfer). Double-buffered: jax dispatch is async, so
        host-side slicing/padding of chunk i+1 overlaps the device embedding
        of chunk i."""
        embed = self._embed_u8 if tiles.dtype == np.uint8 else self._embed
        n = tiles.shape[0]
        feats = []
        pending: tuple = ()
        for start in range(0, n, self.chunk):
            batch = tiles[start : start + self.chunk]
            pad = self.chunk - batch.shape[0]
            if pad:  # one compiled program for every chunk
                batch = np.concatenate([batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
            out_dev = embed(*self._embed_args, jnp.asarray(batch))
            if pending:
                feats.append(np.asarray(pending[0])[: pending[1]])
            pending = (out_dev, self.chunk - pad if pad else self.chunk)
        if pending:
            feats.append(np.asarray(pending[0])[: pending[1]])
        return np.concatenate(feats)

    def embed_device(self, tiles: np.ndarray) -> jax.Array:
        """Chunked tile embedding -> (N, D) f32 features, LEFT ON DEVICE.

        The slide-prediction path: per-chunk features are concatenated on
        device and fed straight to the head, so the whole slide streams
        tile -> embed -> head with ZERO feature round-trips (``embed()``
        fetches ~320 chunks/slide to host — fine for offline extraction,
        pure overhead when the head runs on the same chip, and RTT-dominated
        over tunneled links)."""
        embed = self._embed_u8 if tiles.dtype == np.uint8 else self._embed
        return chunked_device_embed(
            lambda b: embed(*self._embed_args, jnp.asarray(b)), tiles, self.chunk
        )

    def embed_paths_device(self, paths, *, tile_size: int = 224) -> jax.Array:
        """STREAMING disk -> features: decode tile image paths chunk by chunk,
        with the NEXT chunk decoding on a host thread while the current chunk
        embeds on device; features concatenate on device (never a full decoded
        tile array on the host — peak host memory is two uint8 chunks, ~40 MB,
        vs ~6 GB for a 40k slide decoded up front).

        This is the honest disk->prediction path the reference's chunked
        streaming inference walks (``visualize_mil.py:560-583`` decodes tile
        batches through the backbone inside the slide loop); here decode and
        device embed genuinely overlap because jax dispatch is async and the
        decode of chunk i+1 runs on a worker thread."""
        from concurrent.futures import ThreadPoolExecutor

        n = len(paths)
        if n == 0:
            raise ValueError("empty tile path list")
        chunks = [paths[i : i + self.chunk] for i in range(0, n, self.chunk)]
        outs = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(decode_tile_paths, chunks[0], tile_size)
            for ci in range(len(chunks)):
                batch = fut.result()
                if ci + 1 < len(chunks):  # prefetch: decode overlaps device embed
                    fut = pool.submit(decode_tile_paths, chunks[ci + 1], tile_size)
                pad = self.chunk - batch.shape[0]
                if pad:  # one compiled program for every chunk
                    batch = np.concatenate(
                        [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
                    )
                outs.append(self._embed_u8(*self._embed_args, jnp.asarray(batch)))
        return jnp.concatenate(outs, axis=0)[:n] if len(outs) > 1 else outs[0][:n]

    def predict_slide_paths(
        self, paths, coords: Optional[np.ndarray] = None, *, tile_size: int = 224
    ) -> np.ndarray:
        """Tile image paths ON DISK -> (C,) slide probabilities, streaming
        (see ``embed_paths_device``). Numerically identical to decoding the
        full slide and calling ``predict_slide`` (tested)."""
        feats = self.embed_paths_device(paths, tile_size=tile_size)
        cargs = self._coord_args(coords, len(paths))
        return np.asarray(self._head_fwd(self.hv, feats[None], *cargs))[0]

    def predict_slide_paths_with_attention(
        self, paths, coords: Optional[np.ndarray] = None, *, tile_size: int = 224
    ) -> tuple[np.ndarray, np.ndarray]:
        """Streaming variant of ``predict_slide_with_attention``."""
        feats = self.embed_paths_device(paths, tile_size=tile_size)
        return self._attention_from_feats(feats, len(paths), coords)

    def predict_slide(self, tiles: np.ndarray, coords: Optional[np.ndarray] = None) -> np.ndarray:
        """(N, H, W, 3) tiles -> (C,) slide class probabilities. ``coords``
        ((N, 2) tile grid positions) feed coord-aware heads (RoFormerMIL)."""
        feats = self.embed_device(tiles)
        cargs = self._coord_args(coords, len(tiles))
        return np.asarray(self._head_fwd(self.hv, feats[None], *cargs))[0]

    def predict_slide_with_attention(
        self, tiles: np.ndarray, coords: Optional[np.ndarray] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (probs (C,), per-tile attention scores (N,))."""
        feats = self.embed_device(tiles)
        return self._attention_from_feats(feats, len(tiles), coords)

    def _attention_from_feats(
        self, feats: jax.Array, n_tiles: int, coords: Optional[np.ndarray]
    ) -> tuple[np.ndarray, np.ndarray]:
        cargs = self._coord_args(coords, n_tiles)
        logits, attn = self._head_attn(self.hv, feats[None], *cargs)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        # normalize the head's attention layout to (n,): TransMIL-family heads
        # return a payload with tile_scores() (B, heads, n); gated/dual-stream
        # heads (AttMIL, DSMIL) return the (B, n) / (B, K, n) weights directly
        # — same contract as serving._attn_forward
        raw = attn.tile_scores() if hasattr(attn, "tile_scores") else jnp.asarray(attn)
        if raw.size % n_tiles != 0:
            raise ValueError(
                f"head attention shape {tuple(raw.shape)} is not a multiple of the "
                f"tile count {n_tiles}; heads must return per-tile scores with a "
                f"trailing length equal to the (unpadded) tile count"
            )
        scores = np.asarray(raw.reshape(1, -1, n_tiles).mean(axis=1))[0]
        return probs, scores
