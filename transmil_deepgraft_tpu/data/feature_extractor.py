"""Offline feature extraction: tiles -> backbone embeddings -> per-slide HDF5.

Equivalent of the reference's ``datasets/feature_extractor.py:64-237`` /
``utils/extract_features.py`` (RetCCL-2048 extraction over cohort BLOCKS dirs in
batches of 100 tiles, AMP autocast, coords from filenames, archive write): here
tiles stream through a jitted flax backbone in fixed batches (padding the last
batch so one program compiles), optionally with N stain-augmented copies
(``--augment``, ref ``:198-234``), writing ``{features, coords}`` HDF5 groups
that ``FeatureBagDataset`` reads back.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset, _load_tile, parse_coords
from transmil_deepgraft_tpu.data.transforms import imagenet_normalize, train_augment


def extract_slide_features(
    embed_fn,
    tile_paths: list[Path],
    *,
    batch_size: int = 100,
    tile_size: int = 224,
    augment_rng: Optional[np.random.Generator] = None,
    native_tiles: Optional[bool] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Embed all tiles of one slide; returns (features [N, D], coords [N, 2]).

    ``native_tiles`` (default: auto) decodes non-augmented jpeg batches through
    the threaded C++ loader (``data/native_tiles``, the DALI-pipeline
    equivalent); stain-augmented variants stay on the PIL+numpy path (the
    augmentations operate on uint8 arrays)."""
    from transmil_deepgraft_tpu.data import native_tiles as nt

    use_native = (
        augment_rng is None
        and (native_tiles if native_tiles is not None else nt.available())
        and all(str(p).lower().endswith((".jpg", ".jpeg")) for p in tile_paths)
    )
    coords = np.array([parse_coords(p.name) for p in tile_paths], np.int32)

    def decode(chunk):
        if use_native:
            # raw u8 + ON-DEVICE normalization: 4x less host->device transfer
            batch, n_ok = nt.load_tiles_u8(chunk, tile_size)
            if n_ok != len(chunk):  # decode failure: fall back to PIL for this chunk
                batch = np.stack(
                    [imagenet_normalize(_load_tile(p, tile_size)) for p in chunk]
                )
        else:
            imgs = []
            for p in chunk:
                img = _load_tile(p, tile_size)
                if augment_rng is not None:
                    img = train_augment(img, augment_rng)
                imgs.append(imagenet_normalize(img))
            batch = np.stack(imgs)
        n = batch.shape[0]
        if n < batch_size:  # pad so one program compiles for all batches
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n, *batch.shape[1:]), batch.dtype)]
            )
        return batch, n

    # double-buffered: jax dispatch is async, so decoding chunk i+1 on the
    # host overlaps the device embedding of chunk i; only the final
    # np.asarray fetch per chunk synchronizes
    _mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    _std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    dev_norm = jax.jit(lambda t: (t.astype(jnp.float32) / 255.0 - _mean) / _std)
    feats: list[np.ndarray] = []
    pending: tuple = ()
    for start in range(0, len(tile_paths), batch_size):
        batch, n = decode(tile_paths[start : start + batch_size])
        dev = jnp.asarray(batch)
        if dev.dtype == jnp.uint8:
            dev = dev_norm(dev)
        out_dev = embed_fn(dev)
        if pending:
            feats.append(np.asarray(pending[0])[: pending[1]])
        pending = (out_dev, n)
    if pending:
        feats.append(np.asarray(pending[0])[: pending[1]])
    return np.concatenate(feats), coords


def extract_cohort(
    backbone,
    variables,
    dataset: JPGMILDataset,
    out_dir: str | Path,
    *,
    batch_size: int = 100,
    n_augment: int = 0,
    seed: int = 0,
    quantize: Optional[str] = None,  # 'int8' -> PTQ ResNet50 path (1.4x vs bf16)
) -> list[Path]:
    """Extract every slide of a cohort to ``<out_dir>/<slide>.h5`` (+ ``_aug{i}``
    copies when ``n_augment`` > 0).

    ``quantize='int8'`` runs the backbone through the post-training-quantized
    path (``models/resnet_int8``; ResNet50 backbones only), calibrated on the
    first batch of tiles - the production extraction speed path."""
    import h5py

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    _FUSED_T_CFG = (1, 1, 2, 1, 2, 1, 2)
    if quantize == "int8_fused":
        # fail before calibration/packing, not deep inside the Pallas path
        # (mirrors SlideInferencePipeline's upfront check); extraction pads
        # every batch to batch_size, so each non-XLA segment tile count
        # must divide it
        if getattr(backbone, "truncate_after", 4) != 4:
            raise ValueError("int8_fused supports the full 4-stage net only")
        for t in _FUSED_T_CFG:
            if t and batch_size % t:
                raise ValueError(
                    f"int8_fused: t={t} does not divide batch_size={batch_size}; "
                    f"use a batch size divisible by {max(t for t in _FUSED_T_CFG if t)}"
                )
    if quantize in ("int8", "int8_fused"):
        from transmil_deepgraft_tpu.models.resnet_int8 import (
            apply_qresnet50,
            build_qresnet50,
        )

        # >=64 tiles drawn across slides: calibration coverage halves the
        # worst-case int8 AUC shift (BENCHMARKS.md int8 AUC guard table)
        n_cal_slides = min(8, len(dataset))
        per_slide = max(8, 64 // max(1, n_cal_slides))
        calib_paths = []
        for s in range(n_cal_slides):
            calib_paths += dataset.tiles_of(s)[:per_slide]
        calib_paths = calib_paths[:64] or dataset.tiles_of(0)[:batch_size]
        # calibrate at the SAME tile size the embed will see: clip ranges
        # measured on 224px tiles do not transfer to other spatial extents
        cal_hw = getattr(dataset, "tile_size", 224)
        calib = np.stack(
            [imagenet_normalize(_load_tile(p, cal_hw)) for p in calib_paths]
        )
        truncate = getattr(backbone, "truncate_after", 4)
        q = build_qresnet50(jax.device_get(variables), calib, truncate_after=truncate)
        if quantize == "int8_fused":
            from functools import partial

            from transmil_deepgraft_tpu.models.resnet_int8 import (
                apply_qresnet50_fused,
                prepare_qresnet50_fused,
            )

            q = prepare_qresnet50_fused(q)
            jit_q = jax.jit(partial(apply_qresnet50_fused, t_cfg=_FUSED_T_CFG))
        else:
            jit_q = jax.jit(apply_qresnet50)
        embed_fn = lambda x: jit_q(q, x)
    else:
        # variables as an explicit arg (not a closure) so params stay jit
        # inputs, not giant baked-in HLO constants
        jit_embed = jax.jit(lambda v, x: backbone.apply(v, x, train=False))
        embed_fn = lambda x: jit_embed(variables, x)

    written: list[Path] = []
    for i in range(len(dataset)):
        name = dataset.names[i]
        tiles = dataset.tiles_of(i)
        variants: list[tuple[str, Optional[np.random.Generator]]] = [(name, None)]
        for a in range(n_augment):
            variants.append((f"{name}_aug{a}", np.random.default_rng((seed, i, a))))
        for vname, rng in variants:
            feats, coords = extract_slide_features(
                embed_fn, tiles, batch_size=batch_size, augment_rng=rng,
                tile_size=getattr(dataset, "tile_size", 224),
            )
            path = out_dir / f"{vname}.h5"
            with h5py.File(path, "w") as f:
                f.create_dataset("features", data=feats)
                f.create_dataset("coords", data=coords)
            written.append(path)
    return written
