"""AOT serving bundles: portable, model-code-free inference artifacts.

``jax.export`` serializes a jitted forward to StableHLO with versioned
serialization guarantees.  A *serving bundle* packages that export together
with the weights into one zip file, so a deployment host can serve a trained
MIL head with **no model code, no torch, no config system** — just JAX and
this loader:

    export_serving_bundle(model, variables, "head.tdx", model_name="TransMIL")
    ...
    bundle = ServingBundle.load("head.tdx")          # any host, any checkout
    probs = bundle.predict(features)                 # (n, D) -> (C,)

Two shape strategies, chosen automatically:

* **symbolic** — one export with a symbolic bag dimension serves *every* bag
  length with one compiled program (possible for heads whose forward is
  length-polymorphic, e.g. AttMIL).
* **bucketed** — one export per bag-length bucket (``ops/padding`` buckets,
  zero-padded exactly like the trainer's ``eval_pad='bucket'`` policy).
  Required for TransMIL (PPEG's square grid needs a concrete ``sqrt``) and
  for heads with data-dependent top-k bounds (Chowder, DTFD).

This is the TPU-native answer to the reference's torch checkpoint handoff
(``code/test_visualize.py`` InferenceModel reloads the LightningModule from
source + ckpt): the artifact pins the *computation*, not just the weights, so
serving is immune to model-code drift and stays multi-platform
(``platforms=("tpu", "cpu")`` by default).
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

FORMAT_VERSION = 1
# Serving buckets default to the mid-range of ops.padding.DEFAULT_BUCKETS:
# feature bags below 256 zero-pad up; slides beyond 16384 tiles are served by
# the raw-tile pipeline (inference.SlideInferencePipeline), not a feature bundle.
DEFAULT_SERVING_BUCKETS: tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192, 16384)
# Slide bundles ARE the raw-tile pipeline, so their head buckets must cover
# full-slide tile counts (a 40,960-tile slide is the headline workload).
SLIDE_SERVING_BUCKETS: tuple[int, ...] = DEFAULT_SERVING_BUCKETS + (32768, 65536)


def _eval_forward(model, is_dtfd: bool, coord_aware: bool = False):
    """The trainer's deterministic eval forward (trainer._forward_logits).

    ``coord_aware`` exports a (variables, bags, coords) signature for heads
    that attend over tile coordinates (RoFormerMIL)."""

    def post(out):
        if is_dtfd:  # (sub-bag logits, slide logits) -> slide logits
            return out[1]
        if isinstance(out, tuple):  # heads defaulting to return_attn=True
            return out[0]  # (MDMIL): keep the bundle output = logits
        return out

    if coord_aware:
        def fwd(variables, bags, coords):
            return post(model.apply(variables, bags, coords, deterministic=True))
    else:
        def fwd(variables, bags):
            return post(model.apply(variables, bags, deterministic=True))

    return fwd


def _attn_forward(model, coord_aware: bool = False):
    """(variables, bags[, coords]) -> (logits, per-tile scores (B, n)) via
    return_attn.

    TransMIL-family heads return an attention payload with ``tile_scores()``
    (heads averaged, reference ``visualize_mil.py:584-592`` semantics);
    gated-attention heads return the (B, K, n) / (B, n) weights directly."""
    import jax.numpy as jnp

    def post(bags, logits, attn):
        scores = attn.tile_scores() if hasattr(attn, "tile_scores") else jnp.asarray(attn)
        # normalize every head's layout to (B, n): average any extra axes
        # (TransMIL heads, AttMIL K branches, CLAM_MB per-class branches)
        scores = scores.reshape(bags.shape[0], -1, bags.shape[1]).mean(axis=1)
        return logits, scores

    if coord_aware:
        def fwd(variables, bags, coords):
            logits, attn = model.apply(variables, bags, coords, deterministic=True, return_attn=True)
            return post(bags, logits, attn)
    else:
        def fwd(variables, bags):
            logits, attn = model.apply(variables, bags, deterministic=True, return_attn=True)
            return post(bags, logits, attn)

    return fwd




def export_serving_bundle(
    model,
    variables: dict,
    path: str | Path,
    *,
    model_name: str,
    in_features: int,
    batch: int = 1,
    buckets: Sequence[int] = DEFAULT_SERVING_BUCKETS,
    platforms: Sequence[str] = ("tpu", "cpu"),
    symbolic: str | bool = "auto",
    portable: bool = True,
    attention: str | bool = "auto",
) -> dict:
    """Write a ``.tdx`` serving bundle; returns its meta dict.

    ``attention='auto'`` additionally exports a per-tile-score forward
    (``return_attn=True``) for heads that support it, enabling
    ``predict_logits_with_attention`` / served top-k tiles from the artifact
    alone; ``True`` requires it, ``False`` skips it.

    ``variables`` is the full variable tree (``{'params': ..., 'batch_stats':
    ...}`` or just ``{'params': ...}``) as stored by ``utils/checkpoints``.
    ``symbolic='auto'`` tries a single length-polymorphic export first and
    falls back to per-bucket exports; ``True`` requires symbolic; ``False``
    skips straight to buckets.

    ``portable=True`` (default) exports the pure-XLA forward: models whose
    inference path is gated onto Pallas kernels (TransMIL's
    ``fused_inference``) are rebuilt without them, because a Pallas call
    cannot lower for non-TPU platforms and ties the artifact to the Mosaic
    custom-call ABI. ``portable=False`` keeps the fused kernels — pair it
    with ``platforms=("tpu",)`` for a TPU-only bundle.
    """
    import jax
    from flax import serialization
    from jax import export as jex

    if portable and getattr(model, "fused_inference", False):
        import dataclasses

        model = dataclasses.replace(model, fused_inference=False)
    is_dtfd = model_name in ("DTFD", "DTFDMIL")
    coord_aware = bool(getattr(model, "coord_aware", False))
    fwd = jax.jit(_eval_forward(model, is_dtfd, coord_aware))
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), variables
    )

    def input_specs(n):
        specs = [jax.ShapeDtypeStruct((batch, n, in_features), np.float32)]
        if coord_aware:
            specs.append(jax.ShapeDtypeStruct((batch, n, 2), np.float32))
        return specs
    buckets = tuple(sorted(int(b) for b in buckets))

    exports: dict[str, bytes] = {}
    mode = None
    if symbolic in ("auto", True):
        try:
            (n,) = jex.symbolic_shape("n", constraints=(f"n >= {buckets[0]}",))
            exports["symbolic"] = jex.export(fwd, platforms=tuple(platforms))(
                var_specs, *input_specs(n)
            ).serialize()
            mode = "symbolic"
        except Exception:
            if symbolic is True:
                raise
    if mode is None:
        for b in buckets:
            exports[str(b)] = jex.export(fwd, platforms=tuple(platforms))(
                var_specs, *input_specs(b)
            ).serialize()
        mode = "bucketed"

    has_attention = False
    if attention in ("auto", True) and not is_dtfd:
        try:
            afwd = jax.jit(_attn_forward(model, coord_aware))
            if mode == "symbolic":
                (n,) = jex.symbolic_shape("n", constraints=(f"n >= {buckets[0]}",))
                exports["attn_symbolic"] = jex.export(
                    afwd, platforms=tuple(platforms)
                )(var_specs, *input_specs(n)).serialize()
            else:
                for b in buckets:
                    exports[f"attn_{b}"] = jex.export(
                        afwd, platforms=tuple(platforms)
                    )(var_specs, *input_specs(b)).serialize()
            has_attention = True
        except Exception:
            if attention is True:
                raise  # the model does not expose usable return_attn scores

    meta = {
        "format_version": FORMAT_VERSION,
        "model_name": model_name,
        "in_features": int(in_features),
        "batch": int(batch),
        "mode": mode,
        "buckets": list(buckets),
        "attention": has_attention,
        "coord_aware": coord_aware,
        "platforms": list(platforms),
        "portable": bool(portable),
        "jax_version": jax.__version__,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("variables.msgpack", serialization.msgpack_serialize(variables))
        for key, blob in exports.items():
            z.writestr(f"exported/{key}.jexp", blob)
    return meta


def export_slide_bundle(
    backbone_variables: dict,
    head_model,
    head_variables: dict,
    path: str | Path,
    *,
    model_name: str,
    in_features: int,
    calib_tiles: Optional[np.ndarray] = None,
    chunk: int = 128,
    tile_hw: int = 224,
    truncate_after: int = 4,
    head_buckets: Sequence[int] = SLIDE_SERVING_BUCKETS,
    platforms: Sequence[str] = ("tpu", "cpu"),
    portable: bool = True,
    attention: str | bool = "auto",
) -> dict:
    """Write a ``.tdx`` bundle serving the FULL pipeline: raw tiles -> slide
    probabilities (``ServingBundle.predict_slide``), with no model code.

    Packages the production embed stage (int8 PTQ ResNet50 when
    ``calib_tiles`` is given — the path ``inference.SlideInferencePipeline``
    runs — else bf16) as fixed-``chunk`` exports plus the per-bucket head
    exports of :func:`export_serving_bundle`. The embed is exported over the
    FLAT LEAF LIST of the backbone tree, so the loader needs no QResNet50 /
    flax classes: the tree structure is baked into the StableHLO calling
    convention. Two embed variants ship: ``embed_f32`` (normalized tiles) and
    ``embed_u8`` (raw uint8 tiles, ImageNet-normalized on device — 4x less
    host->device transfer, pairs with ``data/native_tiles.load_tiles_u8``).

    Ref: the reference's serving path reloads the LightningModule + RetCCL
    from source per host (``code/test_visualize.py:38-99``); this pins the
    whole tile->probs computation in one artifact.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jex

    if calib_tiles is not None:
        from transmil_deepgraft_tpu.models.resnet_int8 import (
            apply_qresnet50,
            build_qresnet50,
        )

        q = build_qresnet50(backbone_variables, calib_tiles, truncate_after=truncate_after)
        embed_core, backbone_tree, precision = apply_qresnet50, q, "int8"
    else:
        from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

        bb = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0, truncate_after=truncate_after)
        bf16_vars = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            backbone_variables,
        )

        def embed_core(v, t):
            return bb.apply(v, t.astype(jnp.bfloat16)).astype(jnp.float32)

        backbone_tree, precision = bf16_vars, "bf16"

    leaves, treedef = jax.tree.flatten(backbone_tree)
    leaves = [np.asarray(l) for l in leaves]

    def embed_f32(leaf_list, tiles):
        return embed_core(jax.tree.unflatten(treedef, leaf_list), tiles)

    from transmil_deepgraft_tpu.data.native_tiles import IMAGENET_MEAN as _mean
    from transmil_deepgraft_tpu.data.native_tiles import IMAGENET_STD as _std

    def embed_u8(leaf_list, tiles_u8):
        t = (tiles_u8.astype(jnp.float32) / 255.0 - _mean) / _std
        return embed_core(jax.tree.unflatten(treedef, leaf_list), t)

    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    # validate the backbone/head seam BEFORE the expensive exports: eval_shape
    # is near-free, a full ResNet50 export trace is not
    feature_dim = jax.eval_shape(embed_f32, leaf_specs,
                                 jax.ShapeDtypeStruct((chunk, tile_hw, tile_hw, 3), np.float32)).shape[-1]
    if feature_dim != in_features:
        raise ValueError(
            f"backbone produces {feature_dim}-d features but the head expects "
            f"in_features={in_features}"
        )
    exports: dict[str, bytes] = {}
    for key, fn, dt in (("embed_f32", embed_f32, np.float32), ("embed_u8", embed_u8, np.uint8)):
        spec = jax.ShapeDtypeStruct((chunk, tile_hw, tile_hw, 3), dt)
        exports[key] = jex.export(jax.jit(fn), platforms=tuple(platforms))(
            leaf_specs, spec
        ).serialize()

    if portable and getattr(head_model, "fused_inference", False):
        import dataclasses

        head_model = dataclasses.replace(head_model, fused_inference=False)
    coord_aware = bool(getattr(head_model, "coord_aware", False))
    head_fwd = jax.jit(_eval_forward(head_model, model_name in ("DTFD", "DTFDMIL"), coord_aware))
    head_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), head_variables
    )

    def head_input_specs(b):
        specs = [jax.ShapeDtypeStruct((1, b, in_features), np.float32)]
        if coord_aware:
            specs.append(jax.ShapeDtypeStruct((1, b, 2), np.float32))
        return specs

    head_buckets = tuple(sorted(int(b) for b in head_buckets))
    for b in head_buckets:
        exports[str(b)] = jex.export(head_fwd, platforms=tuple(platforms))(
            head_specs, *head_input_specs(b)
        ).serialize()

    has_attention = False
    if attention in ("auto", True) and model_name not in ("DTFD", "DTFDMIL"):
        try:
            afwd = jax.jit(_attn_forward(head_model, coord_aware))
            for b in head_buckets:
                exports[f"attn_{b}"] = jex.export(afwd, platforms=tuple(platforms))(
                    head_specs, *head_input_specs(b)
                ).serialize()
            has_attention = True
        except Exception:
            if attention is True:
                raise

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "slide",
        "model_name": model_name,
        "in_features": int(in_features),
        "batch": 1,
        "mode": "bucketed",
        "buckets": list(head_buckets),
        "attention": has_attention,
        "coord_aware": coord_aware,
        "chunk": int(chunk),
        "tile_hw": int(tile_hw),
        "backbone": precision,
        "platforms": list(platforms),
        "portable": bool(portable),
        "jax_version": jax.__version__,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr(
            "variables.msgpack",
            serialization.msgpack_serialize(
                {"backbone_leaves": leaves, "head": head_variables}
            ),
        )
        for key, blob in exports.items():
            z.writestr(f"exported/{key}.jexp", blob)
    return meta


class ServingBundle:
    """Loaded ``.tdx`` bundle: ``predict(feats)`` with no model code needed.

    Exports deserialize lazily (first call per bucket) and the compiled
    calls are cached, so a long-running server pays each bucket's XLA
    compile exactly once.

    Slide bundles (``export_slide_bundle``) additionally expose
    ``predict_slide(tiles)``: raw tiles stream through the exported embed in
    fixed chunks, features stay on device, and the exported head finishes the
    slide — the full production pipeline from one artifact.
    """

    def __init__(self, meta: dict, variables: dict, exports: dict[str, bytes]):
        self.meta = meta
        self.variables = variables
        self._blobs = exports
        self._calls: dict[str, object] = {}
        self._device_variables = None  # weights staged on device at first call

    def _dev_vars(self):
        # Stage the weights on device ONCE: passing the host-numpy tree to the
        # exported call would re-upload every parameter on every request
        # (hundreds of ms on tunneled links; measurable even on local PCIe).
        if self._device_variables is None:
            import jax

            self._device_variables = jax.device_put(self.variables)
        return self._device_variables

    def _dev_head_vars(self):
        dev = self._dev_vars()
        return dev["head"] if self.meta.get("kind") == "slide" else dev

    @classmethod
    def load(cls, path: str | Path) -> "ServingBundle":
        from flax import serialization

        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
            if meta["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"bundle format {meta['format_version']} is newer than "
                    f"this loader ({FORMAT_VERSION})"
                )
            variables = serialization.msgpack_restore(z.read("variables.msgpack"))
            exports = {
                Path(name).stem: z.read(name)
                for name in z.namelist()
                if name.startswith("exported/")
            }
        return cls(meta, variables, exports)

    def _call_for(self, key: str):
        if key not in self._calls:
            from jax import export as jex

            self._calls[key] = jex.deserialize(self._blobs[key]).call
        return self._calls[key]

    def _pad_target(self, n: int) -> Optional[int]:
        if self.meta["mode"] == "symbolic":
            return max(n, self.meta["buckets"][0])
        for b in self.meta["buckets"]:
            if n <= b:
                return b
        raise ValueError(
            f"bag of {n} tiles exceeds the largest exported bucket "
            f"({self.meta['buckets'][-1]}); re-export with larger buckets"
        )

    def _prepare_one(
        self, feats: np.ndarray, coords: Optional[np.ndarray]
    ) -> tuple[int, int, np.ndarray, Optional[np.ndarray]]:
        """The single-bag input contract — ONE source of truth shared by
        :meth:`_prepare_inputs` (batched predict) and :class:`MicroBatcher`:
        validate dims, zero-pad to the serving bucket (identical to the
        trainer's ``eval_pad='bucket'`` policy, data/datamodule.collate), and
        normalize/synthesize coords for coord-aware bundles. Returns
        ``(n_real, target, (target, D) feats, (target, 2) coords | None)``."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2:
            raise ValueError(f"each bag must be (n, D), got {feats.shape}")
        n, d = feats.shape
        if d != self.meta["in_features"]:
            raise ValueError(f"expected in_features={self.meta['in_features']}, got {d}")
        target = self._pad_target(n)
        if target != n:
            feats = np.concatenate([feats, np.zeros((target - n, d), np.float32)])
        if not self.meta.get("coord_aware"):
            if coords is not None:
                raise ValueError(
                    "this bundle's head is not coord-aware; re-export from a "
                    "coord-aware head (e.g. RoFormerMIL) to use coords"
                )
            return n, target, feats, None
        from transmil_deepgraft_tpu.data.coords import grid_coords, normalize_pad_coords

        if coords is None:
            # grid over the PADDED length: matches both the trainer's staging
            # fallback and what the model itself would synthesize for this
            # padded bag — the bundle reproduces live coord-less eval exactly
            coords = grid_coords(target, 1)[0]
        else:
            coords = np.asarray(coords, np.float32)
            if coords.shape != (n, 2):
                raise ValueError(f"coords must be ({n}, 2), got {coords.shape}")
            # min-normalize then zero-pad (data/coords.py contract: pad rows
            # coincide with the bag min, preserving the head's anchoring)
            coords = normalize_pad_coords(coords, target)
        return n, target, feats, coords

    def _prepare_inputs(
        self, feats: np.ndarray, coords: Optional[np.ndarray]
    ) -> tuple[int, int, tuple]:
        """Validate + bucket-pad a request: returns (n_real, target, args) where
        ``args`` are the exported call's inputs after the variables (bags, and
        coords for coord-aware bundles). Per-bag work delegates to
        :meth:`_prepare_one`."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
            if coords is not None:
                coords = np.asarray(coords, np.float32)[None]
        b, n, d = feats.shape
        if b != self.meta["batch"]:
            raise ValueError(f"bundle exported for batch={self.meta['batch']}, got {b}")
        prepared = [
            self._prepare_one(feats[i], None if coords is None else coords[i])
            for i in range(b)
        ]
        n_real, target = prepared[0][0], prepared[0][1]
        # rectangular-input invariant: the (B, n, D) ndarray guarantees one
        # shared real length today, and predict_logits_with_attention strips
        # padding with the single n — guard it so future ragged/list input
        # support can't silently mis-strip (ADVICE r4)
        if any(p[0] != n_real or p[1] != target for p in prepared[1:]):
            raise ValueError(
                "all bags in one batched call must share a real length/bucket; "
                "send ragged bags as separate requests (MicroBatcher coalesces them)"
            )
        out_feats = np.stack([p[2] for p in prepared])
        if prepared[0][3] is None:
            return n_real, target, (out_feats,)
        return n_real, target, (out_feats, np.stack([p[3] for p in prepared]))

    def predict_logits(self, feats: np.ndarray, coords: Optional[np.ndarray] = None) -> np.ndarray:
        """(n, D) or (B, n, D) float32 features -> (B, C) logits.

        Coord-aware bundles (``meta['coord_aware']``, RoFormerMIL) accept the
        tiles' (n, 2) grid coords; without them the square-grid fallback the
        model itself uses for coord-less bags is synthesized."""
        _, target, args = self._prepare_inputs(feats, coords)
        key = "symbolic" if self.meta["mode"] == "symbolic" else str(target)
        return np.asarray(self._call_for(key)(self._dev_head_vars(), *args))

    def predict(self, feats: np.ndarray, coords: Optional[np.ndarray] = None) -> np.ndarray:
        """(n, D) or (B, n, D) features -> (B, C) class probabilities."""
        logits = self.predict_logits(feats, coords)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def predict_logits_with_attention(
        self, feats: np.ndarray, coords: Optional[np.ndarray] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(n, D) or (B, n, D) features -> ((B, C) logits, (B, n) per-tile
        attention scores) via the exported ``return_attn`` forward (requires
        ``meta['attention']``; heads averaged, padding scores stripped)."""
        if not self.meta.get("attention"):
            raise ValueError(
                "bundle exported without attention; re-export with attention=True"
            )
        n, target, args = self._prepare_inputs(feats, coords)
        key = "attn_symbolic" if self.meta["mode"] == "symbolic" else f"attn_{target}"
        logits, scores = self._call_for(key)(self._dev_head_vars(), *args)
        return np.asarray(logits), np.asarray(scores)[:, :n]

    # ------------------------------------------------------- slide bundles
    def embed_tiles(self, tiles: np.ndarray):
        """(N, H, W, 3) float32 (normalized) or uint8 (raw) tiles -> (N, D)
        features, LEFT ON DEVICE (a jax array): the chunked exported embed
        with device-side concatenation, zero feature round-trips."""
        if self.meta.get("kind") != "slide":
            raise ValueError("not a slide bundle: export with export_slide_bundle")
        from transmil_deepgraft_tpu.inference import chunked_device_embed

        hw = int(self.meta["tile_hw"])
        tiles = np.asarray(tiles)
        if np.issubdtype(tiles.dtype, np.integer) and tiles.dtype != np.uint8:
            # e.g. JSON-decoded raw pixels arrive as int64: raw pixels belong
            # on the u8 path (on-device normalization) — silently casting
            # them to f32 would feed UNNORMALIZED values to the f32 export
            if tiles.size and (tiles.min() < 0 or tiles.max() > 255):
                raise ValueError(
                    "integer tiles must be raw pixels in [0, 255] (uint8 "
                    "path); send float32 for pre-normalized tiles"
                )
            tiles = tiles.astype(np.uint8)
        elif tiles.dtype != np.uint8:
            tiles = tiles.astype(np.float32, copy=False)  # exports are dtype-exact
        if tiles.ndim != 4 or tiles.shape[1:] != (hw, hw, 3):
            raise ValueError(f"expected tiles (N, {hw}, {hw}, 3), got {tiles.shape}")
        call = self._call_for("embed_u8" if tiles.dtype == np.uint8 else "embed_f32")
        # list(): msgpack restore may hand the leaf sequence back as a tuple,
        # which is a different pytree structure than the exported list
        leaves = list(self._dev_vars()["backbone_leaves"])
        return chunked_device_embed(
            lambda b: call(leaves, b), tiles, int(self.meta["chunk"])
        )

    def _slide_coord_args(self, coords, n: int, target: int) -> tuple:
        """Head-input coords for a coord-aware slide bundle (see
        ``_prepare_inputs`` for the feature-bundle twin)."""
        if not self.meta.get("coord_aware"):
            if coords is not None:
                raise ValueError(
                    "this slide bundle's head is not coord-aware; re-export "
                    "from a coord-aware head (e.g. RoFormerMIL) to use coords"
                )
            return ()
        from transmil_deepgraft_tpu.data.coords import grid_coords, normalize_pad_coords

        if coords is None:
            return (grid_coords(target, 1),)
        coords = np.asarray(coords, np.float32)
        if coords.shape != (n, 2):
            raise ValueError(f"coords must be ({n}, 2), got {coords.shape}")
        return (normalize_pad_coords(coords, target)[None],)

    def predict_slide_logits(
        self, tiles: np.ndarray, coords: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """(N, H, W, 3) tiles (f32 normalized or u8 raw) -> (C,) slide logits.
        ``coords`` ((N, 2) tile grid positions) feed coord-aware heads."""
        import jax.numpy as jnp

        n = int(np.shape(tiles)[0])
        target = self._pad_target(n)  # BEFORE the ~seconds-long embed: a bag
        # beyond the largest exported bucket must fail fast, not post-embed
        cargs = self._slide_coord_args(coords, n, target)
        feats = self.embed_tiles(tiles)
        if target != n:  # zero-pad the bag ON DEVICE to the head bucket
            feats = jnp.pad(feats, ((0, target - n), (0, 0)))
        key = "symbolic" if self.meta["mode"] == "symbolic" else str(target)
        return np.asarray(
            self._call_for(key)(self._dev_head_vars(), feats[None], *cargs)
        )[0]

    def predict_slide(self, tiles: np.ndarray, coords: Optional[np.ndarray] = None) -> np.ndarray:
        """(N, H, W, 3) tiles -> (C,) slide class probabilities."""
        logits = self.predict_slide_logits(tiles, coords)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def predict_slide_logits_with_attention(
        self, tiles: np.ndarray, coords: Optional[np.ndarray] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(N, H, W, 3) tiles -> ((C,) logits, (N,) per-tile attention scores)."""
        if not self.meta.get("attention"):
            raise ValueError(
                "bundle exported without attention; re-export with attention=True"
            )
        import jax.numpy as jnp

        n = int(np.shape(tiles)[0])
        target = self._pad_target(n)
        cargs = self._slide_coord_args(coords, n, target)
        feats = self.embed_tiles(tiles)
        if target != n:
            feats = jnp.pad(feats, ((0, target - n), (0, 0)))
        logits, scores = self._call_for(f"attn_{target}")(
            self._dev_head_vars(), feats[None], *cargs
        )
        return np.asarray(logits)[0], np.asarray(scores)[0, :n]

    def predict_slide_with_attention(
        self, tiles: np.ndarray, coords: Optional[np.ndarray] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(N, H, W, 3) tiles -> ((C,) probs, (N,) per-tile attention scores)
        — the served equivalent of
        ``SlideInferencePipeline.predict_slide_with_attention`` (heatmap /
        top-k tile selection from the artifact alone)."""
        logits, scores = self.predict_slide_logits_with_attention(tiles, coords)
        e = np.exp(logits - logits.max())
        return e / e.sum(), scores


class QueueFullError(RuntimeError):
    """MicroBatcher admission control: the pending-request queue is at its
    configured bound; the caller should shed (HTTP 503 + Retry-After) rather
    than let latency grow without limit (VERDICT r4 item 5)."""

    def __init__(self, depth: int, max_queue: int, retry_after_s: float) -> None:
        super().__init__(
            f"serving queue full ({depth}/{max_queue} pending); retry in "
            f"~{retry_after_s:.1f}s"
        )
        self.depth = depth
        self.max_queue = max_queue
        self.retry_after_s = retry_after_s


class MicroBatcher:
    """Cross-request micro-batching for a :class:`ServingBundle` under
    concurrent load (VERDICT r3 item 5: the serving daemon previously wrapped
    every predict in one global lock — head-of-line blocking with zero
    batching).

    A single dispatcher thread owns device dispatch (one chip, one program at
    a time — the correct serialization); request threads do their own
    validation/bucket-padding (parallel host work), enqueue a prepared bag,
    and block on a future. The dispatcher coalesces up to ``meta['batch']``
    queued bags OF THE SAME BUCKET into one exported-program call, waiting at
    most ``max_wait_ms`` for stragglers once the first bag is in hand —
    concurrent clients hitting the same bucket ride one device dispatch
    instead of queueing N serialized calls. Bags for other buckets are never
    blocked behind an in-progress coalesce window (they defer to the next
    dispatch, exactly one dispatch behind).

    Export with ``batch=N`` (``export_serving_bundle(..., batch=N)``) to give
    the batcher room; with ``batch=1`` it degrades gracefully to a fair FIFO
    pipeline (still no global lock around host-side decode).
    """

    _CLOSE = object()

    def __init__(self, bundle: "ServingBundle", max_wait_ms: float = 2.0,
                 device_lock=None, max_queue: int = 128) -> None:
        import queue as _queue
        import threading

        self.bundle = bundle
        self.eb = int(bundle.meta.get("batch", 1))
        self.max_wait_s = max_wait_ms / 1e3
        # back-pressure bound: requests admitted (enqueued or in flight) but
        # not yet answered; at the bound _enqueue raises QueueFullError so the
        # server sheds instead of growing client latency without limit
        self.max_queue = int(max_queue)
        self._depth = 0
        self._depth_lock = threading.Lock()
        self._q: "_queue.Queue" = _queue.Queue()
        self._queue_mod = _queue
        # serializes device use with OTHER device users (e.g. the daemon's
        # /predict_slide path); the dispatcher holds it per dispatch
        self._device_lock = device_lock or threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @property
    def queue_depth(self) -> int:
        """Requests admitted but not yet answered (queued + in dispatch)."""
        with self._depth_lock:
            return self._depth

    def _release(self, k: int = 1) -> None:
        with self._depth_lock:
            self._depth -= k

    # ------------------------------------------------------------- public API
    def predict_logits(self, feats: np.ndarray,
                       coords: Optional[np.ndarray] = None) -> np.ndarray:
        """(n, D) / (B, n, D) features -> (B, C) logits (B bags enqueue as B
        independent micro-batchable requests)."""
        from concurrent.futures import Future

        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        if feats.ndim != 3:
            raise ValueError(f"features must be (n, D) or (B, n, D), got {feats.shape}")
        futures: list[Future] = []
        for i in range(feats.shape[0]):
            futures.append(self._enqueue(feats[i], None if coords is None else coords[i]))
        return np.stack([f.result() for f in futures])

    def predict(self, feats: np.ndarray, coords: Optional[np.ndarray] = None) -> np.ndarray:
        logits = self.predict_logits(feats, coords)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def close(self) -> None:
        self._q.put(self._CLOSE)
        self._thread.join(timeout=5)

    # ---------------------------------------------------------------- internal
    def _enqueue(self, feats: np.ndarray, coords):
        """Admission-check, then validate + bucket-pad ON THE REQUEST THREAD
        via the bundle's single-bag contract (:meth:`ServingBundle._prepare_one`
        — one source of truth with the batched predict path); returns a Future."""
        from concurrent.futures import Future

        # admit BEFORE the (allocation-heavy) pad work: at the bound the
        # request sheds cheaply; the slot is released when its future resolves
        with self._depth_lock:
            if self._depth >= self.max_queue:
                raise QueueFullError(
                    self._depth, self.max_queue,
                    # rough drain estimate: pending dispatches at the coalesce
                    # window each (the device time itself is bundle-dependent)
                    retry_after_s=max(1.0, self._depth * self.max_wait_s),
                )
            self._depth += 1
        try:
            _, target, feats, coords = self.bundle._prepare_one(feats, coords)
        except BaseException:
            self._release()
            raise
        fut: Future = Future()
        call_key = "symbolic" if self.bundle.meta["mode"] == "symbolic" else str(target)
        # group key includes target: symbolic bundles share one exported call
        # but bags only stack when their padded lengths agree
        self._q.put(((call_key, target), target, feats, coords, fut))
        return fut

    def _run(self) -> None:
        import time as _time
        from collections import deque

        pending: deque = deque()

        def shutdown(final_group=None):
            """Dispatch what's in hand, then FAIL every undelivered future —
            deferred requests and anything still queued behind _CLOSE must not
            leave their callers blocked on Future.result() forever."""
            if final_group:
                self._dispatch(final_group)
            leftovers = list(pending)
            while True:
                try:
                    it = self._q.get_nowait()
                except self._queue_mod.Empty:
                    break
                if it is not self._CLOSE:
                    leftovers.append(it)
            for it in leftovers:
                fut = it[-1]
                if not fut.done():
                    fut.set_exception(RuntimeError("MicroBatcher closed before dispatch"))
            self._release(len(leftovers))

        while True:
            item = pending.popleft() if pending else self._q.get()
            if item is self._CLOSE:
                shutdown()
                return
            key = item[0]
            group = [item]
            # coalesce compatibles already deferred, oldest first
            for other in list(pending):
                if len(group) >= self.eb:
                    break
                if other[0] == key:
                    pending.remove(other)
                    group.append(other)
            # then wait (briefly) for stragglers on the live queue
            deadline = _time.monotonic() + self.max_wait_s
            while len(group) < self.eb:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except self._queue_mod.Empty:
                    break
                if nxt is self._CLOSE:
                    shutdown(final_group=group)
                    return
                if nxt[0] == key and len(group) < self.eb:
                    group.append(nxt)
                else:
                    pending.append(nxt)
            self._dispatch(group)

    def _dispatch(self, group: list) -> None:
        _, target, f0, c0, _ = group[0]
        k = len(group)
        feats = np.stack([g[2] for g in group])
        pad = self.eb - k
        if pad:  # fill the exported batch with zero bags
            feats = np.concatenate([feats, np.zeros((pad, *f0.shape), np.float32)])
        args = (feats,)
        if c0 is not None:
            coords = np.stack([g[3] for g in group])
            if pad:
                coords = np.concatenate([coords, np.zeros((pad, *c0.shape), np.float32)])
            args = (feats, coords)
        call_key = group[0][0][0]
        try:
            with self._device_lock:
                logits = np.asarray(
                    self.bundle._call_for(call_key)(self.bundle._dev_head_vars(), *args)
                )
            for i, (_, _, _, _, fut) in enumerate(group):
                fut.set_result(logits[i])
        except Exception as e:  # noqa: BLE001 — deliver to every waiter
            for _, _, _, _, fut in group:
                if not fut.done():
                    fut.set_exception(e)
        finally:
            self._release(len(group))
