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


def _eval_forward(model, is_dtfd: bool):
    """The trainer's deterministic eval forward (trainer._forward_logits)."""

    def fwd(variables, bags):
        out = model.apply(variables, bags, deterministic=True)
        if is_dtfd:  # (sub-bag logits, slide logits) -> slide logits
            return out[1]
        return out

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
) -> dict:
    """Write a ``.tdx`` serving bundle; returns its meta dict.

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
    fwd = jax.jit(_eval_forward(model, is_dtfd))
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), variables
    )
    buckets = tuple(sorted(int(b) for b in buckets))

    exports: dict[str, bytes] = {}
    mode = None
    if symbolic in ("auto", True):
        try:
            (n,) = jex.symbolic_shape("n", constraints=(f"n >= {buckets[0]}",))
            spec = jax.ShapeDtypeStruct((batch, n, in_features), np.float32)
            exports["symbolic"] = jex.export(fwd, platforms=tuple(platforms))(
                var_specs, spec
            ).serialize()
            mode = "symbolic"
        except Exception:
            if symbolic is True:
                raise
    if mode is None:
        for b in buckets:
            spec = jax.ShapeDtypeStruct((batch, b, in_features), np.float32)
            exports[str(b)] = jex.export(fwd, platforms=tuple(platforms))(
                var_specs, spec
            ).serialize()
        mode = "bucketed"

    meta = {
        "format_version": FORMAT_VERSION,
        "model_name": model_name,
        "in_features": int(in_features),
        "batch": int(batch),
        "mode": mode,
        "buckets": list(buckets),
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


class ServingBundle:
    """Loaded ``.tdx`` bundle: ``predict(feats)`` with no model code needed.

    Exports deserialize lazily (first call per bucket) and the compiled
    calls are cached, so a long-running server pays each bucket's XLA
    compile exactly once.
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

    def predict_logits(self, feats: np.ndarray) -> np.ndarray:
        """(n, D) or (B, n, D) float32 features -> (B, C) logits.

        Bags are zero-padded to the serving shape — identical to the
        trainer's ``eval_pad='bucket'`` policy (data/datamodule.collate).
        """
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        b, n, d = feats.shape
        if d != self.meta["in_features"]:
            raise ValueError(f"expected in_features={self.meta['in_features']}, got {d}")
        if b != self.meta["batch"]:
            raise ValueError(f"bundle exported for batch={self.meta['batch']}, got {b}")
        target = self._pad_target(n)
        if target != n:
            feats = np.concatenate(
                [feats, np.zeros((b, target - n, d), np.float32)], axis=1
            )
        key = "symbolic" if self.meta["mode"] == "symbolic" else str(target)
        return np.asarray(self._call_for(key)(self._dev_vars(), feats))

    def predict(self, feats: np.ndarray) -> np.ndarray:
        """(n, D) or (B, n, D) features -> (B, C) class probabilities."""
        logits = self.predict_logits(feats)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)
