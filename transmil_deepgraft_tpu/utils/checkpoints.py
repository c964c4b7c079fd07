"""Checkpointing with metric-keyed retention.

Equivalent of the reference's three ModelCheckpoint callbacks + save_last
(ref ``code/utils/utils.py:195-218``): retain top-3 by val_loss (min), top-1 by
val_auc (max), top-3 by val_accuracy (max), plus ``last``. Checkpoints are
pytrees of ``{params, opt_state?, epoch, metrics, hparams}``; filenames embed
epoch and monitored metrics like the reference's.

Two storage backends:

- ``msgpack`` (default): single-file flax serialization — fast, simple,
  self-contained, right for the single-host training the reference does.
- ``orbax``: directory-per-checkpoint via orbax-checkpoint — the JAX-ecosystem
  standard; use for multi-host sharded train states or when other orbax tooling
  must read the checkpoints.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str | Path, tree: Any, backend: str = "msgpack") -> None:
    """Atomic save: the full serialization lands in a ``.tmp`` sibling first and
    is swapped in afterwards, so a preemption mid-write (the exact event the
    trainer's ``autosave_steps`` exists for) can never leave a truncated
    ``last.ckpt`` — the previous complete checkpoint survives until the new one
    is fully on disk."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = jax.tree.map(np.asarray, jax.device_get(tree))
    tmp = path.with_name(path.name + ".tmp")
    if backend == "msgpack":
        tmp.write_bytes(serialization.to_bytes(tree))
        os.replace(tmp, path)  # atomic on POSIX
    elif backend == "orbax":
        import orbax.checkpoint as ocp

        if tmp.exists():
            shutil.rmtree(tmp) if tmp.is_dir() else tmp.unlink()
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            ckptr.save(tmp.resolve(), tree)
        # Directory swap can't be a single rename over a non-empty target:
        # park the old checkpoint aside, rename the complete new one in, then
        # drop the old. A complete checkpoint exists on disk at every instant.
        old = path.with_name(path.name + ".old")
        if old.exists():
            shutil.rmtree(old) if old.is_dir() else old.unlink()
        if path.exists():
            os.rename(path, old)
        os.rename(tmp, path)
        if old.exists():
            shutil.rmtree(old) if old.is_dir() else old.unlink()
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")


def load_pytree(path: str | Path, target: Any, backend: str | None = None) -> Any:
    """``backend=None`` autodetects: orbax checkpoints are directories."""
    path = Path(path)
    if not path.exists():
        # The orbax directory swap in save_pytree has a one-rename window where
        # the checkpoint exists only under ``.old`` (kill between the two
        # renames). Recover it transparently instead of reporting no ckpt.
        old = path.with_name(path.name + ".old")
        if old.exists():
            path = old
    if backend is None:
        backend = "orbax" if path.is_dir() else "msgpack"
    if backend == "msgpack":
        return serialization.from_bytes(target, path.read_bytes())
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            restored = ckptr.restore(path.resolve())
        # Reassemble structure-aware: orbax (target-less) returns dicts (field
        # names for namedtuples) and positional lists for tuples; adapt lists
        # to flax's {'0'..'N'} state-dict form and let from_state_dict place
        # every leaf by key (a flatten-order zip would scramble >10 positional
        # children because dict keys sort lexicographically).
        target_sd = serialization.to_state_dict(target)

        def _as_state_dict(x, tgt):
            if x is None and isinstance(tgt, dict) and not tgt:
                return {}  # orbax stores empty subtrees (e.g. model_state) as None
            if isinstance(x, (list, tuple)):
                tgt = tgt if isinstance(tgt, dict) else {}
                return {str(i): _as_state_dict(v, tgt.get(str(i))) for i, v in enumerate(x)}
            if isinstance(x, dict):
                tgt = tgt if isinstance(tgt, dict) else {}
                return {k: _as_state_dict(v, tgt.get(k)) for k, v in x.items()}
            return x

        return serialization.from_state_dict(target, _as_state_dict(restored, target_sd))
    raise ValueError(f"unknown checkpoint backend {backend!r}")


@dataclass
class Monitor:
    name: str
    mode: str  # 'min' | 'max'
    top_k: int
    kept: list[tuple[float, str]] = field(default_factory=list)  # (value, filename)

    def better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def consider(self, value: float, filename: str) -> tuple[bool, str | None]:
        """Returns (keep, evicted_filename)."""
        if len(self.kept) < self.top_k:
            self.kept.append((value, filename))
            self._sort()
            return True, None
        worst_value, worst_file = self.kept[-1]
        if self.better(value, worst_value):
            self.kept[-1] = (value, filename)
            self._sort()
            return True, worst_file
        return False, None

    def _sort(self) -> None:
        self.kept.sort(key=lambda t: t[0], reverse=(self.mode == "max"))

    def best(self) -> tuple[float, str] | None:
        return self.kept[0] if self.kept else None


class CheckpointManager:
    """Multi-monitor top-k retention over flax-serialized checkpoint files."""

    DEFAULT_MONITORS = (
        ("val_loss", "min", 3),
        ("val_auc", "max", 1),
        ("val_accuracy", "max", 3),
    )

    def __init__(
        self, directory: str | Path, monitors=DEFAULT_MONITORS, backend: str = "msgpack"
    ) -> None:
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitors = {name: Monitor(name, mode, k) for name, mode, k in monitors}
        self.backend = backend

    def save_epoch(
        self, tree: Any, epoch: int, metrics: dict[str, float], last_tree: Any = None
    ) -> list[str]:
        """Save ``last`` and any monitor-qualifying checkpoints; returns saved
        names. ``last_tree`` (default: ``tree``) is what ``last.ckpt`` gets -
        the trainer passes the full train state there while metric-keyed
        checkpoints stay weights-only (reference save_weights_only=True)."""
        saved = []
        save_pytree(
            self.dir / "last.ckpt",
            last_tree if last_tree is not None else tree,
            backend=self.backend,
        )
        (self.dir / "last.json").write_text(json.dumps({"epoch": epoch, **metrics}))
        saved.append("last.ckpt")

        refcounts: dict[str, int] = {}
        for mon in self.monitors.values():
            for _, f in mon.kept:
                refcounts[f] = refcounts.get(f, 0) + 1

        parts = [f"epoch={epoch:02d}"] + [
            f"{k}={metrics[k]:.4f}" for k in self.monitors if k in metrics
        ]
        filename = "-".join(parts) + ".ckpt"

        wanted = False
        evicted: list[str] = []
        for name, mon in self.monitors.items():
            if name not in metrics:
                continue
            keep, evict = mon.consider(float(metrics[name]), filename)
            wanted = wanted or keep
            if evict:
                evicted.append(evict)

        if wanted:
            save_pytree(self.dir / filename, tree, backend=self.backend)
            saved.append(filename)
        for f in evicted:
            still_referenced = any(f == kf for mon in self.monitors.values() for _, kf in mon.kept)
            target = self.dir / f
            if not still_referenced and target.exists():
                shutil.rmtree(target) if target.is_dir() else target.unlink()
        return saved

    def best_path(self, monitor: str = "val_auc") -> Path | None:
        best = self.monitors[monitor].best()
        return self.dir / best[1] if best else None

    def last_path(self) -> Path:
        return self.dir / "last.ckpt"
