"""Persistent XLA compilation cache.

TransMIL + ResNet50 compiles take minutes through a remote-compile relay; the
persistent cache serializes executables to disk so every process after the
first starts hot. Called by the CLI, bench.py and __graft_entry__.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.environ.get("TDT_JAX_CACHE_DIR", "/tmp/tdt_jax_cache")


def enable_compilation_cache(directory: str | None = None) -> None:
    directory = directory or _DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
