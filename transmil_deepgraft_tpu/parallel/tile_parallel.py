"""Tile-parallel slide embedding: shard the patch batch over chips.

The <1 s/slide path at its achievable scale (BENCHMARKS.md: one v5e chip is
int8-physics-bound at 0.85 s for a 40,960-patch slide — the reference itself
throws an 8-GPU node at this workload, ``code/train.py:177-201``). Tiles are
embarrassingly parallel, so the embed stage scales linearly over an ICI mesh:
the (N, H, W, 3) tile batch is sharded over the ``dp`` axis, every chip runs
the identical int8 backbone on its shard (params replicated — ~25 MB int8,
negligible), and the (N, D) features either all-gather (one collective of
N*D*4 bytes over ICI) or stay dp-sharded to feed the sp-sharded Nyström head
(``parallel/sp_nystrom``) without any gather.

This is GSPMD-native: no explicit collectives — the sharding annotations on a
plain ``jit`` are the whole implementation, XLA inserts the all-gather where
the output sharding requires it.

Numerics: per-tile compute is independent of the batch sharding, so the
dp-sharded embed is bit-exact vs single-device (tests/test_tile_parallel.py
asserts equality on an 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_to_multiple(tiles: np.ndarray | jax.Array, k: int) -> tuple[Any, int]:
    """Zero-pad the batch dim up to a multiple of ``k``; returns (padded, n)."""
    n = tiles.shape[0]
    pad = (-n) % k
    if pad:
        tiles = jnp.concatenate(
            [jnp.asarray(tiles), jnp.zeros((pad, *tiles.shape[1:]), tiles.dtype)], axis=0
        )
    return tiles, n


def make_tile_parallel_embed(
    embed_fn: Callable[[Any, jax.Array], jax.Array],
    mesh: Mesh,
    *,
    axis: str = "dp",
    gather: bool = True,
) -> Callable[[Any, Any], jax.Array]:
    """Compile ``embed_fn(static, tiles) -> features`` with tiles sharded over
    ``axis`` and params replicated.

    ``gather=True`` returns replicated features (XLA all-gathers over ICI);
    ``gather=False`` leaves features ``axis``-sharded for a sharded head.
    The returned callable zero-pads the batch to a multiple of the axis size
    and strips the padding after the gather."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    out_sharding = repl if gather else data
    n_shards = mesh.shape[axis]

    jitted = jax.jit(embed_fn, in_shardings=(repl, data), out_shardings=out_sharding)

    def run(static: Any, tiles: Any) -> jax.Array:
        padded, n = pad_to_multiple(tiles, n_shards)
        feats = jitted(static, padded)
        return feats[:n]

    return run


# jax.jit caches per wrapper object, so the jitted runner must be reused
# across calls — rebuilding it per slide would recompile the full backbone
# every invocation. Keyed on (embed_fn, mesh, axis); both are hashable.
# Bounded LRU: a caller that builds a fresh lambda per slide would otherwise
# pin every compiled runner (and its captured weights) forever. Callers with
# many long-lived embed fns should hold make_tile_parallel_embed's runner
# directly instead of going through this convenience cache.
_RUN_CACHE_MAX = 8
_RUN_CACHE: "dict" = {}  # insertion-ordered; re-insert on hit for LRU


def tile_parallel_slide_embed(
    embed_fn: Callable[[Any, jax.Array], jax.Array],
    static: Any,
    tiles: Any,
    mesh: Mesh,
    *,
    chunk: int | None = None,
    axis: str = "dp",
) -> jax.Array:
    """Embed one slide's tiles over the mesh, optionally in fixed chunks of
    ``chunk * axis_size`` tiles (one compiled program regardless of N, the
    serving pattern of ``SlideInferencePipeline``)."""
    n_shards = mesh.shape[axis]
    key = (embed_fn, mesh, axis)
    run = _RUN_CACHE.pop(key, None)
    if run is None:
        run = make_tile_parallel_embed(embed_fn, mesh, axis=axis)
        while len(_RUN_CACHE) >= _RUN_CACHE_MAX:
            _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
    _RUN_CACHE[key] = run  # (re-)insert at the end: LRU order
    if chunk is None:
        return run(static, tiles)
    step = chunk * n_shards
    padded, n = pad_to_multiple(tiles, step)
    outs = [run(static, padded[i : i + step]) for i in range(0, padded.shape[0], step)]
    return jnp.concatenate(outs, axis=0)[:n]
