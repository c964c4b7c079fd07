"""Tensor-parallel sharding specs for the TransMIL head.

The reference's only parallelism is DDP data-parallel (NCCL via Lightning,
``train.py:184``); at TransMIL's ~3M-param scale tp is never *required*. This
module exists for the multi-chip story anyway: Megatron-style column/row
parallelism over a ``tp`` mesh axis, expressed purely as parameter
``PartitionSpec``s — GSPMD keeps semantics and inserts the all-reduce after
the row-parallel out-projection; activations stay data-sharded.

  to_qkv kernel (d, 3*inner)  -> P(None, 'tp')   (column parallel)
  to_out kernel (inner, d)    -> P('tp', None)   (row parallel; psum output)
  everything else             -> P()             (replicated)

Works for any model embedding TransLayer blocks (TransMIL, TransformerMIL's
``to_qkv/to_out`` naming differs — extend the match list as heads are added).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def transmil_tp_specs(params, axis: str = "tp"):
    """PartitionSpec pytree for a TransMIL-family param tree."""

    def spec_for(path) -> P:
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if "to_qkv" in keys and keys[-1] == "kernel":
            return P(None, axis)
        if "to_out" in keys and keys[-1] == "kernel":
            return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(lambda p, _: spec_for(p), params)


def tp_shardings(mesh: Mesh, params, axis: str = "tp"):
    """NamedSharding pytree ready for ``jax.device_put`` / ``jit`` shardings."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), transmil_tp_specs(params, axis)
    )
