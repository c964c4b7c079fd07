"""Device-mesh construction and sharding helpers.

The reference's distribution surface is Lightning DDP over NCCL
(``code/train.py:177-201``); the TPU-native equivalent is a single
``jax.sharding.Mesh`` over ICI with data-parallel pjit: batches shard over the
``dp`` axis, params/opt-state replicate, gradients mean via XLA's automatic
``psum`` under jit, eval outputs gather back to host. The mesh also carries a
``sp`` (sequence/bag) axis - unused by default (SURVEY.md section 2.5: bag lengths
never need sequence sharding) but wired so giant-bag sharding is one spec change.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    dp: int | None = None,
    sp: int = 1,
) -> Mesh:
    """Mesh with axes ('dp', 'sp'). Default: all devices on dp, sp=1."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp({dp}) * sp({sp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over dp."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
