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


def _cluster_env_detected() -> bool:
    """Best-effort: does the environment look like a multi-process job?"""
    import os

    if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
        return True
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return "MEGASCALE_COORDINATOR_ADDRESS" in os.environ


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    cpu_collectives: str | None = None,
) -> tuple[int, int]:
    """Join a multi-host TPU job; returns (process_index, process_count).

    On TPU pods/slices the runtime provides everything and a bare
    ``init_multihost()`` suffices (args are only needed for CPU/GPU
    clusters). Call FIRST — before any jax computation — because joining is
    impossible once the local XLA backend is initialized (this function does
    not itself touch the backend before joining); safe to call in
    single-process runs (no-op). After this, ``jax.devices()`` is global,
    :func:`make_mesh` spans the slice, GSPMD collectives ride ICI/DCN, and
    the input pipeline shards per host via ``data.pipeline.shard_for_host``
    (which reads ``jax.process_index()``). Replaces the reference's
    Lightning/NCCL process-group setup (``code/train.py:177-201``).

    ``cpu_collectives``: cross-process collective implementation for CPU
    clusters (``'gloo'`` / ``'mpi'``) — the NCCL-role equivalent when the
    mesh spans CPU processes (tested end-to-end by
    ``tests/test_multiprocess_distributed.py``); must be set before the
    backend initializes, so pass it here rather than flipping the jax
    config afterwards. Ignored on TPU (ICI/DCN collectives are built in).
    """
    explicit = bool(coordinator_address) or (num_processes or 1) > 1
    try:
        from jax._src import xla_bridge as _xb

        backend_up = _xb.backends_are_initialized()
    except Exception:  # private API moved: fall back to attempting the join
        backend_up = False
    if backend_up:
        if jax.process_count() > 1:  # some earlier call already joined
            return jax.process_index(), jax.process_count()
        if explicit or _cluster_env_detected():
            # Joining now is impossible, and silently running N independent
            # single-host jobs (each seeing the full dataset) is the worst
            # failure mode — refuse instead.
            raise RuntimeError(
                "init_multihost() must run before any JAX computation "
                "initializes the XLA backend (a multi-process environment "
                "was requested/detected but the local backend is already up)"
            )
        return jax.process_index(), jax.process_count()  # single-process dev
    try:
        if cpu_collectives:
            jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        if explicit or _cluster_env_detected():
            raise  # a requested/real cluster join must not fail silently
        # argless auto-detect found no cluster: plain single-process run
    return jax.process_index(), jax.process_count()


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    dp: int | None = None,
    sp: int = 1,
) -> Mesh:
    """Mesh with axes ('dp', 'sp'). Default: all devices on dp, sp=1.

    Multi-host: pass ``jax.devices()`` AFTER :func:`init_multihost` — the
    global device list builds one mesh spanning every host; per-host batch
    feeding composes with ``shard_batch`` (GSPMD assembles the global array
    from per-host shards)."""
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
