"""Sequence-parallel Nystrom attention over the mesh 'sp' axis.

The reference handles long bags purely algorithmically (Nystrom O(n*m); SURVEY.md
section 5) - no sequence parallelism exists there. On TPU the landmark structure
shards naturally over ICI for bags beyond single-chip HBM: tokens split
contiguously over 'sp', and

- landmarks: each shard computes its local m/sp segment means; one small
  ``all_gather`` (m x d) replicates them,
- the landmark Gram softmax + Newton-Schulz pinv run replicated (m x m, tiny),
- ``attn1``: local query rows attend to the gathered landmarks (no comms),
- ``attn3 @ v``: the landmark-to-token softmax normalizes across shards with a
  max/sum ``pmax``/``psum`` pair (distributed online softmax), and the (m, d)
  value contraction reduces with one ``psum``,
- output rows stay sharded over 'sp' - per-chip memory is O(n/sp * d).

Implemented with ``shard_map`` so the collectives are explicit and ride ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv


def sp_nystrom_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
) -> jax.Array:
    """Nystrom attention with the token axis sharded over mesh axis 'sp'.

    q, k, v: (b, h, n, d) with n divisible by sp * num_landmarks-segments;
    requires ``num_landmarks % sp == 0``. Returns (b, h, n, d) sharded over n.
    Matches ``ops.nystrom.nystrom_attention(...).out`` numerics.
    """
    b, h, n, d = q.shape
    m = num_landmarks
    sp = mesh.shape["sp"]
    if m % sp != 0:
        raise ValueError(f"num_landmarks {m} must divide over sp={sp}")
    if n % (m) != 0 or (n // sp) % (n // m) != 0:
        raise ValueError(
            f"token count {n} must be a multiple of landmarks {m}, with segment "
            f"length n/m dividing the shard size n/sp"
        )

    def local(q_loc, k_loc, v_loc):
        # q_loc: (b, h, n/sp, d)
        acc = jnp.float32
        n_loc = q_loc.shape[2]
        seg = n // m  # global segment length
        m_loc = n_loc // seg

        q_loc = q_loc.astype(acc) * (d ** -0.5)
        k_loc = k_loc.astype(acc)
        v_loc = v_loc.astype(acc)

        q_lm_loc = jnp.mean(q_loc.reshape(b, h, m_loc, seg, d), axis=3)
        k_lm_loc = jnp.mean(k_loc.reshape(b, h, m_loc, seg, d), axis=3)
        # gather the full landmark sets (small: m x d)
        q_lm = jax.lax.all_gather(q_lm_loc, "sp", axis=2, tiled=True)  # (b, h, m, d)
        k_lm = jax.lax.all_gather(k_lm_loc, "sp", axis=2, tiled=True)

        # replicated tiny work
        attn2 = jax.nn.softmax(
            jnp.einsum("bhmd,bhld->bhml", q_lm, k_lm, preferred_element_type=acc), axis=-1
        )
        attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)

        # attn3 @ v with distributed row-softmax over the sharded token axis
        s_loc = jnp.einsum("bhmd,bhnd->bhmn", q_lm, k_loc, preferred_element_type=acc)
        row_max = jax.lax.pmax(jnp.max(s_loc, axis=-1), "sp")  # (b, h, m)
        p_loc = jnp.exp(s_loc - row_max[..., None])
        denom = jax.lax.psum(jnp.sum(p_loc, axis=-1), "sp")  # (b, h, m)
        pv_loc = jnp.einsum("bhmn,bhnd->bhmd", p_loc, v_loc, preferred_element_type=acc)
        attn3_v = jax.lax.psum(pv_loc, "sp") / denom[..., None]  # (b, h, m, d)

        # local output rows
        attn1_loc = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q_loc, k_lm, preferred_element_type=acc), axis=-1
        )
        left = jnp.einsum("bhnm,bhml->bhnl", attn1_loc, attn2_inv, preferred_element_type=acc)
        return jnp.einsum("bhnm,bhmd->bhnd", left, attn3_v, preferred_element_type=acc)

    spec = P(None, None, "sp", None)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:
        fn = shard_map(local, check_vma=False, **kwargs)  # jax >= 0.8 API
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(local, check_rep=False, **kwargs)
    return fn(q, k, v)
