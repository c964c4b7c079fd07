"""Sequence-parallel Nystrom attention must match the single-device op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.ops.nystrom import nystrom_attention
from transmil_deepgraft_tpu.parallel.mesh import make_mesh
from transmil_deepgraft_tpu.parallel.sp_nystrom import sp_nystrom_attention


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_sp_matches_single_device(rng, sp):
    b, h, n, d, m = 1, 2, 512, 32, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)) for _ in range(3))
    mesh = make_mesh(jax.devices()[:sp], dp=1, sp=sp)
    # mesh axes are (dp, sp); sp_nystrom shards over 'sp'
    got = sp_nystrom_attention(q, k, v, mesh, num_landmarks=m)
    want = nystrom_attention(q, k, v, num_landmarks=m).out
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sp_rejects_bad_landmark_split(rng):
    mesh = make_mesh(jax.devices()[:4], dp=1, sp=4)
    q = jnp.zeros((1, 1, 64, 8))
    with pytest.raises(ValueError):
        sp_nystrom_attention(q, q, q, mesh, num_landmarks=2)  # 2 % 4 != 0
