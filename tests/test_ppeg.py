"""PPEG: folded single-conv must equal the literal identity + 7/5/3 conv sum."""

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.models.layers import PPEG
from transmil_deepgraft_tpu.ops.ppeg import depthwise_conv2d


def test_ppeg_fold_matches_three_convs(rng):
    dim, h, w = 32, 6, 6
    model = PPEG(dim=dim)
    x = jnp.asarray(rng.standard_normal((1, 1 + h * w, dim)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, h, w)
    # randomize params (init biases are zero; give them values)
    p = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32) * 0.1), variables["params"]
    )
    out = model.apply({"params": p}, x, h, w)

    # literal reference computation
    grid = np.asarray(x[:, 1:]).reshape(1, h, w, dim)
    want = grid.copy()
    for name, ks in (("proj", 7), ("proj1", 5), ("proj2", 3)):
        y = np.asarray(depthwise_conv2d(jnp.asarray(grid), jnp.asarray(p[name])))
        want = want + y + np.asarray(p[f"{name}_bias"])
    np.testing.assert_allclose(np.asarray(out[:, 1:]).reshape(1, h, w, dim), want, rtol=1e-4, atol=1e-4)
    # cls token passes through untouched
    np.testing.assert_array_equal(np.asarray(out[:, :1]), np.asarray(x[:, :1]))
