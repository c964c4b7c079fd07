"""TransMIL torch-checkpoint conversion: synthetic state dict -> flax apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import TransMIL
from transmil_deepgraft_tpu.utils.torch_weights import convert_transmil_state_dict


def _fake_torch_transmil_sd(rng, in_features=2048, dim=512, n_classes=2):
    """State dict with the reference TransMIL's exact key/shape layout."""
    torch = pytest.importorskip("torch")

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "_fc1.0.weight": t(1024, 2048), "_fc1.0.bias": t(1024),
        "_fc1.2.weight": t(1024), "_fc1.2.bias": t(1024),
        "_fc1.3.weight": t(512, 1024), "_fc1.3.bias": t(512),
        "cls_token": t(1, 1, dim),
        "norm.weight": t(dim), "norm.bias": t(dim),
        "_fc.weight": t(n_classes, dim), "_fc.bias": t(n_classes),
    }
    for layer in ("layer1", "layer2"):
        sd[f"{layer}.norm.weight"] = t(dim)
        sd[f"{layer}.norm.bias"] = t(dim)
        sd[f"{layer}.attn.to_qkv.weight"] = t(3 * dim, dim)
        sd[f"{layer}.attn.to_out.0.weight"] = t(dim, dim)
        sd[f"{layer}.attn.to_out.0.bias"] = t(dim)
        sd[f"{layer}.attn.res_conv.weight"] = t(8, 1, 33, 1)
    for name, k in (("proj", 7), ("proj1", 5), ("proj2", 3)):
        sd[f"pos_layer.{name}.weight"] = t(dim, 1, k, k)
        sd[f"pos_layer.{name}.bias"] = t(dim)
    return sd


def test_convert_transmil_and_apply(rng):
    sd = _fake_torch_transmil_sd(rng)
    variables = convert_transmil_state_dict(sd, in_features=2048)

    model = TransMIL(n_classes=2, in_features=2048)
    x = jnp.asarray(rng.standard_normal((1, 100, 2048)).astype(np.float32))
    # param tree structure must match the model's init exactly
    init = model.init({"params": jax.random.key(0)}, x)["params"]
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables["params"])
    assert init_shapes == conv_shapes, (init_shapes, conv_shapes)

    logits = model.apply(variables, x)
    assert logits.shape == (1, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_transmil_known_value(rng):
    """The fc1 path is deterministic math: check Linear conversion numerically."""
    sd = _fake_torch_transmil_sd(rng)
    variables = convert_transmil_state_dict(sd, in_features=2048)
    w = np.asarray(variables["params"]["fc1_0"]["kernel"])
    torch_w = sd["_fc1.0.weight"].numpy()
    np.testing.assert_array_equal(w, torch_w.T)
    rc = np.asarray(variables["params"]["layer1"]["attn"]["res_conv"])
    assert rc.shape == (33, 8)
