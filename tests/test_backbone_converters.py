"""Pretrained-backbone weight converters, golden-tested against live torch:

- EfficientNet-B0 (torchvision layout) standard + NVIDIA 'widese' SE widths
  (the reference loads ``nvidia_efficientnet_widese_b0``,
  model_interface.py:260-267)
- DINO ViT (timm naming; ``MyBackbone/backbone_factory.py:13-22``)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.torch_ref.backbones_torch import DinoViT, EfficientNetB0  # noqa: E402
from transmil_deepgraft_tpu.models.efficientnet import EfficientNet  # noqa: E402
from transmil_deepgraft_tpu.models.vit import VisionTransformer  # noqa: E402
from transmil_deepgraft_tpu.utils.torch_weights import (  # noqa: E402
    convert_efficientnet_state_dict,
    convert_vit_state_dict,
)


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)


@pytest.mark.parametrize("widese", [False, True])
def test_efficientnet_converter(widese, rng):
    torch.manual_seed(5)
    tmodel = EfficientNetB0(widese=widese).eval()
    _randomize_bn(tmodel)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()

    variables = convert_efficientnet_state_dict(tmodel.state_dict())
    model = EfficientNet(widese=widese)
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=0)

    # converted tree structure must match the model's own init
    init = jax.tree.map(
        lambda a: a.shape,
        model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))["params"],
    )
    conv = jax.tree.map(lambda a: np.asarray(a).shape, variables["params"])
    assert init == conv


def test_vit_converter(rng):
    torch.manual_seed(6)
    tmodel = DinoViT(img_size=32, patch=8, dim=64, depth=2, heads=2).eval()
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()

    variables = convert_vit_state_dict(tmodel.state_dict())
    model = VisionTransformer(patch_size=8, dim=64, depth=2, heads=2, img_size=32)
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=0)
