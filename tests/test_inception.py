"""InceptionV3 (classic zoo): forward shapes + torch parity on a real block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.inception import InceptionA, InceptionV3


def test_full_forward_shapes(rng):
    model = InceptionV3(num_classes=0)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x)
    feats = model.apply(variables, x)
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()

    clf = InceptionV3(num_classes=5)
    variables = clf.init({"params": jax.random.key(0)}, x)
    assert clf.apply(variables, x).shape == (1, 5)


def test_classic_registry_has_inception():
    from transmil_deepgraft_tpu.models.backbones import BACKBONE_DIMS, create_backbone

    assert BACKBONE_DIMS["inception"] == 2048
    backbone, dim = create_backbone("inception")
    assert dim == 2048


def test_inception_a_torch_parity(rng):
    """One full InceptionA block (all four branches incl. the
    count-include-pad avg pool) vs a torch implementation with torchvision's
    state-dict layout, through the converter."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from transmil_deepgraft_tpu.utils.torch_weights import convert_inception_state_dict

    class TBasic(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class TInceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = TBasic(cin, 64, kernel_size=1)
            self.branch5x5_1 = TBasic(cin, 48, kernel_size=1)
            self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
            self.branch_pool = TBasic(cin, pool_features, kernel_size=1)

        def forward(self, x):
            import torch.nn.functional as F

            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)),
            ], dim=1)

    torch.manual_seed(0)
    tblock = TInceptionA(192, 32).eval()
    # randomize running stats so BN folding is actually exercised
    for m in tblock.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)

    x = rng.standard_normal((2, 192, 17, 17)).astype(np.float32)
    with torch.no_grad():
        expected = tblock(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    sd = {f"Mixed_5b.{k}": v for k, v in tblock.state_dict().items()}
    variables = convert_inception_state_dict(sd)
    block = InceptionA(32)
    got = np.asarray(
        block.apply(
            {
                "params": variables["params"]["Mixed_5b"],
                "batch_stats": variables["batch_stats"]["Mixed_5b"],
            },
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=0)
