"""Backbone tests: shapes, weight conversion parity vs torch, fused image-MIL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.backbones import ImageMILModel, SimpleCNN, create_backbone
from transmil_deepgraft_tpu.models.resnet import resnet18, resnet50, resnet50_baseline
from transmil_deepgraft_tpu.models.attmil import AttMIL
from transmil_deepgraft_tpu.utils.torch_weights import convert_resnet_state_dict

IMG = 64  # small spatial size for CPU test speed (ResNet is fully convolutional)


def test_resnet50_feature_shape():
    model = resnet50()
    x = jnp.zeros((2, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)


def test_resnet50_baseline_1024():
    model = resnet50_baseline()
    x = jnp.zeros((2, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x)
    assert model.apply(variables, x).shape == (2, 1024)


def test_resnet18_shape():
    model = resnet18()
    x = jnp.zeros((1, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x)
    assert model.apply(variables, x).shape == (1, 512)


def test_resnet18_matches_torch():
    """Golden parity: random torch resnet18 vs converted flax weights."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)

    # minimal torch resnet18 (conv-bn blocks) via torch.nn only
    import torch.nn as tnn

    class TorchBasic(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class TorchR18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            cin = 64
            for i, w in enumerate(widths):
                blocks = []
                for b in range(2):
                    stride = 2 if (b == 0 and i > 0) else 1
                    blocks.append(TorchBasic(cin, w, stride))
                    cin = w
                setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return x.mean(dim=(2, 3))

    tmodel = TorchR18().eval()
    # randomize running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    sd = tmodel.state_dict()
    # rename down.* -> downsample.* to match torchvision naming
    sd = { (k.replace(".down.", ".downsample.") if ".down." in k else k): v for k, v in sd.items() }
    variables = convert_resnet_state_dict(sd)

    x = np.random.default_rng(0).standard_normal((2, IMG, IMG, 3), dtype=np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = resnet18()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_image_mil_end_to_end():
    backbone = SimpleCNN(out_features=64)
    head = AttMIL(n_classes=2, in_features=64, out_features=32, attn_dim=16)
    model = ImageMILModel(backbone=backbone, head=head, n_chunks=4)
    x = jnp.zeros((1, 8, 224, 224, 3))
    variables = model.init({"params": jax.random.key(0)}, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 2)


def test_backbone_factory():
    for name, dim in (("retccl", 2048), ("resnet50", 1024), ("simple", 1024)):
        mdl, d = create_backbone(name)
        assert d == dim and mdl is not None
    mdl, d = create_backbone("features")
    assert mdl is None and d == 0
    with pytest.raises(KeyError):
        create_backbone("nope")


def test_vit_forward():
    from transmil_deepgraft_tpu.models.vit import vit_tiny

    model = vit_tiny(depth=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (1, 192)
