"""MONAI MIL head family: all five mil_modes + torch parity via torch's OWN
nn.TransformerEncoder (strongest possible semantics check for the att_trans
and att_trans_pyramid encoders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models.monai_mil import MonaiMIL

N, D = 12, 2048
PYR_DIMS = (256, 512, 1024, 2048)


def _pyramid(rng, b=1, n=N):
    return tuple(
        jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32)) for d in PYR_DIMS
    )


@pytest.mark.parametrize("mode", ["mean", "max", "att", "att_trans", "att_trans_pyramid"])
def test_all_modes_forward(mode, rng):
    model = MonaiMIL(n_classes=3, in_features=D, mil_mode=mode, trans_blocks=1)
    x = jnp.asarray(rng.standard_normal((1, N, D)).astype(np.float32))
    kwargs = {"pyramid": _pyramid(rng)} if mode == "att_trans_pyramid" else {}
    variables = model.init({"params": jax.random.key(0)}, x, **kwargs)
    logits = model.apply(variables, x, **kwargs)
    assert logits.shape == (1, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_image_pipeline_pyramid(rng):
    """Raw tiles -> ResNet50 pyramid features (the hooks equivalent) ->
    att_trans_pyramid head, one jitted graph (ref MonaiMILModel.forward)."""
    import jax

    from transmil_deepgraft_tpu.models.backbones import ImageMILModel
    from transmil_deepgraft_tpu.models.resnet import retccl_resnet50

    model = ImageMILModel(
        backbone=retccl_resnet50(),
        head=MonaiMIL(n_classes=2, in_features=2048, mil_mode="att_trans_pyramid", trans_blocks=1),
        n_chunks=2,
        pyramid=True,
    )
    x = jnp.asarray(rng.standard_normal((1, 4, 64, 64, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 2)
    assert np.isfinite(np.asarray(logits)).all()


def _torch_head(mode, n_classes=2, trans_blocks=2):
    """The reference MONAI head (MonaiMILModel.py:117-155) built from torch's
    own TransformerEncoder modules, with the reference's exact key layout."""
    import torch
    import torch.nn as nn

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            nfc = D
            if mode == "att_trans":
                layer = nn.TransformerEncoderLayer(d_model=nfc, nhead=8, dropout=0.0)
                self.transformer = nn.TransformerEncoder(layer, num_layers=trans_blocks)
            elif mode == "att_trans_pyramid":
                def enc(d):
                    return nn.TransformerEncoder(
                        nn.TransformerEncoderLayer(d_model=d, nhead=8, dropout=0.0),
                        num_layers=trans_blocks,
                    )
                self.transformer = nn.ModuleList([
                    enc(256),
                    nn.Sequential(nn.Linear(768, 256), enc(256)),
                    nn.Sequential(nn.Linear(1280, 256), enc(256)),
                    enc(2304),
                ])
                nfc = nfc + 256
            self.attention = nn.Sequential(nn.Linear(nfc, 2048), nn.Tanh(), nn.Linear(2048, 1))
            self.myfc = nn.Linear(nfc, n_classes)

        def forward(self, x, pyramid=None):
            if mode == "att_trans":
                x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
            elif mode == "att_trans_pyramid":
                l1, l2, l3, l4 = (p.permute(1, 0, 2) for p in pyramid)
                x = self.transformer[0](l1)
                x = self.transformer[1](torch.cat((x, l2), dim=2))
                x = self.transformer[2](torch.cat((x, l3), dim=2))
                x = self.transformer[3](torch.cat((x, l4), dim=2))
                x = x.permute(1, 0, 2)
            a = torch.softmax(self.attention(x), dim=1)
            return self.myfc(torch.sum(x * a, dim=1))

    return Head().eval()


@pytest.mark.parametrize("mode", ["att", "att_trans", "att_trans_pyramid"])
def test_torch_parity(mode, rng):
    torch = pytest.importorskip("torch")
    from transmil_deepgraft_tpu.utils.torch_weights import convert_monai_mil_state_dict

    torch.manual_seed(3)
    head = _torch_head(mode)
    x = rng.standard_normal((1, N, D)).astype(np.float32)
    pyr = [rng.standard_normal((1, N, d)).astype(np.float32) for d in PYR_DIMS]

    with torch.no_grad():
        if mode == "att_trans_pyramid":
            expected = head(
                torch.from_numpy(x), [torch.from_numpy(p) for p in pyr]
            ).numpy()
        else:
            expected = head(torch.from_numpy(x)).numpy()

    variables = convert_monai_mil_state_dict(head.state_dict(), mil_mode=mode)
    model = MonaiMIL(n_classes=2, in_features=D, mil_mode=mode, trans_blocks=2)
    kwargs = (
        {"pyramid": tuple(jnp.asarray(p) for p in pyr)}
        if mode == "att_trans_pyramid" else {}
    )
    got = np.asarray(model.apply(variables, jnp.asarray(x), **kwargs))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=0)
