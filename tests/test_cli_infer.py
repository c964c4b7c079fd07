"""Production inference CLI (cli/infer.py): tiles -> predictions + top-k CSVs."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from PIL import Image

from transmil_deepgraft_tpu.models import TransMIL
from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet


def test_infer_cli_end_to_end(tmp_path, rng):
    root = tmp_path / "BLOCKS"
    for slide in ("slideA", "slideB"):
        d = root / slide
        d.mkdir(parents=True)
        for t in range(4):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"tile_({t}-1).jpg")

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bb_vars = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    )
    (tmp_path / "backbone.msgpack").write_bytes(serialization.msgpack_serialize(bb_vars))

    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = jax.device_get(head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048))))
    (tmp_path / "head.msgpack").write_bytes(serialization.msgpack_serialize(hv))

    from transmil_deepgraft_tpu.cli.infer import main

    results = main([
        "--tiles_root", str(root),
        "--backbone_ckpt", str(tmp_path / "backbone.msgpack"),
        "--head_ckpt", str(tmp_path / "head.msgpack"),
        "--quantize", "int8",
        "--out_features", "32",
        "--chunk", "4",
        "--tile_size", "64",
        "--topk", "3",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert len(results) == 2
    preds = json.loads((tmp_path / "out" / "predictions.json").read_text())
    assert {r["slide"] for r in preds} == {"slideA", "slideB"}
    for r in preds:
        assert abs(sum(r["probs"]) - 1.0) < 1e-4
        csv_text = (tmp_path / "out" / f"{r['slide']}_topk_tiles.csv").read_text()
        assert csv_text.startswith("tile,x,y,attention")
        assert len(csv_text.strip().splitlines()) == 4  # header + top-3


def test_infer_cli_pth_head_checkpoint(tmp_path, rng):
    """The advertised torch .pth head path (Lightning 'model.'-prefixed state
    dict) must load without double-wrapping the converted params
    (round-2 advisor finding: cli/infer._load_variables)."""
    import pytest

    torch = pytest.importorskip("torch")
    from tests.test_transmil_converter import _fake_torch_transmil_sd

    root = tmp_path / "BLOCKS"
    d = root / "slideA"
    d.mkdir(parents=True)
    for t in range(4):
        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tile_({t}-1).jpg")

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bb_vars = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    )
    (tmp_path / "backbone.msgpack").write_bytes(serialization.msgpack_serialize(bb_vars))

    sd = {f"model.{k}": v for k, v in _fake_torch_transmil_sd(rng).items()}
    torch.save(sd, tmp_path / "head.pth")

    from transmil_deepgraft_tpu.cli.infer import main

    results = main([
        "--tiles_root", str(root),
        "--backbone_ckpt", str(tmp_path / "backbone.msgpack"),
        "--head_ckpt", str(tmp_path / "head.pth"),
        "--quantize", "bf16",
        "--chunk", "4",
        "--tile_size", "64",
        "--topk", "2",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert len(results) == 1
    assert abs(sum(results[0]["probs"]) - 1.0) < 1e-3
