"""Pixel-level GradCAM through the backbone + test-stage top-k tile export."""

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.models import TransMIL
from transmil_deepgraft_tpu.models.resnet import resnet18
from transmil_deepgraft_tpu.visualize.gradcam import (
    assemble_pixel_heatmap,
    classic_tile_gradcam,
    pixel_gradcam_image_mil,
)


def test_pixel_gradcam_through_fused_model(rng):
    """CAM of the bag logit w.r.t. the backbone's last conv map (the
    reference's GradCAM(Sequential(retccl, transmil)) target
    model[0].layer4[-1], visualize_mil.py:225-234)."""
    backbone = resnet18()
    head = TransMIL(n_classes=2, in_features=512, out_features=32)

    tiles = jnp.asarray(rng.standard_normal((6, 64, 64, 3)).astype(np.float32))
    bvars = backbone.init({"params": jax.random.key(0)}, tiles)
    feats = backbone.apply(bvars, tiles)
    hvars = head.init({"params": jax.random.key(1)}, feats[None])

    cams = pixel_gradcam_image_mil(
        backbone, head, bvars, tiles, target_class=1, head_variables=hvars
    )
    assert cams.shape == (6, 2, 2)  # 64/32 downsampling through resnet18
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    assert cams.std() > 0  # gradients actually flowed through the head


def test_classic_tile_gradcam(rng):
    backbone = resnet18()
    tiles = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    variables = backbone.init({"params": jax.random.key(0)}, tiles)

    w = np.asarray(rng.standard_normal((512, 3)), np.float32)

    cams = classic_tile_gradcam(
        backbone, variables, tiles, target_class=2,
        classifier_apply=lambda pooled: pooled @ w,
    )
    assert cams.shape == (4, 2, 2)
    assert cams.max() <= 1.0 + 1e-6


def test_assemble_pixel_heatmap(rng):
    cams = rng.random((3, 7, 7)).astype(np.float32)
    coords = np.array([[0, 0], [1, 0], [0, 1]])
    out = assemble_pixel_heatmap(cams, coords, tile_size=224, downscale=16)
    assert out.shape == (28, 28)  # 2x2 grid of 14px tiles
    # the (1,1) grid slot has no tile -> zeros
    assert out[14:, 14:].max() == 0.0
    assert out[:14, :14].max() > 0.0


def test_image_visualizer_end_to_end(tmp_path, rng):
    """Raw tiles -> chunked embed -> attention heatmap + pixel GradCAM JPEGs
    (the visualize_feature/visualize_classic family, functionally)."""
    from transmil_deepgraft_tpu.visualize.heatmap import ImageVisualizer

    backbone = resnet18()
    head = TransMIL(n_classes=2, in_features=512, out_features=32)
    tiles = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    coords = np.array([[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]])
    bvars = backbone.init({"params": jax.random.key(0)}, jnp.asarray(tiles))
    feats = backbone.apply(bvars, jnp.asarray(tiles))
    hvars = head.init({"params": jax.random.key(1)}, feats[None])

    viz = ImageVisualizer(
        backbone, head, bvars, hvars, out_dir=tmp_path, chunk=4, tile_size=64
    )
    result = viz.run_slide(tiles, coords, "slideX")
    assert result["logits"].shape == (1, 2)
    assert result["pixel_cams"].shape == (6, 2, 2)
    assert (tmp_path / "slideX_mil_attn.jpg").exists()
    assert (tmp_path / "slideX_pixel_gradcam.jpg").exists()
    assert (tmp_path / "slideX_topk_tiles.csv").exists()


def test_trainer_test_stage_exports_topk_tiles(tmp_path):
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=48, batch_size=2,
        synthetic={"n_train": 6, "n_val": 4, "n_test": 4, "bag_size": 48,
                   "feature_size": 32, "signal": 2.0},
        seed=0,
    )
    model = TransMIL(n_classes=2, in_features=32, out_features=32)
    trainer = Trainer(
        model, create_optimizer(opt="adam", lr=1e-3), dm,
        n_classes=2, loss_fn=create_loss(),
        config=TrainerConfig(epochs=1, patience=5, log_dir=str(tmp_path), task="norm_rest"),
    )
    trainer.fit()
    trainer.test()
    csvs = list((tmp_path / "topk_tiles").glob("*_topk_tiles.csv"))
    assert csvs, "test stage should export per-slide top-k attention tiles"
