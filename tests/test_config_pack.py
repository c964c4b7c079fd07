"""Config pack: every ported reference YAML parses and drives the framework.

All 72 DeepGraft + 1 Camelyon configs (ported by ``tools/gen_config_pack.py``)
go through ``read_yaml`` + ``finalize_config`` (task-from-filename,
in_features-from-extractor, log-path derivation). One config per feature-bag
model additionally runs a synthetic-data fast_dev_run through the full CLI
``build`` + fit + test path.
"""

from pathlib import Path

import pytest

from transmil_deepgraft_tpu.models import MODEL_REGISTRY
from transmil_deepgraft_tpu.utils.config import finalize_config, read_yaml

CONFIG_DIR = Path(__file__).parent.parent / "transmil_deepgraft_tpu" / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.glob("DeepGraft/*.yaml")) + sorted(
    CONFIG_DIR.glob("Camelyon/*.yaml")
)
CLASSIC = {"inception", "resnet18", "vit", "efficientnet"}
SPATIAL = {"CTMIL", "resnet50"}


def test_pack_is_complete():
    assert len(list(CONFIG_DIR.glob("DeepGraft/*.yaml"))) == 72
    assert len(list(CONFIG_DIR.glob("Camelyon/*.yaml"))) >= 1


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_parses_and_finalizes(path):
    cfg = read_yaml(path)
    cfg = finalize_config(cfg, config_path=str(path), stage="train")
    name = str(cfg.Model.name)
    assert name in MODEL_REGISTRY or name in CLASSIC or name in SPATIAL, name
    assert cfg.Model.n_classes >= 2
    # reference-faithful task derivation (train.py:384-386) yields '' for
    # filenames without a <Model>_<backbone>_<task> suffix (e.g. TransMIL.yaml)
    parts = path.stem.split("_")
    if len(parts) > 2:
        assert cfg.task == "_".join(parts[2:]).split("-")[0]
    assert str(cfg.Optimizer.opt)
    assert str(cfg.Loss.base_loss) == "CrossEntropyLoss"


def _one_per_model():
    seen = {}
    for path in ALL_CONFIGS:
        cfg = read_yaml(path)
        name = str(cfg.Model.name)
        if name in MODEL_REGISTRY and name not in SPATIAL and name not in seen:
            seen[name] = path
    return sorted(seen.items())


@pytest.mark.parametrize("name,path", _one_per_model(), ids=lambda x: str(x))
def test_fast_dev_run_per_model(name, path, tmp_path):
    """Synthetic-data fast_dev_run through the CLI build for every feature-bag
    head that appears in the pack."""
    from transmil_deepgraft_tpu.cli.train import build

    cfg = read_yaml(path)
    cfg = finalize_config(cfg, config_path=str(path), stage="train", fast_dev_run=True)
    in_features = int(cfg.Model.in_features or 64)
    feat = min(in_features, 64)
    cfg.Model.in_features = feat
    cfg.Model.out_features = 32
    cfg.Data.data_dir = None
    cfg.Data.cross_val = False
    cfg.Data.synthetic = {
        "n_train": 8, "n_val": 4, "n_test": 4,
        "bag_size": 130 if name in ("DTFD", "DTFDMIL") else 48,
        "feature_size": feat, "signal": 2.0,
    }
    cfg.Data.bag_size = 130 if name in ("DTFD", "DTFDMIL") else 48
    cfg.Data.train_dataloader.batch_size = min(
        int(cfg.Data.train_dataloader.batch_size or 1), 2
    )
    cfg.Model.backbone = "features"
    cfg.Data.variant = "features"
    trainer = build(cfg, log_dir=str(tmp_path))
    trainer.cfg.fast_dev_run = True
    trainer.fit()
    summary = trainer.test()
    assert "test_auc" in summary


def test_model_extras_forwarded_from_yaml(tmp_path):
    """Optional Model-section knobs reach the model constructor when the head
    declares them (and are ignored otherwise): cli.train._model_extras."""
    from transmil_deepgraft_tpu.cli.train import _model_extras, build

    cfg = read_yaml(ALL_CONFIGS[0])
    cfg.Model.name = "TransMIL"
    cfg.Model.use_pallas = True
    cfg.Model.fused_inference = False
    cfg.Model.num_landmarks = 16  # TransMIL does NOT declare this -> dropped
    assert _model_extras(cfg, "TransMIL") == {
        "use_pallas": True, "fused_inference": False,
    }
    assert _model_extras(cfg, "RoFormerMIL") == {"num_landmarks": 16}
    assert _model_extras(cfg, "not_a_model") == {}

    cfg = finalize_config(cfg, config_path=str(ALL_CONFIGS[0]), stage="train",
                          fast_dev_run=True)
    cfg.Model.n_classes = 2
    cfg.Model.in_features = 64
    cfg.Model.out_features = 32
    cfg.Model.backbone = "features"
    cfg.Data.data_dir = None
    cfg.Data.cross_val = False
    cfg.Data.variant = "features"
    cfg.Data.synthetic = {"n_train": 4, "n_val": 2, "n_test": 2,
                          "bag_size": 32, "feature_size": 64}
    trainer = build(cfg, log_dir=str(tmp_path))
    assert trainer.model.use_pallas is True
    assert trainer.model.fused_inference is False
