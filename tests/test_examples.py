"""The examples/ scripts actually run: import each by path and drive its
main() with small arguments (conftest already forces the 8-device CPU mesh)."""

import importlib.util
import sys
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(f"examples.{name}", EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_train_eval_synthetic(tmp_path):
    out = _load("01_train_eval_synthetic").main(
        ["--model", "AttMIL", "--epochs", "2", "--n_slides", "8",
         "--bag_size", "16", "--feature_size", "16", "--log_dir", str(tmp_path)]
    )
    assert 0.0 <= out["val_auc"] <= 1.0
    assert 0.0 <= out["test_patient_auc"] <= 1.0
    assert (tmp_path / "checkpoints").exists()


def test_multichip_mesh(tmp_path):
    out = _load("02_multichip_mesh_training").main(
        ["--dp", "4", "--sp", "2", "--epochs", "1", "--log_dir", str(tmp_path)]
    )
    assert out["mesh"] == "dp=4 x sp=2"


def test_export_and_serve(tmp_path):
    out = _load("03_export_and_serve").main(
        ["--out", str(tmp_path / "m.tdx"), "--in_features", "16"]
    )
    assert len(out["probs"][0]) == 2
    assert abs(sum(out["probs"][0]) - 1.0) < 1e-4


def test_attention_heatmap(tmp_path):
    result = _load("04_attention_heatmap").main(
        ["--out_dir", str(tmp_path), "--bag_size", "36", "--feature_size", "16"]
    )
    for path in result["paths"]:
        assert Path(path).exists()


def test_tiles_to_features_to_training(tmp_path):
    out = _load("05_tiles_to_features_to_training").main(
        ["--root", str(tmp_path), "--epochs", "2"]
    )
    assert out["extracted"] == 6
    assert 0.0 <= out["test_patient_auroc"] <= 1.0
