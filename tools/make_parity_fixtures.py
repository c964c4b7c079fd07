"""Generate frozen parity fixtures: torch reference logits + converted params.

For every config in ``tests.torch_ref.builders.CONFIGS`` this builds the torch
reference model (seeded), runs an eval-mode forward, converts the state dict
with ``utils/torch_weights``, and writes everything into
``tests/fixtures/parity_<name>.npz``:

  bag                      the input bag
  out:<key>                every torch output (logits, attn_row, ...)
  param:<path/to/leaf>     every converted flax param leaf

``tests/test_parity_torch.py`` replays the flax side against these fixtures on
every run, with or without torch installed. Regenerate with:

  python tools/make_parity_fixtures.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.torch_ref import builders  # noqa: E402


def flatten_params(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_params(v, path))
        else:
            flat[path] = np.asarray(v)
    return flat


def main() -> None:
    out_dir = REPO / "tests" / "fixtures"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in builders.CONFIGS:
        bag = builders.make_bag(name)
        model = builders.build_torch(name)
        outs = builders.torch_forward(name, model, bag)
        variables = builders.convert(name, model.state_dict())

        payload = {"bag": bag}
        for k, v in outs.items():
            payload[f"out:{k}"] = np.asarray(v)
        for k, v in flatten_params(variables["params"]).items():
            payload[f"param:{k}"] = v
        for k, v in flatten_params(variables.get("batch_stats", {})).items():
            payload[f"stat:{k}"] = v

        path = out_dir / f"parity_{name}.npz"
        np.savez_compressed(path, **payload)
        print(f"{path.name}: logits={outs['logits'].ravel()[:4]}")


if __name__ == "__main__":
    main()
