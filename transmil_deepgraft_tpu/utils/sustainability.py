"""Sustainability / energy telemetry.

Equivalent of the reference's ImpactTracker + codecarbon subsystem
(``code/sustainability_{train,test}.py``, ``.codecarbon.config``): since TPU
chips expose no userland power counters here, energy is accounted as
step-time x chip-TDP (SURVEY.md section 5 recommendation), with kgCO2 derived
from a configurable grid intensity. ``EnergyTracker`` wraps any loop;
``benchmark_models`` reproduces the reference's synthetic-bag model sweep
(``sustainability_test.py:180-245``) writing per-model power CSVs.
"""

from __future__ import annotations

import csv
import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# v5e chip TDP is not published; a conservative per-chip envelope.
DEFAULT_CHIP_WATTS = 200.0
DEFAULT_KGCO2_PER_KWH = 0.4  # world-average-ish grid intensity

# Regional grid carbon intensities, gCO2eq/kWh (approximate 2022-2023 annual
# figures, Ember/IEA yearbook order of magnitude; override per deployment).
# The reference derives the same per-region comparison from a private
# ``carbon-intensity-electricity.csv`` (``code/mortality_cost.ipynb`` cells
# 2-3, ``map_co2.ipynb``, ``co2_plot.py:37-43``); this table replaces that
# data dependency so the analysis runs out of the box.
REGION_GCO2_PER_KWH: dict[str, float] = {
    "World": 436.0,
    "Poland": 633.0,
    "India": 713.0,
    "China": 582.0,
    "Australia": 549.0,
    "Japan": 462.0,
    "United States": 367.0,
    "Germany": 385.0,
    "Italy": 331.0,
    "Netherlands": 268.0,
    "United Kingdom": 238.0,
    "Spain": 174.0,
    "Austria": 158.0,
    "Belgium": 139.0,
    "Canada": 126.0,
    "France": 56.0,
    "Sweden": 41.0,
    "Norway": 30.0,
}

# Mortality cost of carbon (Bressler, Nature Communications 12, 4467 (2021)):
# projected 2020-2100 excess deaths per tonne of CO2 emitted — the constant
# behind the reference's ``mortality_cost.ipynb`` analysis.
MORTALITY_DEATHS_PER_TCO2 = 2.26e-4


@dataclass
class EnergyReport:
    seconds: float
    kwh: float
    kg_co2: float
    steps: int = 0

    def as_dict(self) -> dict:
        return vars(self)


@dataclass
class EnergyTracker:
    chip_watts: float = DEFAULT_CHIP_WATTS
    kgco2_per_kwh: float = DEFAULT_KGCO2_PER_KWH
    n_chips: int = 1
    _t0: float = field(default=0.0, init=False)
    _elapsed: float = field(default=0.0, init=False)
    steps: int = field(default=0, init=False)

    def __enter__(self) -> "EnergyTracker":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self._elapsed += time.perf_counter() - self._t0

    def step(self, n: int = 1) -> None:
        self.steps += n

    def report(self) -> EnergyReport:
        kwh = self._elapsed * self.chip_watts * self.n_chips / 3.6e6
        return EnergyReport(
            seconds=self._elapsed,
            kwh=kwh,
            kg_co2=kwh * self.kgco2_per_kwh,
            steps=self.steps,
        )


def regional_impact(kwh: float, regions: dict[str, float] | None = None) -> list[dict]:
    """Per-region CO2 and mortality cost of ``kwh`` of compute (the
    reference's ``mortality_cost.ipynb`` / ``map_co2.ipynb`` analysis as a
    library call): one row per region, sorted cleanest-first."""
    regions = REGION_GCO2_PER_KWH if regions is None else regions
    if not regions:
        raise ValueError("empty region table")
    rows = []
    for region, gco2 in sorted(regions.items(), key=lambda kv: kv[1]):
        kg = kwh * gco2 / 1000.0
        rows.append(
            {
                "region": region,
                "gco2_per_kwh": gco2,
                "kg_co2": kg,
                "deaths": kg / 1000.0 * MORTALITY_DEATHS_PER_TCO2,
            }
        )
    return rows


def write_regional_impact(kwh: float, out_path: str | Path,
                          regions: dict[str, float] | None = None,
                          rows: list[dict] | None = None) -> Path:
    """``regional_impact`` to CSV (+ ``.json`` sidecar with the input kwh).
    Pass precomputed ``rows`` to keep CSV and plot from ever diverging."""
    rows = regional_impact(kwh, regions) if rows is None else rows
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    out_path.with_suffix(".json").write_text(json.dumps({"kwh": kwh, "rows": rows}, indent=2))
    return out_path


def plot_regional_impact(rows: list[dict], out_path: str | Path) -> Path:
    """Bar chart of per-region kgCO2 (the map_co2 comparison, sans geodata)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    names = [r["region"] for r in rows]
    ax.bar(range(len(rows)), [r["kg_co2"] for r in rows], color="#4c72b0")
    ax.set_xticks(range(len(rows)))
    ax.set_xticklabels(names, rotation=60, ha="right", fontsize=8)
    ax.set_ylabel("kg CO2eq")
    ax.set_title("Same compute, by grid region")
    out_path = Path(out_path)
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)
    return out_path


def benchmark_models(
    out_dir: str | Path,
    model_names: tuple[str, ...] = ("TransMIL", "AttMIL", "TransformerMIL", "CLAM_SB"),
    bag_sizes: tuple[int, ...] = (600, 800, 1000),
    in_features: int = 2048,
    n_classes: int = 2,
    reps: int = 10,
    mode: str = "inference",
    chip_watts: float = DEFAULT_CHIP_WATTS,
) -> Path:
    """Per-model inference/training energy sweep over synthetic bags; writes
    ``{out_dir}/sustainability_{mode}.csv`` (the reference's kWh CSVs)."""
    import jax
    import jax.numpy as jnp
    import optax

    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.train.losses import cross_entropy

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    for name in model_names:
        for bag in bag_sizes:
            model = create_model(name, n_classes=n_classes, in_features=in_features)
            x = jnp.asarray(rng.standard_normal((1, bag, in_features), dtype=np.float32))
            variables = model.init(
                {"params": jax.random.key(0), "shuffle": jax.random.key(1)}, x
            )
            if mode == "inference":
                fn = jax.jit(lambda v, x: model.apply(v, x))
                np.asarray(jax.tree.leaves(fn(variables, x))[0])  # compile
                with EnergyTracker(chip_watts=chip_watts) as tracker:
                    for _ in range(reps):
                        out = fn(variables, x)
                        tracker.step()
                    jax.block_until_ready(out)
            else:
                tx = optax.adam(1e-4)
                params = variables["params"]
                opt_state = tx.init(params)
                labels = jax.nn.one_hot(jnp.zeros(1, jnp.int32), n_classes)

                @jax.jit
                def step(p, s, x):
                    def loss(p):
                        logits = model.apply({"params": p}, x)
                        if isinstance(logits, tuple):
                            logits = logits[1]
                        return cross_entropy(logits, labels)

                    g = jax.grad(loss)(p)
                    u, s = tx.update(g, s, p)
                    return optax.apply_updates(p, u), s

                params, opt_state = step(params, opt_state, x)  # compile
                with EnergyTracker(chip_watts=chip_watts) as tracker:
                    for _ in range(reps):
                        params, opt_state = step(params, opt_state, x)
                        tracker.step()
                    jax.block_until_ready(params)
            rep = tracker.report()
            rows.append(
                {
                    "model": name,
                    "bag_size": bag,
                    "mode": mode,
                    "reps": reps,
                    "seconds": round(rep.seconds, 4),
                    "kwh": rep.kwh,
                    "kg_co2": rep.kg_co2,
                }
            )

    path = out_dir / f"sustainability_{mode}.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    (out_dir / f"sustainability_{mode}.json").write_text(json.dumps(rows, indent=2))
    return path


def plot_sweep(csv_path: str | Path, out_path: str | Path | None = None) -> Path:
    """Energy-sweep bar chart (the reference's co2_plot.py): kWh per model/bag."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    csv_path = Path(csv_path)
    df = pd.read_csv(csv_path)
    pivot = df.pivot_table(index="model", columns="bag_size", values="kwh")
    fig, ax = plt.subplots(figsize=(6, 4))
    pivot.plot.bar(ax=ax)
    ax.set_ylabel("kWh per run")
    ax.set_title(f"Energy sweep ({df['mode'].iloc[0]}, {int(df['reps'].iloc[0])} reps)")
    out_path = Path(out_path) if out_path else csv_path.with_suffix(".png")
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)
    return out_path
