"""Repo self-audit: one command to verify the user-facing surface is intact.

Checks (fast, CPU-only): every CLI parses ``--help``; the whole config pack
parses+finalizes; every public converter imports; the native libraries build;
the driver entry points import; the model registry constructs every head.

  python tools/release_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

FAILS: list[str] = []


def check(name: str, fn) -> None:
    try:
        fn()
        print(f"ok   {name}")
    except Exception as e:  # noqa: BLE001
        FAILS.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}")


def clis() -> None:
    for mod in ("train", "visualize", "extract_features", "sustainability",
                "infer", "export_metrics", "export_model", "serve"):
        r = subprocess.run(
            [sys.executable, "-m", f"transmil_deepgraft_tpu.cli.{mod}", "--help"],
            capture_output=True, cwd=REPO, env={**os.environ, "PYTHONPATH": str(REPO)},
        )
        if r.returncode != 0:
            raise RuntimeError(f"cli.{mod} --help: {r.stderr.decode()[-200:]}")


def config_pack() -> None:
    from transmil_deepgraft_tpu.utils.config import finalize_config, read_yaml

    paths = sorted((REPO / "transmil_deepgraft_tpu" / "configs").rglob("*.yaml"))
    assert len(paths) >= 75, f"only {len(paths)} configs found"
    for p in paths:
        finalize_config(read_yaml(p), config_path=p, stage="train")


def converters() -> None:
    from transmil_deepgraft_tpu.utils import torch_weights as tw

    for fn in ("convert_resnet_state_dict", "convert_transmil_state_dict",
               "convert_attmil_state_dict", "convert_clam_state_dict",
               "convert_dtfd_state_dict", "convert_chowder_state_dict",
               "convert_transformer_mil_state_dict", "convert_efficientnet_state_dict",
               "convert_vit_state_dict", "convert_inception_state_dict",
               "convert_monai_mil_state_dict"):
        assert callable(getattr(tw, fn)), fn


def native_libs() -> None:
    r = subprocess.run(["make", "-C", str(REPO / "transmil_deepgraft_tpu" / "native")], capture_output=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr.decode()[-200:])
    assert (REPO / "transmil_deepgraft_tpu" / "native" / "libbagstore.so").exists()
    assert (REPO / "transmil_deepgraft_tpu" / "native" / "libtileloader.so").exists()


def model_registry() -> None:
    from transmil_deepgraft_tpu.models import MODEL_REGISTRY, create_model

    for name in MODEL_REGISTRY:
        create_model(name, n_classes=2, in_features=64, out_features=64)


def driver_entry() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge", REPO / "__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert callable(m.entry) and callable(m.dryrun_multichip)
    assert (REPO / "bench.py").exists()


def wheel_contents() -> None:
    """Build the wheel and verify the data the runtime needs ships in it:
    the config pack, the native C++ sources + Makefile, no .so binaries, and
    console scripts pointing at the exit-0 _entry shims."""
    import tempfile
    import zipfile

    with tempfile.TemporaryDirectory() as td:
        r = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", str(REPO), "--no-deps",
             "--no-build-isolation", "-w", td],
            capture_output=True, cwd=td,
        )
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode()[-300:])
        (whl,) = Path(td).glob("*.whl")
        names = zipfile.ZipFile(whl).namelist()
        assert sum(n.endswith(".yaml") for n in names) >= 75, "config pack missing"
        for f in ("native/bagstore.cpp", "native/tileloader.cpp", "native/Makefile"):
            assert f"transmil_deepgraft_tpu/{f}" in names, f
        assert not any(n.endswith(".so") for n in names), "prebuilt .so leaked"
        entry_txt = next(n for n in names if n.endswith("entry_points.txt"))
        txt = zipfile.ZipFile(whl).read(entry_txt).decode()
        assert "cli._entry" in txt and ":main" not in txt, "scripts must use _entry shims"


def coverage_citations() -> None:
    import coverage_check

    assert coverage_check.main() == 0, "COVERAGE.md cites missing paths"


def doc_sync() -> None:
    """README's test count must match pytest collection (the hand-counted
    number went stale two rounds running — VERDICT r4 item 8), and the
    BENCHMARKS headline row must quote the latest driver-captured BENCH_r*."""
    import json
    import re

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    assert m, f"could not count tests:\n{out.stdout[-800:]}"
    collected = int(m.group(1))
    readme = (REPO / "README.md").read_text()
    claim = re.search(r"(\d+)-test suite", readme)
    assert claim, "README no longer states the test count"
    assert int(claim.group(1)) == collected, (
        f"README claims a {claim.group(1)}-test suite; pytest collects "
        f"{collected} — regenerate the README number"
    )

    benches = sorted(REPO.glob("BENCH_r*.json"))
    if benches:
        latest = benches[-1]
        # driver format: {"n", "cmd", "rc", "tail"} with bench.py's JSON line
        # embedded in tail; fall back to a bare bench.py line
        doc = json.loads(latest.read_text())
        if "tail" in doc:
            line = next(
                ln for ln in reversed(doc["tail"].splitlines())
                if ln.startswith("{") and "metric" in ln
            )
            row = json.loads(line)
        else:
            row = doc
        val = f"{row['value']}"
        bm = (REPO / "BENCHMARKS.md").read_text()
        assert re.search(rf"r\d+[^|\n]*{re.escape(val)}", bm), (
            f"BENCHMARKS.md headline section does not quote {latest.name}'s "
            f"median ({val}) — sync the per-round captures line"
        )


def main() -> int:
    check("CLI --help surface", clis)
    check("config pack parses", config_pack)
    check("converters present", converters)
    check("native libraries build", native_libs)
    check("model registry constructs", model_registry)
    check("driver entry points", driver_entry)
    check("wheel ships configs+native", wheel_contents)
    check("COVERAGE.md citations exist", coverage_citations)
    check("docs in sync (test count, bench capture)", doc_sync)
    if FAILS:
        print(f"\n{len(FAILS)} check(s) failed: {FAILS}")
        return 1
    print("\nall release checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
