"""Build-or-locate helper for the in-package C++ shared libraries.

The sources ship inside the wheel (``transmil_deepgraft_tpu/native/``) and are
compiled on first use so the binary always matches the host toolchain/microarch
(committing prebuilt ``.so``s would SIGILL across microarchs — ADVICE round 2).
Site-packages is frequently root-owned or a read-only container layer, so when
the package directory is not writable the build lands in a per-user cache dir
(``$XDG_CACHE_HOME`` or ``~/.cache``) keyed by a content hash of the sources —
a system install stays usable by unprivileged users, and upgrading the package
(new source hash) transparently triggers a rebuild.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"


def _cache_root() -> Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return Path(base) / "transmil_deepgraft_tpu"


def _source_hash(sources: list[Path]) -> str:
    h = hashlib.sha256()
    for src in sources:
        h.update(src.name.encode())
        h.update(src.read_bytes())
    return h.hexdigest()[:16]


def ensure_native_lib(name: str, source_names: list[str]) -> Path:
    """Return the path to ``lib<name>.so``, building it if missing or stale.

    Tries the package ``native/`` directory first (dev checkouts, user
    installs); if that directory is not writable the build happens in the
    user cache dir instead. Raises ``subprocess.CalledProcessError`` with the
    compiler output attached if the build itself fails.
    """
    target = f"lib{name}.so"
    sources = [NATIVE_DIR / s for s in source_names]
    src_mtime = max(s.stat().st_mtime for s in sources)

    in_pkg = NATIVE_DIR / target
    if in_pkg.exists() and in_pkg.stat().st_mtime >= src_mtime:
        return in_pkg
    if os.access(NATIVE_DIR, os.W_OK):
        subprocess.run(
            ["make", "-C", str(NATIVE_DIR), target], check=True, capture_output=True
        )
        return in_pkg

    # read-only install: build under the user cache, keyed by source content
    build_dir = _cache_root() / f"native-{_source_hash(sources)}"
    cached = build_dir / target
    if cached.exists():
        return cached
    build_dir.mkdir(parents=True, exist_ok=True)
    for f in (*sources, NATIVE_DIR / "Makefile"):
        shutil.copy2(f, build_dir / f.name)
    subprocess.run(
        ["make", "-C", str(build_dir), target], check=True, capture_output=True
    )
    return cached
