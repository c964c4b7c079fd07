"""Make the ``JAX_PLATFORMS`` environment variable authoritative.

Upstream jax selects its backend from ``JAX_PLATFORMS``, but site plugins that
pre-register a PJRT backend at interpreter startup (a ``sitecustomize`` calling
the plugin's ``register()``) can monkeypatch backend selection so the env var is
silently ignored — ``JAX_PLATFORMS=cpu python train.py`` then initializes (and,
with an unreachable accelerator, hangs on) the plugin backend the moment
``jax.devices()`` is first touched.

``ensure_requested_platform()`` restores the documented env-var semantics: it
re-asserts the requested platform through ``jax.config`` *before* the first
backend access, and if some other backend was already initialized it clears the
backend cache so the next access comes up on the requested platform. No-op when
``JAX_PLATFORMS`` is unset or already in effect. Called once at package import.
"""

from __future__ import annotations

import os


def ensure_requested_platform() -> None:
    req = (os.environ.get("JAX_PLATFORMS") or "").split(",")[0].strip().lower()
    if not req:
        return
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        return
    try:
        from jax._src import xla_bridge as xb

        # Backends already initialized on a different platform (the plugin's
        # eager registration won the race): drop them so selection re-runs
        # under the env var. Checked against the cache keys, NOT
        # jax.default_backend(), which would itself trigger initialization.
        if xb._backends and req not in xb._backends:
            xb._clear_backends()
    except Exception:
        pass
