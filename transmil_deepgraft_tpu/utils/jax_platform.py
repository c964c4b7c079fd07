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

Cost note: when ``JAX_PLATFORMS`` is set this imports jax at package-import
time (the config must be asserted before any backend access, and asserting it
requires jax). That is deliberate — in every environment this guard targets,
jax is imported moments later anyway; when the env var is unset the function
returns before touching jax.
"""

from __future__ import annotations

import os

# jax accepts these spellings interchangeably; backends cache under either.
_ALIASES = {"gpu": ("gpu", "cuda", "rocm"), "cuda": ("gpu", "cuda"), "rocm": ("gpu", "rocm")}


def ensure_requested_platform() -> None:
    req = (os.environ.get("JAX_PLATFORMS") or "").split(",")[0].strip().lower()
    if not req:
        return
    names = _ALIASES.get(req, (req,))
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        return
    try:
        from jax._src import xla_bridge as xb

        if not xb._backends:
            return  # nothing initialized yet; the config update is enough
        # Backends already initialized and the cached DEFAULT is not the
        # requested platform (eager plugin registration can initialize several
        # at once, so key membership alone is not evidence the request won):
        # drop the cache so selection re-runs under the env var. Checked via
        # the cache internals, NOT jax.default_backend(), which would itself
        # trigger initialization of the unwanted backend.
        default = getattr(xb, "_default_backend", None)
        current = getattr(default, "platform", None)
        if (current is not None and current not in names) or (
            current is None and not any(n in xb._backends for n in names)
        ):
            xb._clear_backends()
    except Exception:
        pass
