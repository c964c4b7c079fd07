"""Test configuration: force an 8-virtual-device CPU platform.

This environment ships a sitecustomize (via PYTHONPATH) that registers and
eagerly initializes the axon TPU PJRT backend in *every* python process, before
conftest runs - so JAX_PLATFORMS=cpu alone is too late. We clear jax's backend
cache and re-initialize on CPU with 8 virtual devices: the TPU answer to
"multi-node testing without a cluster" (SURVEY.md section 4) - all
sharding/collective tests run against a CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu":  # sitecustomize already initialized axon
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: repeat suite runs skip XLA:CPU compilation
from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/tdt_jax_cache_cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
