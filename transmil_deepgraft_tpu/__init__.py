"""TPU-native framework for weakly-supervised whole-slide-image classification via MIL.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch/Lightning
reference ``Ycblue/TransMIL-DeepGraft`` (kidney-transplant-biopsy DeepGraft tasks and
Camelyon16): frozen-backbone patch embedding streamed on-device into bag-level MIL
heads (TransMIL/AttMIL/DTFD/CLAM/Chowder/TransformerMIL/...), slide->patient metric
aggregation, k-fold cross validation, checkpointing, and attention heatmaps.

Everything stochastic takes explicit PRNG keys; all bag shapes are static (bucketed
padding) so every hot path compiles once per bucket and runs on the MXU.
"""

__version__ = "0.3.0"

from transmil_deepgraft_tpu.utils.jax_platform import ensure_requested_platform

ensure_requested_platform()  # JAX_PLATFORMS wins over eager site-plugin backends
del ensure_requested_platform

from transmil_deepgraft_tpu.utils.config import Config, read_yaml  # noqa: F401
