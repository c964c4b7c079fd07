from transmil_deepgraft_tpu.train.losses import create_loss  # noqa: F401
from transmil_deepgraft_tpu.train.optimizers import create_optimizer  # noqa: F401
