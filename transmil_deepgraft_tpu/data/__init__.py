from transmil_deepgraft_tpu.data.synthetic import SyntheticBagDataset  # noqa: F401
from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset  # noqa: F401
from transmil_deepgraft_tpu.data.sampler import ImbalancedSampler  # noqa: F401
from transmil_deepgraft_tpu.data.datamodule import MILDataModule, Batch  # noqa: F401
