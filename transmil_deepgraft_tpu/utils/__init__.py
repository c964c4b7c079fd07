from transmil_deepgraft_tpu.utils.config import (  # noqa: F401
    Config,
    read_yaml,
    LABEL_MAP,
    COLOR_MAP,
    derive_task_from_config_path,
    in_features_for_extractor,
)
