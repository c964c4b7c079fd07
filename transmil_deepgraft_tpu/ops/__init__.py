from transmil_deepgraft_tpu.ops.pinv import newton_schulz_pinv  # noqa: F401
from transmil_deepgraft_tpu.ops.nystrom import (  # noqa: F401
    nystrom_attention,
    nystrom_attention_dense_reference,
    pad_to_landmark_multiple,
)
from transmil_deepgraft_tpu.ops.ppeg import ppeg_conv  # noqa: F401
from transmil_deepgraft_tpu.ops.pooling import (  # noqa: F401
    gated_attention_pool,
    topk_minmax_scores,
)
from transmil_deepgraft_tpu.ops.padding import (  # noqa: F401
    square_pad_length,
    duplicate_pad_square,
    bucket_for_length,
)
