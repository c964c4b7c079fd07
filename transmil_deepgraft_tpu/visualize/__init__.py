from transmil_deepgraft_tpu.visualize.heatmap import (  # noqa: F401
    attention_tile_scores,
    gradcam_tile_scores,
    assemble_heatmap,
    deep_feature_factorization,
    export_topk_tiles,
    roi_mask,
    save_heatmap_jpeg,
    Visualizer,
)
from transmil_deepgraft_tpu.visualize.cam import (  # noqa: F401
    CAM_METHODS,
    compute_cam,
    normalize_cam,
    score_cam,
    show_cam_on_image,
)
from transmil_deepgraft_tpu.visualize.gradcam import (  # noqa: F401
    assemble_pixel_heatmap,
    classic_tile_gradcam,
    pixel_gradcam_image_mil,
)
