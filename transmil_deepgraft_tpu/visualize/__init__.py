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
