from light_unet_tpu.ops.augment import make_augment_fn  # noqa: F401
from light_unet_tpu.ops.body_mask import generate_body_mask  # noqa: F401
from light_unet_tpu.ops.ccl import keep_largest_component, label_components  # noqa: F401
from light_unet_tpu.ops.gaussian import gaussian_importance_map  # noqa: F401
from light_unet_tpu.ops.intensity import clip_and_normalize  # noqa: F401
from light_unet_tpu.ops.morphology import binary_closing, binary_dilation, binary_erosion  # noqa: F401
from light_unet_tpu.ops.sliding_window import (  # noqa: F401
    SlidingWindowInferencer,
    compute_positions,
    sliding_window_inference_3d,
)
