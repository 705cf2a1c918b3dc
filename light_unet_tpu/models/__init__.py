from light_unet_tpu.models.unet3d import (  # noqa: F401
    Lightweight3DUNet,
    build_model,
    count_parameters,
    init_params,
)
from light_unet_tpu.models.losses import (  # noqa: F401
    combined_loss,
    dice_loss,
    focal_tversky_loss,
    get_loss_function,
)
from light_unet_tpu.models.metrics import (  # noqa: F401
    calculate_dsc,
    calculate_lesion_metrics,
    calculate_metrics,
    get_connected_components,
    match_components,
)
