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

# Compatibility shim mirroring the reference's legacy re-exports
# (light_unet/models/__init__.py:18-24 keeps dataset classes importable from
# the models package for pre-refactor call sites).
from light_unet_tpu.datasets import (  # noqa: F401, E402
    CaseDataset,
    MixedPatchDataset,
    PatchDataset,
    filter_cases_by_domain,
)
