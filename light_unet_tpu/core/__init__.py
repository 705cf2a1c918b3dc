from light_unet_tpu.core.inferencer import Inferencer, extract_bboxes  # noqa: F401
from light_unet_tpu.core.trainer import Trainer, is_better_metric  # noqa: F401
