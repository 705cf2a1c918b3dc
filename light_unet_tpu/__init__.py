"""light_unet_tpu — TPU-native 3D U-Net lesion-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
Light-3D-Unet-Front pipeline (PET-only FL lesion-candidate detection):
split -> preprocess -> train -> inference -> evaluate, with a 217K-parameter
3D U-Net, Focal Tversky training, sliding-window inference, and lesion-wise
evaluation — designed for TPU (device meshes, jit, fused kernels) rather
than translated from the reference's single-GPU torch code.
"""

__version__ = "0.1.0"

from light_unet_tpu.config import Config, ConfigManager  # noqa: F401
