from light_unet_tpu.datasets.case_dataset import CaseDataset, CaseSample  # noqa: F401
from light_unet_tpu.datasets.index import (  # noqa: F401
    build_case_index,
    filter_cases_by_domain,
    find_case_files,
    read_split_file,
)
from light_unet_tpu.datasets.loader import PrefetchLoader, get_data_loader  # noqa: F401
from light_unet_tpu.datasets.patch_sampler import MixedPatchSampler, PatchSampler  # noqa: F401
from light_unet_tpu.datasets.volume_cache import VolumeCache  # noqa: F401

# Reference-compatible class names (the reference calls its samplers
# "datasets": light_unet/datasets/__init__.py:5-20).  A user porting from
# the reference finds the familiar names; the TPU-native names stay primary.
PatchDataset = PatchSampler
MixedPatchDataset = MixedPatchSampler
