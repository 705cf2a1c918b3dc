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
