"""Typed experiment configuration.

Mirrors the YAML schema defined implicitly by the reference's
``configs/unet_fl70.yaml:1-217`` (loaded by the thin, unvalidated
``light_unet/core/config.py:12-28``).  Differences, by design:

* the schema is explicit (dataclasses) and validated at load time;
* unknown keys are preserved so configs round-trip;
* we never write the resolved config back to its source file (the reference's
  ``scripts/train.py:55`` mutates the source YAML — a documented defect);
* a ``tpu`` section adds TPU-native knobs (compute dtype, patch batch,
  device-mesh axes) that have no reference counterpart.
"""

from __future__ import annotations

import copy
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml


class ConfigError(ValueError):
    """Raised when a config fails schema validation."""


# ---------------------------------------------------------------------------
# helpers


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


# ---------------------------------------------------------------------------
# schema sections (field names match the YAML keys 1:1)


@dataclass
class AugmentationConfig:
    random_flip: Dict[str, Any] = field(
        default_factory=lambda: {"enabled": True, "prob": 0.5, "axes": [0, 1, 2]}
    )
    random_rotation: Dict[str, Any] = field(
        default_factory=lambda: {
            "enabled": True,
            "prob": 0.5,
            "angle_range": [-15, 15],
            "axes": [[0, 1], [0, 2], [1, 2]],
        }
    )
    random_scale: Dict[str, Any] = field(
        default_factory=lambda: {"enabled": True, "prob": 0.3, "scale_range": [0.9, 1.1]}
    )
    random_crop: Dict[str, Any] = field(
        default_factory=lambda: {"enabled": True, "ensure_lesion_coverage": True}
    )
    intensity_shift: Dict[str, Any] = field(
        default_factory=lambda: {"enabled": True, "prob": 0.5, "shift_range": [-0.1, 0.1]}
    )
    gaussian_noise: Dict[str, Any] = field(
        default_factory=lambda: {"enabled": True, "prob": 0.3, "mean": 0.0, "sigma": 0.01}
    )


@dataclass
class BodyMaskConfig:
    enabled: bool = True
    threshold: float = 0.02
    closing_voxels: int = 5
    keep_largest_component: bool = True
    dilate_voxels: int = 3
    apply_to_training_sampling: bool = True
    apply_to_validation: bool = True
    apply_to_inference: bool = True


@dataclass
class DomainsConfig:
    fl_prefix_max: int = 122
    dlbcl_prefix_min: int = 1000
    dlbcl_prefix_max: int = 1422


@dataclass
class IntensityConfig:
    clip_percentile_low: float = 0.5
    clip_percentile_high: float = 99.5
    normalization_range: List[float] = field(default_factory=lambda: [0, 1])


@dataclass
class SpacingConfig:
    original: List[float] = field(default_factory=lambda: [4.0, 4.0, 4.0])
    target: List[float] = field(default_factory=lambda: [4.0, 4.0, 4.0])


@dataclass
class SplitRatioConfig:
    train: float = 0.7
    val: float = 0.15
    test: float = 0.15


@dataclass
class VolumeThresholdConfig:
    train_cc: float = 0.1
    inference_cc: float = 0.5


@dataclass
class DataConfig:
    dataset: str = "Follicular_Lymphoma"
    bbox_expansion_mm: float = 10.0
    bbox_expansion_voxels: int = 3
    body_mask: BodyMaskConfig = field(default_factory=BodyMaskConfig)
    domains: DomainsConfig = field(default_factory=DomainsConfig)
    image_size: List[Optional[int]] = field(default_factory=lambda: [144, 144, None])
    intensity: IntensityConfig = field(default_factory=IntensityConfig)
    patch_size: List[int] = field(default_factory=lambda: [48, 48, 48])
    spacing: SpacingConfig = field(default_factory=SpacingConfig)
    split_ratio: SplitRatioConfig = field(default_factory=SplitRatioConfig)
    total_cases: int = 123
    volume_threshold: VolumeThresholdConfig = field(default_factory=VolumeThresholdConfig)


@dataclass
class ExperimentConfig:
    name: str = "FL70_Lightweight_3DUNet"
    description: str = ""
    processing_path: str = "B"
    seed: int = 42


@dataclass
class LossConfig:
    name: str = "FocalTverskyLoss"
    alpha: float = 0.7
    beta: float = 0.3
    gamma: float = 0.75
    use_combined_loss: bool = False
    combined_loss_weights: Dict[str, float] = field(
        default_factory=lambda: {"focal_tversky": 0.8, "bce": 0.2}
    )

    def validate(self):
        if abs(self.alpha + self.beta - 1.0) > 1e-6:
            raise ConfigError(f"loss.alpha + loss.beta must equal 1.0, got {self.alpha + self.beta}")
        w = self.combined_loss_weights
        if self.use_combined_loss and abs(w["focal_tversky"] + w["bce"] - 1.0) > 1e-6:
            raise ConfigError("combined_loss_weights must sum to 1.0")
        if self.name not in ("FocalTverskyLoss", "DiceLoss"):
            raise ConfigError(f"unknown loss {self.name!r}")


@dataclass
class ModelSelectionConfig:
    primary_metric: str = "lesion_wise_recall"
    tie_breaker: str = "voxel_wise_dsc"
    tie_threshold: float = 0.01


@dataclass
class MetricsConfig:
    primary: str = "lesion_wise_recall"
    secondary: List[str] = field(
        default_factory=lambda: ["voxel_wise_dsc", "lesion_wise_precision", "fp_per_case"]
    )
    model_selection: ModelSelectionConfig = field(default_factory=ModelSelectionConfig)


@dataclass
class ModelConfig:
    name: str = "Lightweight3DUNet"
    start_channels: int = 16
    encoder_channels: List[int] = field(default_factory=lambda: [16, 32, 64, 128])
    output_channels: int = 1
    groups: int = 8
    use_depthwise_separable: bool = True
    use_grouped_conv: bool = True
    use_residual: bool = True
    use_dropout: bool = True
    dropout_p: float = 0.1
    normalization: str = "InstanceNorm3d"
    activation: str = "LeakyReLU"
    leaky_relu_slope: float = 0.01
    output_activation: str = "Sigmoid"

    def validate(self):
        if len(self.encoder_channels) != 4:
            raise ConfigError("model.encoder_channels must have 4 levels")
        if self.name != "Lightweight3DUNet":
            raise ConfigError(f"unknown model {self.name!r}")


@dataclass
class OutputConfig:
    best_model_path: str = "models/best_model.pth"
    best_model_criterion: str = "val_recall"
    checkpoint_dir: str = "models/checkpoints"
    save_checkpoints: bool = True
    save_every_n_epochs: int = 10
    keep_last_n_checkpoints: int = 5
    log_dir: str = "logs"
    tensorboard_dir: str = "logs/tensorboard"
    prob_maps_dir: str = "inference/prob_maps"
    bboxes_dir: str = "inference/bboxes"
    metrics_csv: str = "inference/metrics.csv"
    save_metadata: bool = True
    metadata_fields: List[str] = field(
        default_factory=lambda: [
            "case_id",
            "orig_spacing",
            "image_size",
            "suv_calculated",
            "clip_values",
            "normalization_range",
            "patch_size",
            "voxel_thresholds",
            "processing_timestamp",
            "processing_path",
            "seed",
        ]
    )


@dataclass
class MixedDomainsConfig:
    enabled: bool = False
    mode: str = "fl_epoch_plus_dlbcl"
    fl_ratio: float = 0.5
    dlbcl_ratio: float = 0.5
    dlbcl_steps: Optional[int] = None
    dlbcl_steps_ratio: float = 1.0

    def validate(self):
        if self.mode not in ("fl_epoch_plus_dlbcl", "probabilistic"):
            raise ConfigError(f"unknown mixed_domains.mode {self.mode!r}")


@dataclass
class SchedulerConfig:
    name: str = "CosineAnnealingLR"
    T_max: int = 200
    eta_min: float = 1.0e-06
    # ReduceLROnPlateau knobs
    mode: str = "max"
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 1.0e-06

    def validate(self):
        if self.name not in ("CosineAnnealingLR", "ReduceLROnPlateau"):
            raise ConfigError(f"unknown scheduler {self.name!r}")


@dataclass
class EarlyStoppingConfig:
    enabled: bool = True
    metric: str = "recall"
    mode: str = "max"
    patience: int = 20


@dataclass
class ClassBalancedSamplingConfig:
    enabled: bool = True
    lesion_patch_ratio: float = 0.5
    min_lesion_patches_per_batch: int = 1


@dataclass
class TrainingConfig:
    batch_size: int = 2
    epochs: int = 200
    learning_rate: float = 1.0e-4
    weight_decay: float = 1.0e-5
    optimizer: str = "AdamW"
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)
    class_balanced_sampling: ClassBalancedSamplingConfig = field(
        default_factory=ClassBalancedSamplingConfig
    )
    mixed_domains: MixedDomainsConfig = field(default_factory=MixedDomainsConfig)
    use_warmup: bool = True
    warmup_epochs: int = 5

    def validate(self):
        if self.optimizer != "AdamW":
            raise ConfigError(f"unknown optimizer {self.optimizer!r}")
        self.scheduler.validate()
        self.mixed_domains.validate()


@dataclass
class LesionMatchingConfig:
    iou_threshold: float = 0.1
    center_distance_threshold_mm: float = 10.0


@dataclass
class ValidationConfig:
    default_threshold: float = 0.3
    threshold_sensitivity_range: List[float] = field(
        default_factory=lambda: [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    )
    lesion_matching: LesionMatchingConfig = field(default_factory=LesionMatchingConfig)
    validate_every_n_epochs: int = 1


@dataclass
class TpuConfig:
    """TPU-native knobs (no reference counterpart)."""

    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype; params stay f32
    # Volume upload dtype.  "uint16" quantizes into the host-computed clip
    # range (values outside it are discarded by the clip anyway), halving H2D
    # bytes at a <=8e-6 normalized-intensity error — measured 0.585 s -> 0.357 s
    # per 24 MB volume over the tunneled link, ~10 ms of host quantize.
    # "bfloat16" also halves bytes but hits a slow ml_dtypes host-buffer
    # conversion (341 ms vs 45 ms f32) — kept for comparison only.
    transfer_dtype: str = "uint16"
    # Probability-map download dtype: "uint16" halves D2H bytes (prob in
    # [0,1] -> max dequantization error 1/(2*65535) ~ 7.6e-6, far below the
    # bf16 compute noise; measured 1.14 s -> 0.65 s per map).  Saved NIfTI
    # artifacts stay float32 either way (dequantized on host).
    fetch_dtype: str = "uint16"
    # Block-sparse D2H fetch (ops/sparse_fetch.py): a body-masked prob map is
    # exactly zero outside the dilated body (~55-70% of a whole-body volume
    # plus all bucket padding), so the device packs occupied 8^3 tiles and
    # the fetch moves count + an occupancy-bucketed tile prefix — link bytes
    # track the volume's actual body fraction.  Bit-identical reconstruction.
    # sparse_fetch_frac caps the packed HBM scratch as a fraction of the
    # grid; below 1.0 an occupancy overflow is detected exactly and falls
    # back to fetching the dense map, which never left the device.
    # Default ON: interleaved A/B on the real chip (2026-08-18,
    # scripts/bench_link_opts.py --which sparse) measured 0.343 -> 0.612
    # vol/s e2e (1.78x), bit-identical maps.
    sparse_fetch: bool = True
    sparse_fetch_frac: float = 1.0
    # Patches per sliding-window forward chunk.  192 measured 0.525 ms/patch
    # at 311 GB/s vs 96's 0.689 ms/patch at 259 GB/s (real chip, 2026-08-18
    # roofline A/B); e2e 1.07x.  Note 275-patch whole-body volumes pad
    # 2x192=384 slots vs 3x96=288, eating most of the per-patch gain — the
    # residual win is one fewer chunk dispatch.
    patch_batch: int = 192
    data_axis: str = "data"  # mesh axis for data parallelism
    mesh_shape: Optional[List[int]] = None  # default: all local devices on data axis
    # Multi-host entry (parallel/distributed.py): when true (or when
    # num_processes > 1), jax.distributed.initialize runs before first
    # device use, so jax.devices() spans every process and the mesh is
    # global.  TPU pods autodetect coordinator/count/id from the runtime —
    # "distributed: true" alone suffices there; CPU smoke clusters set all
    # three and get gloo TCP collectives wired into the client.
    distributed: bool = False
    coordinator_address: Optional[str] = None  # host:port of process 0
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # Spatially-sharded inference (ops/sliding_window.py
    # sliding_window_core_slab_sharded): the volume is split into z-slabs
    # across the mesh with ppermute halo exchange — per-device memory is
    # O(slab) instead of O(volume) and ICI moves two patch-wide halos
    # instead of full-volume psums.  For volumes that outgrow one chip's
    # HBM; the default patch-sharded fan-out is faster for whole-body PET
    # (which fits comfortably).  Falls back to patch sharding when the
    # padded z extent gives a slab smaller than one patch.
    spatial_shard: bool = False
    # treat training.batch_size as PER-DEVICE: global batch = B x n_devices,
    # so every chip carries a shard even at the reference's batch 2 (scale
    # the learning rate for the larger global batch yourself, or set
    # scale_lr_with_devices below)
    batch_per_device: bool = False
    # linear LR scaling rule for pod training: with batch_per_device on,
    # multiply training.learning_rate by the device count to keep the
    # per-example update magnitude roughly constant at the N-fold larger
    # global batch.  No effect on a single chip or with batch_per_device off.
    scale_lr_with_devices: bool = False
    prefetch_depth: int = 3  # host loader prefetch queue depth
    cache_volumes: bool = True  # keep decoded volumes in host RAM
    # Training corpus resident in HBM (datasets/device_corpus.py): volumes
    # are uploaded ONCE (uint16, like serving) and patches are gathered on
    # device from a [B,4] int32 corner array — per-step H2D drops from
    # megabytes to bytes.  Falls back to host batch streaming when the
    # corpus would exceed the budget, when the normalization range is not
    # [0,1], or when transfer_dtype is float32 (exact-f32 runs keep exact
    # f32 patches).
    device_corpus: bool = True
    device_corpus_budget_gb: float = 6.0
    # Shard the training corpus's CASE axis over the mesh instead of
    # replicating it (datasets/device_corpus.py:gather_patches_sharded):
    # per-chip HBM residency scales as ~1/D and the budget admits corpora up
    # to D x device_corpus_budget_gb.  Each step routes the corner batch to
    # owner chips inside a shard_map (masked local gathers + one integer
    # psum_scatter over ICI — each case lives on exactly one chip, so the
    # reduce is exact); batches are bit-identical to the replicated gather.
    # Default off: whole-body-at-4mm cohorts fit one chip, and the
    # replicated gather needs no per-step collective.  Turn on when the
    # corpus outgrows one chip's budget on a pod.
    shard_corpus: bool = False
    # per-epoch validation metrics computed ON DEVICE (ops/val_metrics.py):
    # probability maps never leave the chip — only per-threshold component
    # tables do.  Exact host fallback per case on component-count overflow.
    device_val_metrics: bool = True
    # Validation INPUTS resident in HBM: each case's prepared sliding-window
    # inputs (quantized+padded image, patch grid, packed body mask) are
    # cached on device after the first epoch, so later epochs skip the
    # per-case quantize + H2D upload entirely (the GT id maps already stay
    # resident via device_val_metrics).  Budget-capped: cases beyond the
    # budget keep the per-epoch prepare+upload path.
    device_val_images: bool = True
    device_val_budget_gb: float = 2.0
    # K-step chained dispatch (corpus mode): one jitted program scans K
    # gather->augment->train steps, sending K corner arrays in one H2D and
    # amortizing the per-program dispatch RTT K-fold (the limiter at small
    # batch over a remote runtime).  Per-step math and rng streams are
    # bit-identical to K single dispatches.  1 = off.
    # Default 4: interleaved A/B on the real chip (2026-08-18, --which chain)
    # measured 17.1 -> 19.2 steps/s at batch 2 (1.12x) and 17.3 -> 18.5 at
    # batch 8 (1.07x); k=8 added nothing over k=4.  Requires
    # separable_augment (validated; the map_coordinates oracle path falls
    # back to K=1 to avoid the measured gather-composition regression).
    steps_per_dispatch: int = 4
    # Separable augmentation resample (ops/augment.py): the rotate+scale
    # affine is block-diagonal, so trilinear factorizes exactly into a 1-D
    # interp matmul (MXU) + an in-plane 4-tap row-gather — replacing the 8
    # unstructured 3-D gathers of map_coordinates.  Same taps and weights;
    # measured 18-33x faster as an op and 2.65x end-to-end training
    # throughput at batch 8 on a v5e chip (docs/PERFORMANCE.md).
    separable_augment: bool = True
    # Fused Pallas InstanceNorm+LeakyReLU kernel (ops/pallas_kernels.py).
    # Off by default: measured on a v5e chip the XLA lowering wins (59 ms vs
    # 76 ms full forward on 96x48^3 bf16) because it pipelines the two HBM
    # passes better than the kernel's per-sample grid can hide its DMAs.
    use_pallas: bool = False
    # Fused residual-block Pallas kernel (ops/pallas_block.py): the whole
    # conv->IN->LeakyReLU->conv->IN->+res block runs per sample with
    # activations VMEM-resident — one HBM read of x (+1 for the residual
    # pass) and one write of out vs XLA's ~13-15 activation-sized passes.
    # Inference-only (no VJP); blocks whose layout doesn't qualify fall
    # back to the lax path per block (models/fused_forward.py).
    fused_block: bool = False
    z_bucket: int = 48  # pad volume Z to multiple (bounds recompiles)
    donate_state: bool = True
    # Persistent XLA compilation cache: compiled programs are written here
    # and reused by later processes, so a fresh run's cold-start compile
    # (~255 s for the full serving program set over the tunneled chip,
    # BENCH_r02.json) drops to near zero on the second run.  Set to "" to
    # disable.  "~" expands; applied at CLI/bench startup
    # (utils/compile_cache.py).
    compilation_cache_dir: str = "~/.cache/light_unet_tpu/xla"
    # when set, jax.profiler device traces of train/inference are written
    # here (TensorBoard-loadable); LIGHT_UNET_PROFILE env var also works
    profile_dir: Optional[str] = None


@dataclass
class Config:
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    validation: ValidationConfig = field(default_factory=ValidationConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)
    data_dir: str = "data/processed"
    splits_dir: str = "data/splits"
    # passthrough sections we keep but don't act on (parity with reference YAML)
    audit: Dict[str, Any] = field(default_factory=dict)
    target_performance: Dict[str, Any] = field(default_factory=dict)

    _extras: Dict[str, Any] = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    def validate(self) -> "Config":
        self.loss.validate()
        self.model.validate()
        self.training.validate()
        sr = self.data.split_ratio
        if abs(sr.train + sr.val + sr.test - 1.0) > 1e-6:
            raise ConfigError("data.split_ratio must sum to 1.0")
        if len(self.data.patch_size) != 3 or any(p <= 0 for p in self.data.patch_size):
            raise ConfigError("data.patch_size must be 3 positive ints")
        if not 0.0 < self.validation.default_threshold < 1.0:
            raise ConfigError("validation.default_threshold must be in (0,1)")
        if self.tpu.compute_dtype not in ("bfloat16", "float32"):
            raise ConfigError("tpu.compute_dtype must be bfloat16|float32")
        if self.tpu.transfer_dtype not in ("float32", "bfloat16", "uint16"):
            raise ConfigError("tpu.transfer_dtype must be float32|bfloat16|uint16")
        if self.tpu.fetch_dtype not in ("float32", "uint16"):
            raise ConfigError("tpu.fetch_dtype must be float32|uint16")
        if not 0.0 < self.tpu.sparse_fetch_frac <= 1.0:
            raise ConfigError("tpu.sparse_fetch_frac must be in (0,1]")
        if self.tpu.steps_per_dispatch < 1:
            raise ConfigError("tpu.steps_per_dispatch must be >= 1")
        return self

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        cfg = _from_dict(cls, d or {})
        return cfg.validate()

    def to_dict(self) -> Dict[str, Any]:
        return _to_dict(self)

    @classmethod
    def load(cls, path: Union[str, Path]) -> "Config":
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    def save(self, path: Union[str, Path]) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False, sort_keys=True)


# ---------------------------------------------------------------------------
# generic dataclass <-> dict plumbing (preserves unknown keys in _extras)


def _from_dict(cls, d: Dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in d.items():
        if key in fields:
            ftype = fields[key].type
            fcls = _resolve_dataclass(fields[key])
            if fcls is not None and isinstance(value, dict):
                kwargs[key] = _from_dict(fcls, value)
            else:
                kwargs[key] = copy.deepcopy(value)
        else:
            extras[key] = copy.deepcopy(value)
    obj = cls(**kwargs)
    if extras and hasattr(obj, "_extras"):
        obj._extras = extras
    elif extras:
        object.__setattr__(obj, "_nested_extras", extras)
    return obj


def _resolve_dataclass(f: dataclasses.Field):
    # default_factory instances tell us the nested dataclass type
    if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
        probe = f.default_factory()  # type: ignore[misc]
        if dataclasses.is_dataclass(probe):
            return type(probe)
    if dataclasses.is_dataclass(f.default):
        return type(f.default)
    return None


def _to_dict(obj) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(obj):
        if f.name == "_extras":
            continue
        value = getattr(obj, f.name)
        if dataclasses.is_dataclass(value):
            sub = _to_dict(value)
            nested = getattr(value, "_nested_extras", None)
            if nested:
                sub.update(copy.deepcopy(nested))
            out[f.name] = sub
        else:
            out[f.name] = copy.deepcopy(value)
    extras = getattr(obj, "_extras", None)
    if extras:
        out.update(copy.deepcopy(extras))
    return out


class ConfigManager:
    """Drop-in equivalent of the reference's ``ConfigManager`` facade
    (``light_unet/core/config.py:12-28``) returning a validated ``Config``."""

    @staticmethod
    def load(path: Union[str, Path]) -> Config:
        return Config.load(path)

    @staticmethod
    def save(config: Union[Config, Dict[str, Any]], path: Union[str, Path]) -> None:
        if isinstance(config, dict):
            config = Config.from_dict(config)
        config.save(path)
