"""Inference engine: checkpoint load, batched sliding-window, bbox extraction.

Behavior parity with the reference Inferencer (``light_unet/core/
inferencer.py``):

* loads the best-model checkpoint and disables dropout (``:36-50``);
* per case: NIfTI load + header spacing (``:123-128``), optional body-mask
  multiply (``:136-162``), sliding-window probability map saved as
  ``{case_id}_prob.nii.gz`` with the original affine/header (``:164-165``);
* candidate extraction (``:62-111``): threshold (default 0.3) -> connected
  components filtered at ``min_volume_cc`` (0.5 cc -> voxel count via
  spacing) -> per-component voxel+mm bboxes expanded by
  ``bbox_expansion_voxels`` and clamped -> volume_cc + confidence=max prob
  -> ``{case_id}_bboxes.json``;
* per-case failures are collected, not fatal (``:148-159, 196-200``).

TPU-native: the sliding window runs as one jitted device program per volume
(patches batched, Gaussian blending on device) instead of the reference's
serial per-patch forwards.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from light_unet_tpu.config import Config
from light_unet_tpu.core.checkpoint import load_checkpoint
from light_unet_tpu.datasets.index import find_case_files, read_split_file
from light_unet_tpu.models.metrics import get_connected_components
from light_unet_tpu.models.unet3d import build_model, init_params
from light_unet_tpu.ops.components import bboxes_from_table, component_table_device
from light_unet_tpu.ops.sliding_window import SlidingWindowInferencer
from light_unet_tpu.ops.sparse_fetch import SparsePack
from light_unet_tpu.parallel.mesh import mesh_from_config
from light_unet_tpu.utils import fastio, nifti

import jax

MAX_DEVICE_COMPONENTS = 64  # device candidate-table cap; host fallback beyond

_dequant16 = jax.jit(lambda q: q.astype("float32") * (1.0 / 65535.0))


def extract_bboxes(
    prob_map: np.ndarray,
    threshold: float = 0.3,
    min_volume_cc: float = 0.5,
    spacing: Sequence[float] = (4.0, 4.0, 4.0),
    expansion_voxels: int = 3,
) -> List[Dict]:
    """Lesion-candidate bounding boxes from a probability map."""
    binary = (prob_map >= threshold).astype(np.int32)
    voxel_volume_cc = (spacing[0] * spacing[1] * spacing[2]) / 1000.0
    min_voxels = int(np.ceil(min_volume_cc / voxel_volume_cc))
    labeled, n = get_connected_components(binary, min_size=min_voxels)

    bboxes: List[Dict] = []
    for cid in range(1, n + 1):
        component = labeled == cid
        coords = np.argwhere(component)
        if len(coords) == 0:
            continue
        mins = coords.min(axis=0)
        maxs = coords.max(axis=0)
        lo = np.maximum(0, mins - expansion_voxels)
        hi = np.minimum(np.array(prob_map.shape) - 1, maxs + expansion_voxels)
        bboxes.append(
            {
                "mask_id": int(cid),
                "bbox_voxel": [int(lo[0]), int(hi[0]), int(lo[1]), int(hi[1]), int(lo[2]), int(hi[2])],
                "bbox_mm": [
                    float(lo[0] * spacing[0]),
                    float(hi[0] * spacing[0]),
                    float(lo[1] * spacing[1]),
                    float(hi[1] * spacing[1]),
                    float(lo[2] * spacing[2]),
                    float(hi[2] * spacing[2]),
                ],
                "volume_cc": float(component.sum() * voxel_volume_cc),
                "confidence": float(prob_map[component].max()),
            }
        )
    return bboxes


class Inferencer:
    """Generate probability maps + candidate bboxes for cases of a split."""

    def __init__(
        self,
        config_or_path,
        model_path,
        workdir: Optional[str] = None,
        save_prob_maps: bool = True,
    ):
        self.save_prob_maps = save_prob_maps
        if isinstance(config_or_path, Config):
            self.config = config_or_path
        elif isinstance(config_or_path, dict):
            self.config = Config.from_dict(config_or_path)
        else:
            self.config = Config.load(config_or_path)
        cfg = self.config
        self.workdir = Path(workdir) if workdir else Path(".")

        import jax.numpy as jnp

        compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.tpu.compute_dtype]
        precision = "highest" if cfg.tpu.compute_dtype == "float32" else None
        self.model = build_model(
            cfg.model, compute_dtype, inference=True, precision=precision,
            use_pallas=cfg.tpu.use_pallas,
        )
        template = init_params(self.model, jax.random.PRNGKey(0), tuple(cfg.data.patch_size))
        arrays, meta = load_checkpoint(model_path, {"params": template})
        self.params = jax.device_put(arrays["params"])
        print(f"Loaded model from {model_path}")
        print(f"Best epoch: {meta.get('best_epoch', 'N/A')}")
        if isinstance(meta.get("best_metric"), (int, float)):
            print(f"Best metric: {meta['best_metric']:.4f}")

        # multi-chip: fan the patch grid out over all local devices (no-op
        # on a single chip) — partial maps are psum-blended over ICI
        mesh = mesh_from_config(cfg.tpu)
        if cfg.tpu.fused_block and jax.default_backend() == "tpu":
            from light_unet_tpu.models.fused_forward import make_fused_apply

            apply_fn = make_fused_apply(cfg.model, compute_dtype, precision=precision)
        else:
            if cfg.tpu.fused_block:
                print(
                    "tpu.fused_block requires a TPU backend; using the lax "
                    f"forward on {jax.default_backend()}",
                    file=sys.stderr,
                )
            apply_fn = lambda p, x: self.model.apply(p, x, train=False)
        self.sw = SlidingWindowInferencer(
            apply_fn,
            patch_size=tuple(cfg.data.patch_size),
            overlap=0.5,
            use_gaussian=True,
            patch_batch=cfg.tpu.patch_batch,
            z_bucket=cfg.tpu.z_bucket,
            mesh=mesh,
            data_axis=cfg.tpu.data_axis,
            transfer_dtype=cfg.tpu.transfer_dtype,
            fetch_dtype=cfg.tpu.fetch_dtype,
            # bbox-only serving never fetches the prob map — don't let an
            # async host copy put it on the link anyway
            host_prefetch=self.save_prob_maps,
            # block-sparse fetch only pays off when the map is fetched at all
            sparse_fetch=bool(cfg.tpu.sparse_fetch) and self.save_prob_maps,
            sparse_fetch_frac=cfg.tpu.sparse_fetch_frac,
            # z-slab spatial sharding for volumes that outgrow one chip's HBM
            spatial_shard=bool(getattr(cfg.tpu, "spatial_shard", False)),
        )

        self.prob_maps_dir = Path(self._resolve(cfg.output.prob_maps_dir))
        self.bboxes_dir = Path(self._resolve(cfg.output.bboxes_dir))
        self.prob_maps_dir.mkdir(parents=True, exist_ok=True)
        self.bboxes_dir.mkdir(parents=True, exist_ok=True)

    def _resolve(self, p) -> str:
        p = Path(p)
        return str(p if p.is_absolute() else self.workdir / p)

    # ------------------------------------------------------------------
    def _load_case_inputs(self, case_id: str, data_dir: Path):
        """Host-side decode + prep of one case (native fastio decode, then
        ``SlidingWindowInferencer.prepare`` — patch grid, quantize/pad, mask
        pack); runs in a worker thread so ALL per-case host work overlaps
        device compute of the previous case."""
        image_files = find_case_files(data_dir, case_id, "image")
        if not image_files:
            print(f"Warning: No image files found for {case_id}")
            return None
        image, header = fastio.load_f32(image_files[0])
        spacing = [float(s) for s in header.get_zooms()[:3]]

        bm = self.config.data.body_mask
        body_mask = None
        if bm.apply_to_inference and bm.enabled:
            mask_path = data_dir / "body_masks" / f"{case_id}.nii.gz"
            if mask_path.exists():
                body_mask, _ = fastio.load_f32(mask_path)
                body_mask = (body_mask > 0.5).astype(np.float32)
            else:
                print(f"Warning: Body mask not found for {case_id}")
        prepared = self.sw.prepare(image, post_mask=body_mask)
        return {"prepared": prepared, "header": header, "spacing": spacing}

    def _finalize_case(self, case_id: str, inputs, dispatched, threshold: float) -> bool:
        """Extract candidate bboxes (on device: threshold -> CCL -> segment
        reductions, only a tiny component table crosses D2H) and, unless
        ``save_prob_maps=False``, fetch + save the probability map."""
        import jax.numpy as jnp

        cfg = self.config
        prob_dev, vol_shape = dispatched
        if isinstance(prob_dev, SparsePack):
            # the dense map stayed on device — candidate extraction uses it
            prob_dev = prob_dev.dense
        if prob_dev.dtype == jnp.uint16:  # quantized fetch_dtype: dequant on device
            prob_dev = _dequant16(prob_dev)
        # device candidate extraction runs on the still-resident prob map
        table, n_comp = component_table_device(
            prob_dev, jnp.float32(threshold), max_components=MAX_DEVICE_COMPONENTS
        )

        prob_map = None
        if self.save_prob_maps:
            prob_map = self.sw.fetch(dispatched)
            header = inputs["header"]
            nifti.save(
                nifti.Nifti1Image(prob_map.astype(np.float32), header.affine(), header),
                self.prob_maps_dir / f"{case_id}_prob.nii.gz",
            )

        bboxes = bboxes_from_table(
            np.asarray(table),
            int(n_comp),
            vol_shape,
            min_volume_cc=cfg.data.volume_threshold.inference_cc,
            spacing=inputs["spacing"],
            expansion_voxels=cfg.data.bbox_expansion_voxels,
            max_components=MAX_DEVICE_COMPONENTS,
        )
        if bboxes is None:  # > MAX_DEVICE_COMPONENTS candidates: host fallback
            if prob_map is None:
                prob_map = self.sw.fetch(dispatched)
            bboxes = extract_bboxes(
                prob_map,
                threshold=threshold,
                min_volume_cc=cfg.data.volume_threshold.inference_cc,
                spacing=inputs["spacing"],
                expansion_voxels=cfg.data.bbox_expansion_voxels,
            )
        bbox_json = {
            "case_id": case_id,
            "processing_path": "B",
            "orig_spacing": inputs["spacing"],
            "threshold": threshold,
            "num_candidates": len(bboxes),
            "candidates": bboxes,
        }
        with open(self.bboxes_dir / f"{case_id}_bboxes.json", "w") as f:
            json.dump(bbox_json, f, indent=2)
        return True

    def infer_case(self, case_id: str, data_dir, threshold: float = 0.3) -> bool:
        data_dir = Path(data_dir)
        try:
            inputs = self._load_case_inputs(case_id, data_dir)
            if inputs is None:
                return False
            dispatched = self.sw.dispatch(self.params, inputs["prepared"])
            return self._finalize_case(case_id, inputs, dispatched, threshold)
        except Exception as e:  # noqa: BLE001 - per-case isolation like the reference
            print(f"Error during inference execution for {case_id}: {e}")
            return False

    def infer_split(self, split_file, data_dir) -> Dict:
        """Pipelined split inference: a worker thread decodes case i+1 while
        the device computes case i and the host post-processes case i-1."""
        from light_unet_tpu.utils.tracing import maybe_profile

        with maybe_profile(self.config.tpu.profile_dir):
            return self._infer_split_impl(split_file, data_dir)

    def _infer_split_impl(self, split_file, data_dir) -> Dict:
        from concurrent.futures import ThreadPoolExecutor

        case_ids = read_split_file(split_file)
        data_dir = Path(data_dir)
        threshold = self.config.validation.default_threshold
        print(f"Performing inference on {len(case_ids)} cases...")
        t0 = time.time()
        successful, failed = 0, []

        def safe_load(cid):
            # Decode failures (corrupt file, bad header) must stay per-case:
            # an exception raised inside pool.map would abort the whole split.
            try:
                return self._load_case_inputs(cid, data_dir)
            except Exception as e:  # noqa: BLE001 - per-case isolation
                print(f"Error loading inputs for {cid}: {e}")
                return None

        def finalize(case_id, inputs, dispatched):
            nonlocal successful
            try:
                if self._finalize_case(case_id, inputs, dispatched, threshold):
                    successful += 1
            except Exception as e:  # noqa: BLE001 - per-case isolation
                print(f"Error finalizing {case_id}: {e}")
                failed.append(case_id)

        pending = None  # (case_id, inputs, dispatched)
        with ThreadPoolExecutor(max_workers=2) as pool:
            decoded = pool.map(safe_load, case_ids)
            for case_id, inputs in zip(case_ids, decoded):
                if inputs is None:
                    failed.append(case_id)
                    continue
                try:
                    dispatched = self.sw.dispatch(self.params, inputs["prepared"])
                except Exception as e:  # noqa: BLE001
                    print(f"Error during inference execution for {case_id}: {e}")
                    failed.append(case_id)
                    continue
                if pending is not None:
                    finalize(*pending)
                pending = (case_id, inputs, dispatched)
            if pending is not None:
                finalize(*pending)

        dt = time.time() - t0
        if dt > 0:
            print(
                f"\nInference complete: {successful}/{len(case_ids)} cases in {dt:.1f}s "
                f"({successful / dt:.2f} volumes/sec)"
            )
        return {"successful": successful, "failed": failed, "seconds": dt}
