"""Fused per-volume device programs.

Under the remote-execution TPU runtime every dispatched program costs a
~30 ms host<->device round trip and every 28 MB volume transfer ~120 ms, so
chaining separate normalize / morphology / CCL / sliding-window programs
wastes most of a volume's wall clock on traffic (measured: 8.1 s/volume
unfused vs ~0.4 s of actual device compute).  These entry points fuse each
pipeline stage into ONE XLA program with one H2D and the minimal D2H:

* ``normalize_and_body_mask`` — the preprocess stage's device work
  (clip+rescale, threshold, closing, largest component, dilation);
* ``preprocess_and_infer`` — the benchmark/serving path: raw volume in,
  body-masked probability map out, nothing else ever leaves the device.

Numerics are identical to the unfused ops (same traceable cores).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_unet_tpu.ops.body_mask import body_mask_core
from light_unet_tpu.ops.gaussian import gaussian_importance_map
from light_unet_tpu.ops.intensity import (
    clip_normalize_device,
    compute_clip_values,
    pad_volume,
)
from light_unet_tpu.ops.sliding_window import (
    _valid_mask,
    bucketed_shape,
    choose_chunks,
    compute_positions,
    sliding_window_core,
)
from light_unet_tpu.ops.sparse_fetch import (
    SparsePack,
    block_cap,
    fetch_maybe_sparse,
    pack_blocks,
)


@partial(
    jax.jit,
    static_argnames=(
        "range_min", "range_max", "threshold", "closing_voxels", "keep_largest", "dilate_voxels",
    ),
)
def _normalize_and_body_mask_jit(
    volume, true_dims, lo, hi, *,
    range_min: float, range_max: float,
    threshold: float, closing_voxels: int, keep_largest: bool, dilate_voxels: int,
):
    valid = _valid_mask(volume.shape, true_dims)
    normalized = clip_normalize_device(volume, valid, lo, hi, range_min=range_min, range_max=range_max)
    mask, counts = body_mask_core(normalized, valid, threshold, closing_voxels, keep_largest, dilate_voxels)
    return normalized, mask, counts


def normalize_and_body_mask(
    image: np.ndarray,
    intensity_cfg,
    body_mask_cfg,
    z_bucket: int = 1,
) -> Tuple[np.ndarray, np.ndarray, dict, dict]:
    """One device program for the whole preprocess stage of one volume.

    Returns (normalized, body_mask(bool), intensity_metadata, mask_metadata)
    with the same metadata schemas as the standalone ops."""
    image = np.asarray(image, dtype=np.float32)
    lo, hi = compute_clip_values(
        image, intensity_cfg.clip_percentile_low, intensity_cfg.clip_percentile_high
    )
    padded = pad_volume(image, z_bucket)
    rng_min, rng_max = intensity_cfg.normalization_range

    normalized, mask, counts = _normalize_and_body_mask_jit(
        jnp.asarray(padded), jnp.asarray(np.array(image.shape, np.int32)),
        jnp.float32(lo), jnp.float32(hi),
        range_min=float(rng_min), range_max=float(rng_max),
        threshold=float(body_mask_cfg.threshold),
        closing_voxels=int(body_mask_cfg.closing_voxels),
        keep_largest=bool(body_mask_cfg.keep_largest_component),
        dilate_voxels=int(body_mask_cfg.dilate_voxels),
    )
    sl = tuple(slice(0, s) for s in image.shape)
    normalized_np = np.asarray(normalized)[sl]
    mask_np = np.asarray(mask)[sl] > 0.5
    counts = np.asarray(counts)

    coords = np.argwhere(mask_np)
    bbox_min = coords.min(axis=0).tolist() if len(coords) else [0, 0, 0]
    bbox_max = coords.max(axis=0).tolist() if len(coords) else list(mask_np.shape)
    intensity_meta = {
        "clip_values": {
            "min": lo, "max": hi,
            "low_percentile": intensity_cfg.clip_percentile_low,
            "high_percentile": intensity_cfg.clip_percentile_high,
        },
        "normalization_range": list(intensity_cfg.normalization_range),
    }
    mask_meta = {
        "threshold": float(body_mask_cfg.threshold),
        "closing_voxels": int(body_mask_cfg.closing_voxels),
        "keep_largest_component": bool(body_mask_cfg.keep_largest_component),
        "dilate_voxels": int(body_mask_cfg.dilate_voxels),
        "voxel_counts": {
            "initial": int(counts[0]),
            "after_closing": int(counts[1]),
            "after_largest_component": int(counts[2]),
            "final": int(counts[3]),
        },
        "bbox": {"min": bbox_min, "max": bbox_max},
    }
    return normalized_np, mask_np, intensity_meta, mask_meta


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "patch_size", "chunk", "tail_chunk",
        "range_min", "range_max", "threshold", "closing_voxels", "keep_largest",
        "dilate_voxels", "apply_mask", "dequant", "quantize_out",
        "sparse_cap", "sparse_block",
    ),
)
def _preprocess_and_infer_jit(
    params, volume, true_dims, lo, hi, positions, pmask, imp_map, *,
    apply_fn: Callable, patch_size: Tuple[int, int, int], chunk: int,
    tail_chunk: int = 0,
    range_min: float, range_max: float,
    threshold: float, closing_voxels: int, keep_largest: bool, dilate_voxels: int,
    apply_mask: bool, dequant: bool = False, quantize_out: bool = False,
    sparse_cap: int = 0, sparse_block: int = 8,
):
    if dequant:
        # uint16 upload: values were quantized on host into [lo, hi] (the
        # clip range — everything outside it is discarded by the clip anyway)
        volume = volume.astype(jnp.float32) * ((hi - lo) / 65535.0) + lo
    else:
        volume = volume.astype(jnp.float32)
    valid = _valid_mask(volume.shape, true_dims)
    normalized = clip_normalize_device(volume, valid, lo, hi, range_min=range_min, range_max=range_max)
    prob = sliding_window_core(
        params, normalized, positions, pmask, imp_map, apply_fn, patch_size, chunk,
        tail_chunk=tail_chunk,
    )
    if apply_mask:
        body, _ = body_mask_core(normalized, valid, threshold, closing_voxels, keep_largest, dilate_voxels)
        prob = prob * body
    if quantize_out:
        # prob in [0,1] -> uint16 halves the D2H bytes; dequantization error
        # <= 1/(2*65535), far below bf16 compute noise
        out = jnp.round(jnp.clip(prob, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    else:
        out = prob.astype(jnp.float32)
    if sparse_cap > 0:
        return out, *pack_blocks(out, sparse_block, sparse_cap)
    return out


class FusedVolumePipeline:
    """Raw volume -> body-masked probability map, one XLA program per volume.

    Supports async dispatch so host NIfTI decode of case i+1 overlaps device
    compute of case i."""

    def __init__(
        self, apply_fn, config, patch_batch: int = 96, transfer_dtype=None,
        fetch_dtype=None, host_prefetch: bool = True,
    ):
        self.host_prefetch = bool(host_prefetch)
        self.apply_fn = apply_fn
        self.cfg = config
        self.patch_size = tuple(config.data.patch_size)
        self.patch_batch = patch_batch
        self.z_bucket = config.tpu.z_bucket
        self.imp_map = jnp.asarray(gaussian_importance_map(self.patch_size))
        # Upload dtype trade-offs (measured on the tunneled runtime):
        #   float32  — baseline, fast host-buffer path;
        #   uint16   — halves the bytes by quantizing into the host-computed
        #              clip range [lo, hi] (values outside it are discarded by
        #              the clip anyway; max error (hi-lo)/65535/2);
        #   bfloat16 — halves the bytes but ml_dtypes host buffers take a slow
        #              conversion path (341 ms vs 45 ms f32) — kept only for
        #              comparison.
        name = str(transfer_dtype or getattr(config.tpu, "transfer_dtype", "float32"))
        self.transfer_dtype = {"bfloat16": jnp.bfloat16, "uint16": jnp.uint16}.get(
            name, jnp.float32
        )
        fname = str(fetch_dtype or getattr(config.tpu, "fetch_dtype", "float32"))
        self.quantize_out = fname == "uint16"
        # block-sparse D2H: only occupied 8^3 tiles of the (body-masked,
        # mostly-zero) probability map ride the link (ops/sparse_fetch.py);
        # bit-identical, exact overflow -> dense fallback
        self.sparse_fetch = bool(getattr(config.tpu, "sparse_fetch", False))
        self.sparse_frac = float(getattr(config.tpu, "sparse_fetch_frac", 1.0))
        self.sparse_block = 8

    def prepare(self, image: np.ndarray) -> tuple:
        """Host-side prep of one volume: percentiles, quantize/pad, patch
        grid.  ~0.25 s of pure host work — run it on the IO worker thread
        (alongside the NIfTI decode) so it overlaps device compute of the
        previous case instead of serializing on the dispatch thread."""
        cfg = self.cfg
        image = np.asarray(image, dtype=np.float32)
        lo, hi = compute_clip_values(
            image, cfg.data.intensity.clip_percentile_low, cfg.data.intensity.clip_percentile_high
        )
        shape = image.shape
        pshape = bucketed_shape(shape, self.patch_size, self.z_bucket)
        if self.transfer_dtype == jnp.bfloat16:
            import ml_dtypes  # ships with jax

            host_dtype = ml_dtypes.bfloat16
        elif self.transfer_dtype == jnp.uint16:
            host_dtype = np.uint16
        else:
            host_dtype = np.float32
        padded = None
        if self.transfer_dtype == jnp.uint16:
            # native single pass (clip+scale+round+cast+pad, GIL released,
            # bit-identical — utils/fastio.py:quantize_pad); numpy chain as
            # fallback
            from light_unet_tpu.utils import fastio as _fastio

            padded = _fastio.quantize_pad(image, pshape, lo, hi)
        if padded is None:
            padded = np.zeros(pshape, host_dtype)
            if self.transfer_dtype == jnp.uint16:
                scale = np.float32(65535.0 / (hi - lo)) if hi > lo else np.float32(0.0)
                tmp = np.clip(image, lo, hi)
                tmp -= np.float32(lo)
                tmp *= scale
                tmp += np.float32(0.5)  # round-to-nearest under the truncating cast
                padded[tuple(slice(0, s) for s in shape)] = tmp
            else:
                padded[tuple(slice(0, s) for s in shape)] = image

        positions = compute_positions(shape, self.patch_size, 0.5)
        n = len(positions)
        chunk, tail, n_pad = choose_chunks(n, self.patch_batch)
        posp = np.zeros((n_pad, 3), np.int32)
        posp[:n] = positions
        pmask = np.zeros((n_pad,), np.float32)
        pmask[:n] = 1.0
        # start the H2D uploads HERE, on the worker thread — they then overlap
        # the D2H fetch of the previous case (opposite link directions)
        return (
            jnp.asarray(padded), shape, lo, hi,
            jnp.asarray(posp), jnp.asarray(pmask), (chunk, tail),
        )

    def dispatch(self, params, image_or_prepared):
        cfg = self.cfg
        prep = (
            image_or_prepared
            if isinstance(image_or_prepared, tuple)
            else self.prepare(image_or_prepared)
        )
        padded, shape, lo, hi, posp, pmask, chunks = prep
        chunk, tail_chunk = chunks

        rng = cfg.data.intensity.normalization_range
        bm = cfg.data.body_mask
        cap = (
            block_cap(padded.shape, self.sparse_block, self.sparse_frac)
            if self.sparse_fetch
            else 0
        )
        out = _preprocess_and_infer_jit(
            params, jnp.asarray(padded), jnp.asarray(np.array(shape, np.int32)),
            jnp.float32(lo), jnp.float32(hi), jnp.asarray(posp), jnp.asarray(pmask),
            self.imp_map,
            apply_fn=self.apply_fn, patch_size=self.patch_size, chunk=chunk,
            tail_chunk=tail_chunk,
            range_min=float(rng[0]), range_max=float(rng[1]),
            threshold=float(bm.threshold), closing_voxels=int(bm.closing_voxels),
            keep_largest=bool(bm.keep_largest_component), dilate_voxels=int(bm.dilate_voxels),
            apply_mask=bool(bm.enabled and bm.apply_to_inference),
            dequant=self.transfer_dtype == jnp.uint16,
            quantize_out=self.quantize_out,
            sparse_cap=cap, sparse_block=self.sparse_block,
        )
        if cap:
            out = SparsePack(*out, cap=cap, block=self.sparse_block)
        # start the D2H copy as soon as the program finishes, WITHOUT blocking
        # — fetch() then finds the host buffer (mostly) ready, and the device
        # can run the next case's program while this result streams back
        if self.host_prefetch:
            # sparse mode: only count rides the link at dispatch time — the
            # tile payload is device-sliced to the occupancy bucket at fetch
            # time, so prefetching the full [cap, block^3] arrays would put
            # exactly the bytes sparse fetch avoids back on the link
            arrays = out.link_arrays() if cap else (out,)
            for a in arrays:
                try:
                    a.copy_to_host_async()
                except Exception:  # noqa: BLE001 - optional runtime capability
                    pass
        return out, shape

    @staticmethod
    def fetch(dispatched) -> np.ndarray:
        out, shape = dispatched
        host = fetch_maybe_sparse(out)[: shape[0], : shape[1], : shape[2]]
        if host.dtype == np.uint16:  # quantized D2H -> dequantize on host
            host = host.astype(np.float32)
            host *= np.float32(1.0 / 65535.0)
        return host

    def __call__(self, params, image: np.ndarray) -> np.ndarray:
        return self.fetch(self.dispatch(params, image))
