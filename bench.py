#!/usr/bin/env python
"""Benchmark: end-to-end volumes/sec (NIfTI decode + preprocess + sliding-window
inference) on reference-scale whole-body PET volumes (144x144x~272 @ 4mm).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "volumes/sec", "vs_baseline": N}

``vs_baseline`` compares against the reference pipeline's execution model —
a serial per-patch torch forward on the host CPU (the reference is
single-CUDA-or-CPU; no GPU exists in this environment, and the reference's
own repo publishes no numbers — BASELINE.md).  The baseline is measured live
on a sample of patches and extrapolated to the full patch grid.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

VOLUME_SHAPE = (144, 144, 272)
N_VOLUMES = 6
PATCH = (48, 48, 48)


def _make_volumes(tmpdir: Path, n: int):
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    from synthetic import build_raw_dataset

    ids = [f"{i:04d}" for i in range(1, n + 1)]
    build_raw_dataset(tmpdir, ids, shape=VOLUME_SHAPE, seed=0)
    return ids


def bench_tpu(
    tmpdir: Path,
    ids,
    reps: int = 3,
    max_reps: int = 7,
    spread_ratio: float = 2.5,
    rep_budget_s: float = 900.0,
) -> dict:
    """Fused pipeline: decode (native, worker thread) -> ONE XLA program per
    volume (normalize + body mask + batched sliding window, body-masked
    output) -> fetch.  Host decode of case i+1 overlaps device compute of
    case i (async dispatch).

    Self-defending measurement (VERDICT r1 weak#2): the timed pass repeats
    ``reps`` times — the headline is the MEDIAN with min/max spread reported
    alongside — and a separate non-pipelined pass breaks one volume's wall
    clock into decode / host-prep+dispatch / device-compute+fetch phases so
    the number explains itself (tunnel-link variance shows up as compute/
    fetch spread).

    Tunnel-weather defense: one multi-minute link stall hitting 1-2 of 3
    reps drags a median-of-3 far below the chip's capability (r4 session:
    reps [0.099, 0.267, 0.721] vol/s — a 7x within-run spread).  When the
    rep spread exceeds ``spread_ratio`` the loop keeps adding reps (up to
    ``max_reps``, bounded by ``rep_budget_s``) so the reported median is a
    median over enough of the session to average out the stalls — the same
    median-of-N-within-one-session discipline every A/B in this repo uses."""
    import statistics
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from light_unet_tpu.config import Config
    from light_unet_tpu.models.unet3d import build_model, init_params
    from light_unet_tpu.ops.fused import FusedVolumePipeline
    from light_unet_tpu.utils import fastio

    cfg = Config()
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16, inference=True)
    params = jax.device_put(init_params(model, jax.random.PRNGKey(0), PATCH))
    # Transfers ride the config defaults: uint16 quantized both ways (halves
    # the link bytes; measured H2D 0.585->0.357 s, D2H 1.14->0.65 s per
    # volume, error <=8e-6 — see TpuConfig and tests/unit/test_fused.py).
    pipe = FusedVolumePipeline(
        lambda p, x: model.apply(p, x, train=False), cfg, patch_batch=cfg.tpu.patch_batch
    )
    paths = [tmpdir / "images" / f"{cid}_0000.nii.gz" for cid in ids]

    def load_and_prepare(path):
        # decode AND host prep (percentiles/quantize/pad) on the worker
        # thread — the dispatch thread then only hands buffers to the runtime
        img, _hdr = fastio.load_f32(path)
        return pipe.prepare(img)

    def run_all():
        results = []
        pending = None
        with ThreadPoolExecutor(max_workers=2) as pool:
            for prep in pool.map(load_and_prepare, paths):
                disp = pipe.dispatch(params, prep)
                if pending is not None:
                    results.append(pipe.fetch(pending))
                pending = disp
            results.append(pipe.fetch(pending))
        return results

    # warmup / compile on the first volume
    t0 = time.time()
    img, _ = fastio.load_f32(paths[0])
    pipe(params, img)
    compile_s = time.time() - t0

    # timed repetitions over the full volume set; extend past ``reps`` while
    # the spread says a link stall polluted the sample (see docstring)
    rep_vps = []
    probs = None
    loop_t0 = time.time()
    while True:
        t0 = time.time()
        probs = run_all()
        rep_vps.append(len(ids) / (time.time() - t0))
        if len(rep_vps) < reps:
            continue
        if len(rep_vps) >= max_reps or time.time() - loop_t0 > rep_budget_s:
            break
        if max(rep_vps) / max(min(rep_vps), 1e-9) <= spread_ratio:
            break
    assert len(probs) == len(ids) and all(np.isfinite(p).all() for p in probs)
    vps = statistics.median(rep_vps)

    # per-phase breakdown (serial, one volume, median of reps)
    phases = {"decode": [], "host_prepare": [], "dispatch": [], "device_compute_fetch": []}
    for _ in range(reps):
        t0 = time.time()
        img, _ = fastio.load_f32(paths[0])
        t1 = time.time()
        prep = pipe.prepare(img)
        t2 = time.time()
        disp = pipe.dispatch(params, prep)
        t3 = time.time()
        pipe.fetch(disp)
        t4 = time.time()
        phases["decode"].append(t1 - t0)
        phases["host_prepare"].append(t2 - t1)
        phases["dispatch"].append(t3 - t2)
        phases["device_compute_fetch"].append(t4 - t3)

    return {
        "volumes_per_sec": vps,
        "volumes_per_sec_min": min(rep_vps),
        "volumes_per_sec_max": max(rep_vps),
        "volumes_per_sec_reps": [round(v, 4) for v in rep_vps],
        "seconds_per_volume": 1.0 / vps,
        "phase_seconds_median": {k: round(statistics.median(v), 4) for k, v in phases.items()},
        "compile_seconds": compile_s,
        "n_volumes": len(ids),
        "n_reps": len(rep_vps),
        "backend": jax.devices()[0].platform,
    }


def bench_torch_cpu_baseline(tmpdir: Path, cid: str, sample_patches: int = 12) -> dict:
    """Reference-style serial pipeline on torch CPU, extrapolated."""
    import torch
    import torch.nn as nn
    from scipy import ndimage

    from light_unet_tpu.ops.sliding_window import compute_positions
    from light_unet_tpu.utils import nifti

    torch.set_num_threads(max(1, (torch.get_num_threads())))

    # compact 217K-param U-Net equivalent for timing (same ops/shapes as the
    # architecture spec; weights random — timing only)
    def dws(cin, cout):
        return nn.Sequential(
            nn.Conv3d(cin, cin, 3, padding=1, groups=cin, bias=False),
            nn.Conv3d(cin, cout, 1, bias=False),
        )

    class Block(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1, self.n1 = dws(cin, cout), nn.InstanceNorm3d(cout, affine=True)
            self.c2, self.n2 = dws(cout, cout), nn.InstanceNorm3d(cout, affine=True)
            self.short = (
                nn.Sequential(nn.Conv3d(cin, cout, 1, bias=False), nn.InstanceNorm3d(cout, affine=True))
                if cin != cout
                else nn.Identity()
            )
            self.act = nn.LeakyReLU(0.01)

        def forward(self, x):
            r = self.short(x)
            h = self.act(self.n1(self.c1(x)))
            return self.act(self.n2(self.c2(h)) + r)

    class Net(nn.Module):
        def __init__(self, ch=(16, 32, 64, 128)):
            super().__init__()
            self.e0 = Block(1, ch[0])
            self.down = nn.ModuleList([Block(ch[i], ch[i + 1]) for i in range(3)])
            self.pool = nn.MaxPool3d(2)
            self.mid = Block(ch[3], ch[3])
            self.up = nn.ModuleList([nn.ConvTranspose3d(ch[3 - i], ch[3 - i] // 2, 2, 2) for i in range(3)])
            self.dec = nn.ModuleList([Block(ch[3 - i], ch[2 - i]) for i in range(3)])
            self.head = nn.Conv3d(ch[0], 1, 1)

        def forward(self, x):
            skips = [self.e0(x)]
            h = skips[0]
            for blk in self.down:
                h = blk(self.pool(h))
                skips.append(h)
            h = self.mid(h)
            for i in range(3):
                h = self.up[i](h)
                h = self.dec[i](torch.cat([h, skips[2 - i]], dim=1))
            return torch.sigmoid(self.head(h))

    model = Net().eval()

    t0 = time.time()
    img = nifti.load(tmpdir / "images" / f"{cid}_0000.nii.gz").get_fdata()
    load_s = time.time() - t0

    # host preprocess (numpy/scipy, as the reference does)
    t0 = time.time()
    lo, hi = np.percentile(img, 0.5), np.percentile(img, 99.5)
    norm = (np.clip(img, lo, hi) - lo) / max(hi - lo, 1e-8)
    mask = norm > 0.02
    struct = ndimage.iterate_structure(ndimage.generate_binary_structure(3, 1), 5)
    mask = ndimage.binary_closing(mask, structure=struct)
    labeled, n = ndimage.label(mask)
    if n:
        sizes = ndimage.sum(mask, labeled, range(1, n + 1))
        mask = labeled == (np.argmax(sizes) + 1)
    mask = ndimage.binary_dilation(mask, ndimage.generate_binary_structure(3, 1), iterations=3)
    preprocess_s = time.time() - t0

    positions = compute_positions(norm.shape, PATCH, 0.5)
    patch_times = []
    with torch.no_grad():
        # warmup
        model(torch.zeros(1, 1, *PATCH))
        for z, y, x in positions[:sample_patches]:
            # time the WHOLE serial per-patch cost (slice+pad+tensor
            # conversion+forward+fetch) — the reference pipeline pays all of
            # it per grid position, and r01-r03 captures timed it this way
            t0 = time.time()
            patch = norm[z : z + 48, y : y + 48, x : x + 48]
            if patch.shape != PATCH:
                patch = np.pad(patch, [(0, 48 - s) for s in patch.shape])
            t = torch.from_numpy(np.ascontiguousarray(patch)).float()[None, None]
            model(t).squeeze().numpy()
            patch_times.append(time.time() - t0)
    per_patch = float(np.mean(patch_times))
    total = load_s + preprocess_s + per_patch * len(positions)
    return {
        "volumes_per_sec": 1.0 / total,
        "seconds_per_volume": total,
        "n_patches": int(len(positions)),
        "per_patch_seconds": per_patch,
        # per-patch spread on the 1-core host: vs_baseline variance across
        # rounds is dominated by THIS number's host-load sensitivity (the
        # r01->r02 baseline drifted 44%) — quote it so the ratio explains
        # itself; the absolute TPU volumes/sec is the primary metric
        "per_patch_seconds_min": float(np.min(patch_times)),
        "per_patch_seconds_max": float(np.max(patch_times)),
        "per_patch_seconds_std": float(np.std(patch_times)),
        "n_sample_patches": len(patch_times),
    }


def run_bench():
    """The actual measurement (child mode / --run).  May die on tunnel
    flakes — the supervisor in main() retries it in a fresh process."""
    import tempfile

    # persistent XLA compilation cache: a second bench run in a fresh
    # process reuses all compiled programs (compile_seconds ~0); set
    # LIGHT_UNET_NO_COMPILE_CACHE=1 to measure true cold starts
    from light_unet_tpu.config import TpuConfig
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(TpuConfig().compilation_cache_dir)

    with tempfile.TemporaryDirectory() as td:
        tmpdir = Path(td)
        ids = _make_volumes(tmpdir, N_VOLUMES)
        tpu = bench_tpu(tmpdir, ids)
        baseline = bench_torch_cpu_baseline(tmpdir, ids[0])

    result = {
        "metric": "volumes_per_sec_e2e_preprocess_plus_sliding_window_144x144x272",
        "value": round(tpu["volumes_per_sec"], 4),  # median of n_reps passes
        "unit": "volumes/sec",
        "vs_baseline": round(tpu["volumes_per_sec"] / baseline["volumes_per_sec"], 2),
        "spread": {
            "min": round(tpu["volumes_per_sec_min"], 4),
            "max": round(tpu["volumes_per_sec_max"], 4),
        },
        "detail": {
            "tpu": {k: round(v, 4) if isinstance(v, float) else v for k, v in tpu.items()},
            "torch_cpu_serial_baseline": {
                k: round(v, 4) if isinstance(v, float) else v for k, v in baseline.items()
            },
        },
    }
    print(json.dumps(result))


# --- self-defending supervisor (VERDICT r3 #1) ------------------------------
#
# The tunneled TPU backend is known-flaky (multi-minute stalls, transient
# ``Unable to initialize backend 'axon': UNAVAILABLE`` — BENCH_r03.json died
# exactly this way and the driver recorded ``parsed: null``).  Default mode
# therefore runs the measurement in a CHILD process with bounded retries and
# a per-attempt timeout; a fresh process also sidesteps JAX's cached
# backend-init failure.  Whatever happens, EXACTLY ONE JSON line is printed.

RETRY_BACKOFF_S = (60, 120)  # sleeps between the 3 attempts
ATTEMPT_TIMEOUT_S = int(__import__("os").environ.get("LIGHT_UNET_BENCH_TIMEOUT", "1800"))
# global deadline: stop retrying early enough that the fail-soft JSON is
# ALWAYS printed before any plausible outer (driver) timeout kills us
DEADLINE_S = int(__import__("os").environ.get("LIGHT_UNET_BENCH_DEADLINE", "4800"))
_START = time.time()


def _attempt(timeout_s: float) -> tuple:
    """Run the bench in a child process; return (json_dict | None, err_tail)."""
    import os
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--run"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=timeout_s,
            env=os.environ.copy(),
            text=True,
        )
    except subprocess.TimeoutExpired:
        return None, f"attempt timed out after {timeout_s:.0f}s (tunnel stall?)"
    tail = (proc.stderr or "").strip().splitlines()[-3:]
    for line in reversed((proc.stdout or "").strip().splitlines()):
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            return parsed, ""
    return None, f"rc={proc.returncode}; " + " | ".join(tail)


def main():
    if "--run" in sys.argv:  # child / direct mode: no supervisor
        run_bench()
        return
    errors = []
    for i in range(1 + len(RETRY_BACKOFF_S)):
        remaining = DEADLINE_S - (time.time() - _START)
        if remaining < 120:  # not enough budget for a meaningful attempt
            errors.append(f"attempt {i + 1}: skipped (deadline {DEADLINE_S}s reached)")
            break
        result, err = _attempt(min(ATTEMPT_TIMEOUT_S, remaining - 30))
        if result is not None:
            if errors:  # record that earlier attempts flaked (driver-visible)
                result["retries"] = errors
            print(json.dumps(result))
            return
        errors.append(f"attempt {i + 1}: {err}")
        print(f"bench attempt {i + 1} failed: {err}", file=sys.stderr)
        if i < len(RETRY_BACKOFF_S):
            time.sleep(RETRY_BACKOFF_S[i])
    # persistent failure: STILL print the one parseable JSON line
    print(json.dumps({
        "metric": "volumes_per_sec_e2e_preprocess_plus_sliding_window_144x144x272",
        "value": 0.0,
        "unit": "volumes/sec",
        "vs_baseline": 0.0,
        "backend": "unavailable",
        "error": errors,
    }))


if __name__ == "__main__":
    main()
