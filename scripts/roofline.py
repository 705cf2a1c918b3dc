"""Roofline analysis of the serving forward pass (VERDICT r2 weak#4).

Reports, for the 96x48^3-patch bf16 forward (the sliding-window engine's
hot program): analytic + XLA cost-model FLOPs and HBM bytes, measured wall
time, achieved FLOP/s and GB/s, and the fraction of TPU v5e peak — plus an
analytic per-level table showing which U-Net levels are bandwidth-bound
(arithmetic intensity vs the v5e ridge point).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# TPU v5e (one chip) public peaks
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES = 819e9

BATCH = 96
PATCH = 48


def analytic_levels(batch=BATCH, d=PATCH, ch=(16, 32, 64, 128)):
    """Per-level FLOPs / HBM bytes for the encoder path's residual blocks
    (depthwise-separable convs, the flagship config).  Bytes assume bf16
    activations with perfect fusion INSIDE a block (read input once, write
    output once per conv) — i.e. an optimistic lower bound on traffic."""
    rows = []
    spatial = d**3
    cin = 1
    for level, c in enumerate(ch):
        s = spatial // (8**level)  # MaxPool3d(2) halves each dim per level
        # residual block = 2x (depthwise 3^3 + pointwise 1^3) + shortcut 1^3
        flops = 0
        flops += 2 * 27 * cin * s + 2 * cin * c * s          # conv1 dw+pw
        flops += 2 * 27 * c * s + 2 * c * c * s              # conv2 dw+pw
        if cin != c:
            flops += 2 * cin * c * s                         # shortcut 1x1x1
        flops *= batch
        # traffic: activations in/out per conv pair (bf16 = 2 bytes)
        bytes_ = batch * s * (cin + c + c + c) * 2
        ai = flops / max(bytes_, 1)
        rows.append(
            dict(level=level, channels=c, spatial=round(s ** (1 / 3)),
                 gflops=flops / 1e9, mbytes=bytes_ / 1e6,
                 arithmetic_intensity=ai)
        )
        cin = c
    return rows


def main():
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.config import Config
    from light_unet_tpu.models.unet3d import build_model, init_params
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache

    cfg = Config()
    enable_compilation_cache(cfg.tpu.compilation_cache_dir)
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16, inference=True)
    params = jax.device_put(init_params(model, jax.random.PRNGKey(0), (PATCH,) * 3))

    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    x = jnp.asarray(np.random.default_rng(0).random((BATCH, PATCH, PATCH, PATCH, 1), np.float32))

    lowered = fwd.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    xla_flops = float(cost.get("flops", float("nan")))
    xla_bytes = float(cost.get("bytes accessed", float("nan")))

    # timed passes; force sync by fetching a slice (block_until_ready is
    # unreliable over the tunneled backend — CLAUDE.md)
    out = fwd(params, x); _ = np.asarray(out[0, 0, 0, 0])  # warm
    times = []
    for _ in range(10):
        t0 = time.time()
        out = fwd(params, x)
        _ = np.asarray(out[0, 0, 0, 0])
        times.append(time.time() - t0)
    t_med = statistics.median(times)

    print(f"forward {BATCH}x{PATCH}^3 bf16: median {t_med*1e3:.1f} ms "
          f"(min {min(times)*1e3:.1f} / max {max(times)*1e3:.1f} over 10)")
    print(f"XLA cost model: {xla_flops/1e9:.2f} GFLOPs, {xla_bytes/1e6:.1f} MB accessed")
    if np.isfinite(xla_flops):
        print(f"achieved: {xla_flops/t_med/1e12:.2f} TFLOP/s "
              f"({100*xla_flops/t_med/V5E_BF16_FLOPS:.2f}% of v5e bf16 peak)")
    if np.isfinite(xla_bytes):
        print(f"achieved: {xla_bytes/t_med/1e9:.1f} GB/s "
              f"({100*xla_bytes/t_med/V5E_HBM_BYTES:.1f}% of v5e HBM peak)")
    ridge = V5E_BF16_FLOPS / V5E_HBM_BYTES
    print(f"v5e ridge point: {ridge:.0f} FLOP/byte")
    if np.isfinite(xla_flops) and np.isfinite(xla_bytes):
        ai = xla_flops / xla_bytes
        bound = "BANDWIDTH" if ai < ridge else "COMPUTE"
        print(f"whole-program arithmetic intensity: {ai:.1f} FLOP/byte -> {bound}-bound")
        roof = min(V5E_BF16_FLOPS, ai * V5E_HBM_BYTES)
        print(f"roofline-limited time at peak: {xla_flops/roof*1e3:.1f} ms "
              f"(measured {t_med*1e3:.1f} ms = {100*xla_flops/roof/t_med:.0f}% of roofline)")

    print("\nper-encoder-level analytic (residual blocks, optimistic fusion):")
    print(f"{'lvl':>3} {'C':>4} {'side':>5} {'GFLOP':>8} {'MB':>8} {'AI':>7}  bound")
    for r in analytic_levels():
        bound = "BW" if r["arithmetic_intensity"] < ridge else "MXU"
        print(f"{r['level']:>3} {r['channels']:>4} {r['spatial']:>5} "
              f"{r['gflops']:>8.2f} {r['mbytes']:>8.1f} "
              f"{r['arithmetic_intensity']:>7.1f}  {bound}")


if __name__ == "__main__":
    main()
