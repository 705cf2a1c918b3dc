"""Interleaved real-chip A/B: lax forward vs fused Pallas residual blocks.

The fused kernel (``ops/pallas_block.py``) runs each residual block in a
single HBM pass per sample (activations VMEM-resident) where XLA's lowering
makes ~13-15 activation-sized HBM passes.  This script measures the whole
serving forward (the sliding-window engine's hot program) both ways,
interleaved A/B/A/B within one session (the tunnel link drifts — see
docs/PERFORMANCE.md), and reports medians + the speedup.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_block.py [batch ...]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PATCH = 48
ROUNDS = 7
INNER = 3  # forwards per timed round


def _sync(y):
    # block_until_ready is unreliable over the tunnel: fetch 1 element
    np.asarray(y[0, 0, 0, 0, 0])


def bench(fn, params, x, label):
    ts = []
    y = fn(params, x)
    _sync(y)  # compile + warm
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(INNER):
            y = fn(params, x)
        _sync(y)
        ts.append((time.perf_counter() - t0) / INNER)
    med = statistics.median(ts)
    print(f"  {label}: median {med * 1e3:.1f} ms  (n={ROUNDS}x{INNER}, "
          f"spread {min(ts) * 1e3:.1f}-{max(ts) * 1e3:.1f})", flush=True)
    return med, y


def main():
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.config import Config
    from light_unet_tpu.models.fused_forward import make_fused_apply
    from light_unet_tpu.models.unet3d import build_model, init_params
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache

    batches = [int(a) for a in sys.argv[1:]] or [96, 192]
    cfg = Config()
    enable_compilation_cache(cfg.tpu.compilation_cache_dir)
    print("backend:", jax.default_backend(), flush=True)

    model = build_model(cfg.model, compute_dtype=jnp.bfloat16, inference=True)
    params = jax.device_put(init_params(model, jax.random.PRNGKey(0), (PATCH,) * 3))
    lax_fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    fused_fwd = jax.jit(make_fused_apply(cfg.model, compute_dtype=jnp.bfloat16))

    for batch in batches:
        # generate the input ON DEVICE: a batch-192 f32 volume is 85 MB,
        # a multi-minute upload (or a stall) on a bad-weather link day
        gen = jax.jit(
            lambda k: jax.random.uniform(k, (batch, PATCH, PATCH, PATCH, 1), jnp.float32),
            static_argnums=(),
        )
        x = gen(jax.random.PRNGKey(0))
        _sync(x)
        print(f"batch {batch} x {PATCH}^3:", flush=True)
        # interleave: alternate A and B rounds so link drift hits both
        tl, yl = bench(lax_fwd, params, x, "lax   (warm)")
        tf, yf = bench(fused_fwd, params, x, "fused (warm)")
        tl2, _ = bench(lax_fwd, params, x, "lax   (re)")
        tf2, _ = bench(fused_fwd, params, x, "fused (re)")
        lax_med = statistics.median([tl, tl2])
        fus_med = statistics.median([tf, tf2])
        err = np.abs(np.asarray(yl, np.float32) - np.asarray(yf, np.float32)).max()
        print(f"  => lax {lax_med * 1e3:.1f} ms, fused {fus_med * 1e3:.1f} ms, "
              f"speedup {lax_med / fus_med:.2f}x, max|diff| {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
