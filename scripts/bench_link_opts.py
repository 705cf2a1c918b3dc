#!/usr/bin/env python
"""Interleaved A/B measurement of the three round-3 link optimizations
(VERDICT r3 #2): block-sparse D2H fetch, K-step chained dispatch, and
bit-packed body-mask uploads.  Each was shipped correctness-pinned but
without an on-hardware perf verdict; this script produces the verdicts that
decide the defaults (measure-or-revert, CLAUDE.md discipline).

The tunneled link drifts on multi-minute scales, so every comparison is
interleaved WITHIN one session (config A segment, config B segment,
repeat) and reported as per-segment pairs plus medians — never across
sessions.

Run on the real chip (each experiment is independently runnable so a
tunnel flake costs one experiment, not the session):

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_link_opts.py --which sparse
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_link_opts.py --which chain
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_link_opts.py --which mask

Prints one JSON line per experiment.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

SHAPE = (144, 144, 272)  # reference-scale whole-body volume
PATCH = (48, 48, 48)


def _model_and_params():
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.config import Config
    from light_unet_tpu.models.unet3d import build_model, init_params

    cfg = Config()
    model = build_model(cfg.model, compute_dtype=jnp.bfloat16, inference=True)
    params = jax.device_put(init_params(model, jax.random.PRNGKey(0), PATCH))
    return cfg, model, params


def _volumes(tmp: Path, n: int):
    from synthetic import build_raw_dataset

    from light_unet_tpu.utils import fastio

    ids = [f"{i:04d}" for i in range(1, n + 1)]
    build_raw_dataset(tmp, ids, shape=SHAPE, seed=0)
    return [
        fastio.load_f32(tmp / "images" / f"{cid}_0000.nii.gz")[0] for cid in ids
    ]


# --------------------------------------------------------------------------
def bench_sparse(segments: int = 3, n_volumes: int = 4) -> dict:
    """(a) block-sparse D2H on the serving path: FusedVolumePipeline with
    sparse_fetch off vs on.  D2H fetch was the largest serving phase
    (0.65 s of 0.84 s/volume, docs/PERFORMANCE.md) and the prob map is
    body-masked (exactly zero outside the dilated body), so occupied tiles
    should be well under half the bucketed grid."""
    from light_unet_tpu.ops.fused import FusedVolumePipeline

    cfg, model, params = _model_and_params()
    apply_fn = lambda p, x: model.apply(p, x, train=False)  # noqa: E731

    with tempfile.TemporaryDirectory() as td:
        vols = _volumes(Path(td), n_volumes)

        pipes = {}
        for name, on in (("dense", False), ("sparse", True)):
            cfg.tpu.sparse_fetch = on
            pipes[name] = FusedVolumePipeline(
                apply_fn, cfg, patch_batch=cfg.tpu.patch_batch
            )
            pipes[name](params, vols[0])  # compile + warm

        def run_all(pipe):
            """pipelined: dispatch i+1 before fetching i (the serving mode)."""
            t0 = time.time()
            pending = None
            outs = []
            for v in vols:
                d = pipe.dispatch(params, pipe.prepare(v))
                if pending is not None:
                    outs.append(pipe.fetch(pending))
                pending = d
            outs.append(pipe.fetch(pending))
            dt = time.time() - t0
            return len(vols) / dt, outs

        seg = {"dense": [], "sparse": []}
        ref_out = None
        for _ in range(segments):
            for name in ("dense", "sparse"):
                vps, outs = run_all(pipes[name])
                seg[name].append(vps)
                if name == "dense":
                    ref_out = outs
                else:  # bit-identical reconstruction check, every segment
                    for a, b in zip(ref_out, outs):
                        np.testing.assert_array_equal(a, b)

        dense, sparse = (statistics.median(seg[k]) for k in ("dense", "sparse"))
        return {
            "experiment": "sparse_fetch_serving",
            "n_volumes": n_volumes,
            "segments": segments,
            "dense_vps_median": round(dense, 4),
            "sparse_vps_median": round(sparse, 4),
            "speedup": round(sparse / dense, 3),
            "dense_vps_segments": [round(v, 4) for v in seg["dense"]],
            "sparse_vps_segments": [round(v, 4) for v in seg["sparse"]],
            "bit_identical": True,
        }


# --------------------------------------------------------------------------
def bench_chain(segments: int = 3, steps: int = 16, batches=(2, 8), ks=(1, 4, 8)) -> list:
    """(b) K-step chained dispatch in corpus mode: per-step dispatch RTT is
    the small-batch limiter (~56 ms pipelined at batch 8); one program
    scanning K steps amortizes it K-fold."""
    from synthetic import build_raw_dataset, write_split_files

    from light_unet_tpu.config import Config
    from light_unet_tpu.core.trainer import Trainer
    from light_unet_tpu.utils import nifti

    results = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        ids = [f"{i:04d}" for i in range(1, 7)]
        build_raw_dataset(tmp / "processed", ids, shape=SHAPE, seed=0)
        for cid in ids:
            p = tmp / "processed" / "images" / f"{cid}_0000.nii.gz"
            img = nifti.load(p).get_fdata()
            img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
            nifti.save(nifti.Nifti1Image(img.astype(np.float32), np.diag([4, 4, 4, 1])), p)
        write_split_files(tmp / "splits", ids, ids[:1])

        for batch in batches:
            trainers = {}
            iters = {}

            def self_next(iters, t, k):
                try:
                    return next(iters[k])
                except StopIteration:
                    iters[k] = iter(t._dispatch_units(t.train_loader))
                    return next(iters[k])

            for k in ks:
                cfg = Config()
                cfg.training.batch_size = batch
                cfg.training.use_warmup = False
                cfg.data.body_mask.enabled = False
                cfg.tpu.steps_per_dispatch = k
                cfg.data_dir = str(tmp / "processed")
                cfg.splits_dir = str(tmp / "splits")
                t = Trainer(cfg, workdir=str(tmp / f"w_b{batch}_k{k}"))
                assert t.corpus is not None, "corpus mode required for chaining"
                trainers[k] = t
                iters[k] = iter(t._dispatch_units(t.train_loader))
                # compile + sync
                _ = np.asarray(t._step_on_batch(self_next(iters, t, k)))

            seg = {k: [] for k in ks}
            for _ in range(segments):
                for k in ks:
                    t = trainers[k]
                    n_done = 0
                    t0 = time.time()
                    losses = []
                    while n_done < steps:
                        u = self_next(iters, t, k)
                        losses.append(t._step_on_batch(u))
                        n_done += u.shape[0] if u.ndim == 3 else 1
                    _ = [np.asarray(l) for l in losses]  # sync once (pipelined)
                    seg[k].append(n_done / (time.time() - t0))
            for k in ks:
                results.append({
                    "experiment": "steps_per_dispatch",
                    "batch": batch,
                    "k": k,
                    "steps_per_sec_median": round(statistics.median(seg[k]), 3),
                    "step_ms": round(1e3 / statistics.median(seg[k]), 1),
                    "segments_sps": [round(v, 3) for v in seg[k]],
                })
    return results


# --------------------------------------------------------------------------
def bench_mask(segments: int = 3, n_volumes: int = 4) -> dict:
    """(c) bit-packed body-mask uploads on the sliding-window path (the
    Inferencer serves with a host-loaded body mask): pack on vs off.  The
    8x byte cut is arithmetic; this records the wall-clock verdict."""
    from light_unet_tpu.ops.sliding_window import SlidingWindowInferencer

    cfg, model, params = _model_and_params()
    apply_fn = lambda p, x: model.apply(p, x, train=False)  # noqa: E731

    with tempfile.TemporaryDirectory() as td:
        vols = _volumes(Path(td), n_volumes)
        masks = [(v > np.percentile(v, 40)).astype(np.uint8) for v in vols]

        sws = {}
        for name, on in (("packed", True), ("unpacked", False)):
            sws[name] = SlidingWindowInferencer(
                apply_fn, patch_size=PATCH, patch_batch=cfg.tpu.patch_batch,
                z_bucket=cfg.tpu.z_bucket, transfer_dtype="uint16",
                fetch_dtype="uint16", pack_mask=on,
            )
            sws[name].fetch(sws[name].dispatch(params, vols[0], post_mask=masks[0]))

        def run_all(sw):
            t0 = time.time()
            pending = None
            outs = []
            for v, m in zip(vols, masks):
                d = sw.dispatch(params, sw.prepare(v, post_mask=m))
                if pending is not None:
                    outs.append(sw.fetch(pending))
                pending = d
            outs.append(sw.fetch(pending))
            return len(vols) / (time.time() - t0), outs

        seg = {"packed": [], "unpacked": []}
        ref_out = None
        for _ in range(segments):
            for name in ("unpacked", "packed"):
                vps, outs = run_all(sws[name])
                seg[name].append(vps)
                if name == "unpacked":
                    ref_out = outs
                else:
                    for a, b in zip(ref_out, outs):
                        np.testing.assert_array_equal(a, b)

        unp, pk = (statistics.median(seg[k]) for k in ("unpacked", "packed"))
        return {
            "experiment": "pack_mask_sliding_window",
            "n_volumes": n_volumes,
            "segments": segments,
            "unpacked_vps_median": round(unp, 4),
            "packed_vps_median": round(pk, 4),
            "speedup": round(pk / unp, 3),
            "unpacked_vps_segments": [round(v, 4) for v in seg["unpacked"]],
            "packed_vps_segments": [round(v, 4) for v in seg["packed"]],
            "bit_identical": True,
        }


# --------------------------------------------------------------------------
def bench_pbatch(segments: int = 3, n_volumes: int = 4, batches=(96, 192)) -> list:
    """(d) roofline lever (VERDICT r3 #7): the serving forward runs at 35.7%
    of HBM peak; doubling the per-chunk patch batch halves per-chunk weight
    re-reads and loop overhead.  Measures the raw jitted forward (ms/patch,
    achieved GB/s from the XLA cost model) AND the end-to-end pipeline at
    each patch_batch, interleaved."""
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.ops.fused import FusedVolumePipeline

    cfg, model, params = _model_and_params()
    apply_fn = lambda p, x: model.apply(p, x, train=False)  # noqa: E731

    results = []
    with tempfile.TemporaryDirectory() as td:
        vols = _volumes(Path(td), n_volumes)

        # raw forward at each chunk size.  The input batch is uploaded ONCE
        # per b and synced (by fetching a slice — block_until_ready is
        # unreliable on this backend) BEFORE the timing loop: an async
        # device_put inside the t0 window would add 20-40 MB of tunnel
        # traffic and the link's stall variance to every sample, drowning
        # the on-chip effect this experiment exists to isolate.
        fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
        raw = {}
        cost_bytes = {}
        xs = {}
        for b in batches:
            x = jnp.asarray(
                np.random.default_rng(0).random((b, *PATCH, 1), np.float32),
                jnp.bfloat16,
            )
            compiled = fwd.lower(params, x).compile()
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            cost_bytes[b] = float(c.get("bytes accessed", float("nan"))) if c else float("nan")
            out = fwd(params, x); _ = np.asarray(out[0, 0, 0, 0])  # warm
            _ = np.asarray(x[0, 0, 0, 0, 0])  # force the upload to settle
            xs[b] = x
            raw[b] = []
        for _ in range(max(segments, 3)):
            for b in batches:
                t0 = time.time()
                out = fwd(params, xs[b])
                _ = np.asarray(out[0, 0, 0, 0])
                raw[b].append(time.time() - t0)

        # end-to-end at each patch_batch
        pipes = {}
        for b in batches:
            pipes[b] = FusedVolumePipeline(apply_fn, cfg, patch_batch=b)
            pipes[b](params, vols[0])
        e2e = {b: [] for b in batches}
        for _ in range(segments):
            for b in batches:
                pipe = pipes[b]
                t0 = time.time()
                pending = None
                for v in vols:
                    d = pipe.dispatch(params, pipe.prepare(v))
                    if pending is not None:
                        pipe.fetch(pending)
                    pending = d
                pipe.fetch(pending)
                e2e[b].append(len(vols) / (time.time() - t0))

        for b in batches:
            t_med = statistics.median(raw[b])
            results.append({
                "experiment": "patch_batch_roofline",
                "patch_batch": b,
                "forward_ms_median": round(t_med * 1e3, 2),
                "forward_ms_per_patch": round(t_med * 1e3 / b, 3),
                "achieved_gbps": round(cost_bytes[b] / t_med / 1e9, 1)
                if np.isfinite(cost_bytes[b]) else None,
                "e2e_vps_median": round(statistics.median(e2e[b]), 4),
                "e2e_vps_segments": [round(v, 4) for v in e2e[b]],
            })
    return results


# --------------------------------------------------------------------------
def bench_tail(segments: int = 3, n_volumes: int = 4, patch_batch: int = 192) -> dict:
    """(e) mixed tail-bucket chunk schedule (``choose_chunks``): a 275-patch
    whole-body volume at chunk 192 forwards 192 + 128 = 320 slots instead of
    the uniform round-up's 2x192 = 384, so the chunk-192 per-patch rate
    (0.525 ms measured) should survive to the e2e number instead of being
    eaten by padding.  Interleaves the tailed schedule against the uniform
    round-up at the same patch_batch; outputs must match bit-exactly."""
    import light_unet_tpu.ops.fused as fused_mod
    from light_unet_tpu.ops.fused import FusedVolumePipeline
    from light_unet_tpu.ops.sliding_window import _round_up, choose_chunk

    cfg, model, params = _model_and_params()
    apply_fn = lambda p, x: model.apply(p, x, train=False)  # noqa: E731

    tailed_choose = fused_mod.choose_chunks

    def uniform_choose(n, pb):
        c = choose_chunk(max(1, n), pb)
        return c, 0, _round_up(max(n, 1), c)

    with tempfile.TemporaryDirectory() as td:
        vols = _volumes(Path(td), n_volumes)

        # one pipeline per schedule; the schedule is decided in prepare(), so
        # swap the module's choose_chunks around every prepare call (the
        # script is single-threaded and prepares inline)
        pipes = {
            name: FusedVolumePipeline(apply_fn, cfg, patch_batch=patch_batch)
            for name in ("uniform", "tailed")
        }
        chooser = {"uniform": uniform_choose, "tailed": tailed_choose}
        slots = {}

        def prepare(name, v):
            fused_mod.choose_chunks = chooser[name]
            try:
                prep = pipes[name].prepare(v)
            finally:
                fused_mod.choose_chunks = tailed_choose
            slots[name] = int(prep[4].shape[0])
            return prep

        for name in ("uniform", "tailed"):  # compile + warm both variants
            pipes[name].fetch(pipes[name].dispatch(params, prepare(name, vols[0])))

        def run_all(name):
            pipe = pipes[name]
            t0 = time.time()
            pending = None
            outs = []
            for v in vols:
                d = pipe.dispatch(params, prepare(name, v))
                if pending is not None:
                    outs.append(pipe.fetch(pending))
                pending = d
            outs.append(pipe.fetch(pending))
            return len(vols) / (time.time() - t0), outs

        seg = {"uniform": [], "tailed": []}
        ref_out = None
        max_diff = 0.0
        for _ in range(segments):
            for name in ("uniform", "tailed"):
                vps, outs = run_all(name)
                seg[name].append(vps)
                if name == "uniform":
                    ref_out = outs
                else:
                    # per-patch conv/IN math is batch-size independent, but
                    # the tail forward compiles at a different batch so the
                    # MXU picks different bf16 tilings — measured ≤0.03 prob
                    # drift on the real chip (f32 exactness is pinned on CPU
                    # in tests/unit/test_sliding_window.py); bound at bf16
                    # resolution, not the uint16 transfer step
                    for a, b in zip(ref_out, outs):
                        max_diff = max(max_diff, float(np.abs(a - b).max()))
                        np.testing.assert_allclose(a, b, atol=0.06)

        uni, tl = (statistics.median(seg[k]) for k in ("uniform", "tailed"))
        return {
            "experiment": "tail_chunk_schedule",
            "patch_batch": patch_batch,
            "n_volumes": n_volumes,
            "segments": segments,
            "slots_uniform": slots["uniform"],
            "slots_tailed": slots["tailed"],
            "uniform_vps_median": round(uni, 4),
            "tailed_vps_median": round(tl, 4),
            "speedup": round(tl / uni, 3),
            "uniform_vps_segments": [round(v, 4) for v in seg["uniform"]],
            "tailed_vps_segments": [round(v, 4) for v in seg["tailed"]],
            "max_abs_diff": max_diff,
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=["sparse", "chain", "mask", "pbatch", "tail", "all"],
                    default="all")
    ap.add_argument("--segments", type=int, default=3)
    ap.add_argument("--shape", type=int, nargs=3, default=None,
                    help="override the volume shape (CPU smoke: 64 64 96)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (harness smoke tests; the env "
                    "pins JAX_PLATFORMS and jax.config is the only override)")
    ap.add_argument("--steps", type=int, default=16,
                    help="chain: steps timed per segment")
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 8],
                    help="chain: batch sizes to compare")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4, 8],
                    help="chain: steps_per_dispatch values to compare")
    ap.add_argument("--pbatches", type=int, nargs="+", default=[96, 192],
                    help="pbatch: patch_batch values to compare")
    ap.add_argument("--tail-pbatch", type=int, default=192,
                    help="tail: patch_batch for the schedule A/B (CPU smoke: "
                    "32 with --shape 96 96 120 -> 36 patches, tail 8)")
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.shape:
        global SHAPE
        SHAPE = tuple(args.shape)

    from light_unet_tpu.config import TpuConfig
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(TpuConfig().compilation_cache_dir)

    if args.which in ("sparse", "all"):
        print(json.dumps(bench_sparse(args.segments)), flush=True)
    if args.which in ("chain", "all"):
        for r in bench_chain(args.segments, steps=args.steps,
                             batches=tuple(args.batches), ks=tuple(args.ks)):
            print(json.dumps(r), flush=True)
    if args.which in ("mask", "all"):
        print(json.dumps(bench_mask(args.segments)), flush=True)
    if args.which in ("pbatch", "all"):
        for r in bench_pbatch(args.segments, batches=tuple(args.pbatches)):
            print(json.dumps(r), flush=True)
    if args.which in ("tail", "all"):
        print(json.dumps(bench_tail(args.segments, patch_batch=args.tail_pbatch)),
              flush=True)


if __name__ == "__main__":
    main()
