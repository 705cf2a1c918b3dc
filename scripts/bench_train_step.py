"""Training-step benchmark: host-streamed vs device-corpus batches.

Measures end-to-end steps/s (host sampling + transfer + jitted step) at
batch 2 / 8 / 32 for both data paths on the current backend, on synthetic
whole-body-scale cases.  The VERDICT r2 criterion: with the corpus
resident, end-to-end steps/s should approach the pure-compute step rate
(the ~30% host+H2D tax measured in round 2 disappears).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

N_CASES = 6
SHAPE = (144, 144, 272)
STEPS = 15


def make_trainer(tmp: Path, device_corpus: bool, batch: int):
    from light_unet_tpu.config import Config
    from light_unet_tpu.core.trainer import Trainer

    cfg = Config()
    cfg.training.batch_size = batch
    cfg.training.use_warmup = False
    cfg.data.body_mask.enabled = False
    cfg.tpu.device_corpus = device_corpus
    cfg.data_dir = str(tmp / "processed")
    cfg.splits_dir = str(tmp / "splits")
    return Trainer(cfg, workdir=str(tmp / ("w_corpus" if device_corpus else "w_host")))


class ModeBench:
    """One trainer + its data iterator; measures a segment on demand so the
    two modes can be A/B-interleaved within one session (the tunneled link
    drifts on multi-minute scales — adjacent segments are the only fair
    comparison; see CLAUDE.md)."""

    def __init__(self, tmp: Path, device_corpus: bool, batch: int):
        self.t = make_trainer(tmp, device_corpus, batch)
        self.loader = self.t.train_loader
        self.it = iter(self.loader)
        loss = self._step_once()  # compile
        _ = float(loss)           # sync

    def _step_once(self):
        try:
            b = next(self.it)
        except StopIteration:
            self.it = iter(self.loader)
            b = next(self.it)
        return self.t._step_on_batch(b)

    def segment(self) -> tuple:
        times = []
        for _ in range(STEPS):
            t0 = time.time()
            loss = self._step_once()
            _ = float(loss)  # per-step sync: isolates true per-step latency
            times.append(time.time() - t0)
        med = statistics.median(times)
        # pipelined rate: dispatch all steps, sync once (the trainer's real mode)
        t0 = time.time()
        losses = [self._step_once() for _ in range(STEPS)]
        _ = [float(l) for l in losses]
        piped = (time.time() - t0) / STEPS
        return med, piped


def bench_batch(tmp: Path, batch: int, segments: int = 3) -> list:
    host = ModeBench(tmp, False, batch)
    corpus = ModeBench(tmp, True, batch)
    res = {False: {"synced": [], "piped": []}, True: {"synced": [], "piped": []}}
    for _ in range(segments):
        for mode, b in ((False, host), (True, corpus)):
            med, piped = b.segment()
            res[mode]["synced"].append(med)
            res[mode]["piped"].append(piped)
    out = []
    for mode in (False, True):
        med = statistics.median(res[mode]["synced"])
        piped = statistics.median(res[mode]["piped"])
        out.append({
            "mode": "corpus" if mode else "host",
            "batch": batch,
            "step_ms_median_synced": round(med * 1e3, 1),
            "step_ms_pipelined": round(piped * 1e3, 1),
            "steps_per_sec_pipelined": round(1.0 / piped, 2),
            "piped_segments_ms": [round(x * 1e3, 1) for x in res[mode]["piped"]],
            "corpus_active": (corpus if mode else host).t.corpus is not None,
        })
    return out


def main():
    import json

    from light_unet_tpu.config import TpuConfig
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache
    from synthetic import build_raw_dataset, write_split_files

    enable_compilation_cache(TpuConfig().compilation_cache_dir)

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        ids = [f"{i:04d}" for i in range(1, N_CASES + 1)]
        # training expects preprocessed ([0,1]) volumes: normalize the
        # phantoms on write
        build_raw_dataset(tmp / "processed", ids, shape=SHAPE, seed=0)
        from light_unet_tpu.utils import nifti
        for cid in ids:
            p = tmp / "processed" / "images" / f"{cid}_0000.nii.gz"
            img = nifti.load(p).get_fdata()
            img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
            nifti.save(nifti.Nifti1Image(img.astype(np.float32), np.diag([4, 4, 4, 1])), p)
        write_split_files(tmp / "splits", ids, ids[:1])

        for batch in (2, 8, 32):
            for r in bench_batch(tmp, batch):
                print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
