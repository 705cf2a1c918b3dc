"""Tracing / profiling hooks (the reference has none — SURVEY §5 lists only
tqdm progress bars; this is the planned TPU-native replacement).

Two primitives:

* ``maybe_profile(profile_dir)`` — context manager wrapping
  ``jax.profiler.trace``: when a directory is given (``tpu.profile_dir`` in
  the config, or the ``LIGHT_UNET_PROFILE`` env var), a TensorBoard-loadable
  device trace of everything inside the block is written there.  With no
  directory it is a zero-cost no-op.
* ``StageTimer`` — wall-clock accounting of named pipeline stages
  (volumes/sec is the framework's north-star metric); accumulates across
  ``time(name)`` blocks, reports totals and writes a JSON summary.
"""

from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from contextlib import contextmanager
from pathlib import Path
from typing import Optional


@contextmanager
def maybe_profile(profile_dir: Optional[str] = None):
    """jax.profiler.trace around the block when a directory is configured."""
    profile_dir = profile_dir or os.environ.get("LIGHT_UNET_PROFILE")
    if not profile_dir:
        yield None
        return
    import jax

    Path(profile_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(profile_dir)):
        yield profile_dir
    print(f"Profiler trace written to {profile_dir} (open with TensorBoard)")


class StageTimer:
    """Accumulating wall-clock timers for named stages."""

    def __init__(self):
        self._totals: "OrderedDict[str, float]" = OrderedDict()
        self._counts: "OrderedDict[str, int]" = OrderedDict()

    @contextmanager
    def time(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self._totals[name] = self._totals.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_seconds": round(total, 4),
                "calls": self._counts[name],
                "seconds_per_call": round(total / max(self._counts[name], 1), 4),
            }
            for name, total in self._totals.items()
        }

    def report(self, prefix: str = "") -> None:
        for name, row in self.summary().items():
            print(
                f"{prefix}{name}: {row['total_seconds']:.2f}s total, "
                f"{row['calls']} calls, {row['seconds_per_call']:.3f}s/call"
            )

    def save(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
