"""Joint HBM budget accounting (VERDICT r3 #5).

Round 3 budgeted each HBM-resident feature independently — training corpus
(``tpu.device_corpus_budget_gb``), validation inputs
(``tpu.device_val_budget_gb``) — while GT id maps, their bucket-padded
variants, and params/optimizer state were unaccounted; nothing asserted the
SUM fits one chip's HBM, so a larger cohort could oversubscribe silently
(hard OOM instead of graceful fallback).

``HbmLedger`` is the single accounting point.  Priority order (who degrades
first, from the trainer's integration):

1. params + optimizer state — charged unconditionally (training is
   impossible without them),
2. the training corpus — capped at the ledger remainder, so it shrinks (or
   falls back to host streaming) before anything OOMs,
3. validation GT id maps + padded variants — ``try_charge``d per case,
4. validation input cache — ``try_charge``d per case, i.e. the val budget
   shrinks BEFORE the corpus is refused (the corpus was charged first).

A ``reserve_frac`` slice of the capacity is held back for transients the
ledger cannot see per-allocation: activations/workspace of the compiled
programs, the sliding-window scatter buffers, and XLA's own scratch.

Capacity detection: ``device.memory_stats()['bytes_limit']`` where the
runtime reports it; the ``LIGHT_UNET_HBM_GB`` env var overrides (also the
test hook); otherwise a 16 GiB single-chip default (v5e-class HBM).  The
reference has no counterpart (single CUDA device, torch's caching allocator
OOMs at use time — SURVEY §2c).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Optional

_DEFAULT_CAPACITY_GB = 16.0  # v5e-class single-chip HBM


def detect_hbm_capacity_bytes() -> int:
    """Per-chip HBM capacity: env override > runtime-reported > default."""
    env = os.environ.get("LIGHT_UNET_HBM_GB")
    if env:
        return int(float(env) * (1 << 30))
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if limit:
                return int(limit)
    except Exception:  # noqa: BLE001 - backend may not support memory_stats
        pass
    return int(_DEFAULT_CAPACITY_GB * (1 << 30))


class HbmLedger:
    """Tracks named per-chip HBM reservations against a joint capacity."""

    def __init__(self, capacity_bytes: Optional[int] = None, reserve_frac: float = 0.15):
        self.capacity = int(capacity_bytes if capacity_bytes is not None
                            else detect_hbm_capacity_bytes())
        self.reserve = int(self.capacity * float(reserve_frac))
        self.entries: "OrderedDict[str, int]" = OrderedDict()
        self.denied: "OrderedDict[str, int]" = OrderedDict()  # name -> bytes refused

    # -- accounting --------------------------------------------------------
    def used(self) -> int:
        return sum(self.entries.values())

    def remaining(self) -> int:
        return max(0, self.capacity - self.reserve - self.used())

    def remaining_gb(self) -> float:
        return self.remaining() / (1 << 30)

    def charge(self, name: str, nbytes: int) -> None:
        """Unconditional reservation (e.g. params: training cannot proceed
        without them; an overshoot still shows up in the summary)."""
        self.entries[name] = self.entries.get(name, 0) + int(nbytes)

    def try_charge(self, name: str, nbytes: int) -> bool:
        """Reserve only if it fits the remainder; refusals are recorded so
        the summary shows WHAT degraded, not just that something did."""
        nbytes = int(nbytes)
        if nbytes <= self.remaining():
            self.charge(name, nbytes)
            return True
        self.denied[name] = self.denied.get(name, 0) + nbytes
        return False

    def release(self, name: str) -> None:
        self.entries.pop(name, None)

    # -- reporting ----------------------------------------------------------
    def summary(self) -> str:
        gb = 1 << 30
        parts = [f"{k}={v / gb:.2f}" for k, v in self.entries.items()]
        line = (
            f"HBM ledger [GB]: capacity={self.capacity / gb:.2f} "
            f"reserve={self.reserve / gb:.2f} used={self.used() / gb:.2f} "
            f"remaining={self.remaining() / gb:.2f}"
        )
        if parts:
            line += " | " + " ".join(parts)
        if self.denied:
            line += " | degraded: " + " ".join(
                f"{k}(-{v / gb:.2f})" for k, v in self.denied.items()
            )
        return line

    def log(self) -> None:
        print(self.summary())


def tree_nbytes(tree) -> int:
    """Total bytes of a pytree of arrays (params / optimizer state)."""
    import jax

    return sum(
        int(getattr(leaf, "nbytes", 0)) for leaf in jax.tree_util.tree_leaves(tree)
    )
