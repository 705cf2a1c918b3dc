"""Decode-once volume cache.

The reference reloads and re-gunzips both NIfTI volumes from disk for EVERY
training item (``light_unet/datasets/patch_dataset.py:127-128``) and hides
the cost behind 16 DataLoader worker processes.  Here volumes are decoded
once and kept as float32 numpy arrays (a full FL training split is ~2-3 GB),
so patch extraction is a pure memory slice and the host never becomes the
bottleneck for the TPU.  An LRU bound is available for larger-than-RAM
datasets.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional

import numpy as np

from light_unet_tpu.utils import fastio


class VolumeCache:
    """Thread-safe LRU cache: path -> float32 ndarray (decoded NIfTI)."""

    def __init__(self, max_items: Optional[int] = None):
        self.max_items = max_items
        self._store: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, path: str, dtype=np.float32) -> np.ndarray:
        with self._lock:
            if path in self._store:
                self._store.move_to_end(path)
                return self._store[path]
        data, _ = fastio.load_f32(path)  # native decode; python-codec fallback
        if dtype != np.float32:
            data = data.astype(dtype)
        with self._lock:
            self._store[path] = data
            self._store.move_to_end(path)
            if self.max_items is not None:
                while len(self._store) > self.max_items:
                    self._store.popitem(last=False)
        return data

    def clear(self) -> None:
        with self._lock:
            self._store.clear()

    def __len__(self) -> int:
        return len(self._store)
