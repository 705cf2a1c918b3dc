"""Checkpoint save/restore with rotation and real resume.

Logical content parity with the reference checkpoint dict
(``light_unet/core/trainer.py:448-459``): epoch, model params, optimizer
state, scheduler state, best metrics, config, history.  Two deliberate
upgrades over the reference:

* **resume actually exists** — the reference initializes ``start_epoch=0``
  and never loads it back (``trainer.py:164``, SURVEY §5);
* single-file, framework-native format: flax msgpack for the array pytrees
  plus a JSON sidecar header in the same file — no pickle, byte-stable,
  loadable without reconstructing optimizer internals first.

The best model is written to the configured ``output.best_model_path``
verbatim (``models/best_model.pth`` by default) so downstream tooling finds
the same artifact name as the reference.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_MAGIC = b"LU3DTPU1"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, arrays: Dict[str, Any], meta: Dict[str, Any]) -> None:
    """Write ``arrays`` (pytree of ndarrays: params/opt_state) and JSON-able
    ``meta`` into one file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict flattens namedtuple-based optimizer states into dicts
    blob = serialization.msgpack_serialize(_to_host(serialization.to_state_dict(arrays)))
    header = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)


def load_checkpoint(path, arrays_template: Optional[Dict[str, Any]] = None) -> Tuple[Dict, Dict]:
    """Read back (arrays, meta).  With ``arrays_template`` the pytree is
    restored onto the template's structure/dtypes (flax from_state_dict);
    without it, raw nested dicts/lists are returned.

    Also accepts a reference-trained torch ``.pth`` checkpoint
    (``best_model.pth`` with a ``model_state_dict``,
    ``light_unet/core/trainer.py:447-459``) — weights are ported to the flax
    layout on the fly, so a user migrating from the reference can point the
    inferencer straight at their existing model file."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            from light_unet_tpu.tools.port_torch import (
                is_torch_checkpoint,
                load_torch_checkpoint,
            )

            if is_torch_checkpoint(path):
                return load_torch_checkpoint(path, arrays_template)
            raise ValueError(f"{path} is not a light_unet_tpu checkpoint")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    if arrays_template is not None:
        arrays = serialization.from_state_dict(arrays_template, raw)
    else:
        arrays = raw
    return arrays, meta


def _epoch_key(path: Path) -> Tuple[int, str]:
    """Numeric sort key: lexicographic glob order breaks past epoch 999
    (``checkpoint_epoch_1000`` sorts before ``..._999``)."""
    stem = path.stem
    try:
        return (int(stem.rsplit("_", 1)[1]), stem)
    except (IndexError, ValueError):
        return (-1, stem)


def rotate_checkpoints(checkpoint_dir, keep_last_n: int, pattern: str = "checkpoint_epoch_*.ckpt") -> None:
    """Delete all but the newest ``keep_last_n`` periodic checkpoints
    (reference ``_cleanup_checkpoints``, ``trainer.py:472-477``)."""
    checkpoint_dir = Path(checkpoint_dir)
    ckpts = sorted(checkpoint_dir.glob(pattern), key=_epoch_key)
    for old in ckpts[:-keep_last_n] if keep_last_n > 0 else ckpts:
        old.unlink()


def latest_checkpoint(checkpoint_dir, pattern: str = "checkpoint_epoch_*.ckpt") -> Optional[Path]:
    ckpts = sorted(Path(checkpoint_dir).glob(pattern), key=_epoch_key)
    return ckpts[-1] if ckpts else None
