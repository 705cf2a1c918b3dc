"""Torch-checkpoint interop: port reference ``.pth`` weights to flax params.

The reference trains ``Lightweight3DUNet`` in torch and serves it from
``best_model.pth`` whose ``model_state_dict`` the reference ``Inferencer``
consumes (``light_unet/core/inferencer.py:47-50``).  This module lets a user
with a reference-trained model migrate: it maps the torch ``state_dict``
(NCDHW kernels, module-path keys) onto this framework's flax parameter tree
(NDHWC kernels), and back.

Layout conventions (worked out + golden-tested in
``tests/unit/test_model.py:82-120``):

* conv weight       torch ``[out, in/groups, kd, kh, kw]``  ->  flax
  ``[kd, kh, kw, in/groups, out]`` (transpose ``(2,3,4,1,0)``);
* transposed-conv   torch ``[in, out, kd, kh, kw]``         ->  flax
  ``[kd, kh, kw, in, out]`` **spatially flipped** (flax stores the
  gradient-of-conv kernel);
* InstanceNorm      ``weight``/``bias``  ->  ``scale``/``bias`` verbatim.

Name mapping: flax module names were chosen to mirror the reference's
(``init_conv``, ``down1.res_block``, ``up1.up`` ...), so a flax tree path
maps to a torch key by joining path segments with ``.`` plus three local
rewrites: ``norm*.scale -> norm*.weight``, ``shortcut_conv/shortcut_norm ->
shortcut.0/shortcut.1`` (torch uses an anonymous ``nn.Sequential``,
``light_unet/models/unet3d.py:70-73``), and grouped convs which torch wraps
in a ``GroupedConv3d`` module (``.conv1.conv.weight``,
``light_unet/models/unet3d.py:26-34``).

No torch import is required at module import time; ``torch`` is loaded
lazily only for reading ``.pth`` files.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "torch_to_flax",
    "flax_to_torch",
    "load_torch_checkpoint",
    "is_torch_checkpoint",
]


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out: Dict[Tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def _conv_t2f(w: np.ndarray) -> np.ndarray:
    """torch conv [O, I/g, kd, kh, kw] -> flax [kd, kh, kw, I/g, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv_f2t(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (4, 3, 0, 1, 2)))


def _convT_t2f(w: np.ndarray) -> np.ndarray:
    """torch convT [I, O, kd, kh, kw] -> flax [kd, kh, kw, I, O], flipped."""
    k = np.transpose(w, (2, 3, 4, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1, ::-1])


def _convT_f2t(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k[::-1, ::-1, ::-1], (3, 4, 0, 1, 2)))


def _map_leaf(path: Tuple[str, ...]) -> Tuple[List[str], str]:
    """Flax tree path (without the leading "params") -> (candidate torch
    keys, transform tag in {conv, convT, direct})."""
    *mods, leaf = path
    prefix = ".".join(mods)

    last = mods[-1] if mods else ""
    parent = mods[-2] if len(mods) >= 2 else ""

    if leaf == "kernel":
        if last in ("depthwise", "pointwise"):
            # torch DepthwiseSeparableConv3d submodules share these names
            return [f"{prefix}.weight"], "conv"
        if last == "up":
            return [f"{prefix}.weight"], "convT"
        if last == "shortcut_conv":
            base = ".".join(mods[:-1])
            return [f"{base}.shortcut.0.weight"], "conv"
        if last in ("conv1", "conv2") or last == "out_conv":
            # plain nn.Conv3d keys as {prefix}.weight; GroupedConv3d wraps
            # the conv in a submodule -> {prefix}.conv.weight
            return [f"{prefix}.weight", f"{prefix}.conv.weight"], "conv"
        return [f"{prefix}.weight"], "conv"

    if leaf == "scale":
        if last == "shortcut_norm":
            base = ".".join(mods[:-1])
            return [f"{base}.shortcut.1.weight"], "direct"
        return [f"{prefix}.weight"], "direct"

    if leaf == "bias":
        if last == "shortcut_norm":
            base = ".".join(mods[:-1])
            return [f"{base}.shortcut.1.bias"], "direct"
        return [f"{prefix}.bias"], "direct"

    raise KeyError(f"unrecognized flax leaf {'/'.join(path)}")


_T2F = {"conv": _conv_t2f, "convT": _convT_t2f, "direct": lambda w: w}
_F2T = {"conv": _conv_f2t, "convT": _convT_f2t, "direct": lambda w: w}


def _as_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def torch_to_flax(state_dict: Dict[str, Any], flax_template: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference torch ``state_dict`` onto the flax params pytree.

    ``flax_template`` is ``model.init(...)``'s output (``{"params": ...}``,
    possibly further wrapped, or the inner dict); it supplies the tree
    structure and expected shapes.  The result mirrors the template's exact
    nesting.  Every template leaf must be matched, and every state_dict entry
    must be consumed — a mismatch raises with the offending keys.
    """
    # strip any number of {"params": ...} wrappers; re-wrap at the end
    inner = flax_template
    depth = 0
    while isinstance(inner, dict) and set(inner) == {"params"}:
        inner = inner["params"]
        depth += 1
    flat = _flatten(inner)
    sd = {k: _as_numpy(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}

    used = set()
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for path, tmpl in flat.items():
        candidates, tag = _map_leaf(path)
        key = next((c for c in candidates if c in sd), None)
        if key is None:
            raise KeyError(
                f"torch state_dict has no entry for flax param "
                f"{'/'.join(path)} (tried {candidates})"
            )
        w = _T2F[tag](sd[key]).astype(np.asarray(tmpl).dtype)
        if w.shape != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch porting {key} -> {'/'.join(path)}: "
                f"{w.shape} vs template {np.shape(tmpl)}"
            )
        out[path] = w
        used.add(key)

    leftover = set(sd) - used
    if leftover:
        raise KeyError(f"unconsumed torch state_dict entries: {sorted(leftover)}")
    ported: Dict[str, Any] = _unflatten(out)
    for _ in range(depth):
        ported = {"params": ported}
    return ported


def flax_to_torch(flax_params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse port: flax params -> reference-layout state_dict (numpy
    values; wrap with ``torch.from_numpy`` to load into the torch model)."""
    inner = flax_params.get("params", flax_params)
    out: Dict[str, np.ndarray] = {}
    for path, leaf in _flatten(inner).items():
        candidates, tag = _map_leaf(path)
        # first candidate is the canonical torch name; grouped-conv wrapping
        # (.conv.weight) only applies when the torch model used GroupedConv3d,
        # which the caller's model config determines — default plain name.
        out[candidates[0]] = _F2T[tag](np.asarray(leaf))
    return out


def is_torch_checkpoint(path) -> bool:
    """Cheap sniff: torch>=1.6 zip archives start with ``PK``; legacy
    torch pickles with protocol-2 magic ``\\x80\\x02``."""
    try:
        with open(path, "rb") as f:
            head = f.read(2)
    except OSError:
        return False
    return head in (b"PK", b"\x80\x02")


def load_torch_checkpoint(
    path, flax_template: Optional[Dict[str, Any]] = None,
    allow_pickle: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a reference ``.pth`` checkpoint -> ``(arrays, meta)`` in this
    framework's checkpoint contract (``core/checkpoint.py``).

    ``arrays`` mirrors the given template's structure when one is provided
    (or is a raw ``{"torch_state_dict": ...}`` passthrough otherwise);
    ``meta`` keeps the reference's scalar fields
    (epoch/best_metric/best_recall/..., ``light_unet/core/trainer.py:447-459``).

    Loads with ``weights_only=True`` — reference checkpoints are plain tensor
    state_dicts plus scalar/history fields, which the safe loader accepts,
    and ``core/checkpoint.py`` auto-routes ANY non-native file here, so the
    unrestricted unpickler would make an untrusted ``.pth`` path remote code
    execution.  ``allow_pickle=True`` is an explicit opt-in for legacy
    pickles the safe loader rejects (trusted files only).
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError subclass varies by version
        if not allow_pickle:
            raise ValueError(
                f"{path}: torch safe loader (weights_only=True) rejected this "
                f"checkpoint ({e}). If the file is TRUSTED and uses legacy "
                f"pickle objects, re-load with allow_pickle=True."
            ) from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        state_dict = ckpt["model_state_dict"]
    elif isinstance(ckpt, dict) and all(hasattr(v, "shape") for v in ckpt.values()):
        state_dict, ckpt = ckpt, {}
    else:
        raise ValueError(f"{path}: not a reference checkpoint (no model_state_dict)")

    meta = {
        k: v
        for k, v in ckpt.items()
        if k in ("epoch", "best_metric", "best_recall", "best_dsc", "best_epoch", "history")
        and _jsonable(v)
    }
    meta["source_format"] = "torch"
    if flax_template is not None:
        arrays = torch_to_flax(state_dict, flax_template)
    else:
        arrays = {"torch_state_dict": {k: _as_numpy(v) for k, v in state_dict.items()}}
    return arrays, meta


def _jsonable(v) -> bool:
    import json

    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False
