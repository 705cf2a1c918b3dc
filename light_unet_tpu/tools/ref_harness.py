"""Run the REFERENCE pipeline's own code for artifact-level A/B parity.

The composed-model golden tests (``tests/unit/test_port_torch.py``) prove
the flax forward matches the reference torch network at identical weights.
This module closes the remaining gap: it imports the reference's OWN
``Inferencer.infer_case`` (``light_unet/core/inferencer.py:113-183``) and
``scripts/evaluate.py`` (``:23-161``) so a test can run both frameworks on
the same cases with the same ported weights and diff the ARTIFACTS —
probability maps, ``{id}_bboxes.json``, metrics rows — catching any
divergence hiding between the model and the artifact contract (Gaussian
edge blending, bbox expansion clamping, CSV column semantics).

What it provides:

* a **nibabel shim** backed by this repo's own NIfTI codec
  (``utils/nifti.py`` exposes the same ``load/save/Nifti1Image`` surface the
  reference uses) — the environment does not ship nibabel;
* the ``light_unet.metrics`` **import fix**: the reference's
  ``scripts/evaluate.py:19`` imports a module that does not exist (the real
  one is ``light_unet.models.metrics`` — a documented reference defect,
  SURVEY §3.4); the alias is installed in ``sys.modules`` so the script
  runs unmodified;
* a collision-free loader for the reference's ``scripts/evaluate.py``
  (this repo has its own ``scripts/`` directory).

Nothing under ``/root/reference`` is modified or executed at import time;
all reference code runs read-only against caller-provided temp dirs.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

DEFAULT_REF_ROOT = Path("/root/reference")


def reference_available(ref_root: Path = DEFAULT_REF_ROOT) -> bool:
    return (ref_root / "light_unet" / "core" / "inferencer.py").exists()


def install_nibabel_shim() -> types.ModuleType:
    """Register a minimal ``nibabel`` module backed by ``utils/nifti.py``.

    The reference uses exactly: ``nib.load(path)`` -> object with
    ``get_fdata()/affine/header`` (header with ``get_zooms()``),
    ``nib.Nifti1Image(data, affine, header)``, and ``nib.save(img, path)``
    — all of which our codec provides natively.  No-op if real nibabel is
    importable.
    """
    if "nibabel" in sys.modules:
        return sys.modules["nibabel"]
    if importlib.util.find_spec("nibabel") is not None:
        return importlib.import_module("nibabel")

    from light_unet_tpu.utils import nifti

    shim = types.ModuleType("nibabel")
    shim.load = nifti.load
    shim.save = nifti.save
    shim.Nifti1Image = nifti.Nifti1Image
    shim.Nifti1Header = nifti.Nifti1Header
    shim.__version__ = "0.0-light_unet_tpu-shim"
    sys.modules["nibabel"] = shim
    return shim


def load_reference(ref_root: Path = DEFAULT_REF_ROOT):
    """Import the reference package and return a namespace with its
    ``Inferencer`` class and ``evaluate`` module (import fixed).

    Raises ImportError when the reference tree is absent — callers (tests)
    should skip in that case.
    """
    ref_root = Path(ref_root)
    if not reference_available(ref_root):
        raise ImportError(f"reference tree not found at {ref_root}")
    install_nibabel_shim()
    if str(ref_root) not in sys.path:
        sys.path.insert(0, str(ref_root))

    inferencer_mod = importlib.import_module("light_unet.core.inferencer")

    # reference defect fix (evaluate.py:19): alias the real metrics module
    # under the name the script imports
    if "light_unet.metrics" not in sys.modules:
        sys.modules["light_unet.metrics"] = importlib.import_module(
            "light_unet.models.metrics"
        )

    eval_path = ref_root / "scripts" / "evaluate.py"
    spec = importlib.util.spec_from_file_location("ref_evaluate", eval_path)
    evaluate_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(evaluate_mod)

    ns = types.SimpleNamespace(
        Inferencer=inferencer_mod.Inferencer,
        inferencer_module=inferencer_mod,
        evaluate=evaluate_mod,
        unet3d=importlib.import_module("light_unet.models.unet3d"),
        metrics=sys.modules["light_unet.metrics"],
        root=ref_root,
    )
    return ns
