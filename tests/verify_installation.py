#!/usr/bin/env python
"""Environment smoke test (parity with the reference's
``tests/verify_installation/verify_installation.py``): python version,
dependency imports, device probe, config load, model instantiation +
48^3 forward, loss smoke — as a runnable script with a summary table.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

RESULTS = []


def check(name):
    def deco(fn):
        def wrapper():
            t0 = time.time()
            try:
                detail = fn() or ""
                RESULTS.append((name, True, f"{detail} ({time.time() - t0:.1f}s)"))
            except Exception as e:  # noqa: BLE001
                RESULTS.append((name, False, f"{type(e).__name__}: {e}"))

        return wrapper

    return deco


@check("python >= 3.10")
def check_python():
    assert sys.version_info >= (3, 10), sys.version
    return sys.version.split()[0]


@check("dependencies import")
def check_imports():
    import flax, jax, numpy, optax, pandas, scipy, yaml  # noqa: F401
    from tensorboardX import SummaryWriter  # noqa: F401

    return f"jax {jax.__version__}, flax {flax.__version__}"


@check("jax devices")
def check_devices():
    import jax

    devs = jax.devices()
    assert devs
    return f"{len(devs)}x {devs[0].platform}"


@check("config load + validate")
def check_config():
    from light_unet_tpu.config import Config

    path = REPO_ROOT / "configs" / "unet_fl70.yaml"
    cfg = Config.load(path) if path.exists() else Config()
    assert cfg.training.epochs > 0
    return f"seed {cfg.experiment.seed}"


@check("model 48^3 forward, 217,228 params")
def check_model():
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.models.unet3d import Lightweight3DUNet, count_parameters, init_params

    model = Lightweight3DUNet()
    params = init_params(model, jax.random.PRNGKey(0), (48, 48, 48))
    counts = count_parameters(params)
    assert counts["total"] == 217228, counts
    y = model.apply(params, jnp.zeros((1, 48, 48, 48, 1)))
    assert y.shape == (1, 48, 48, 48, 1)
    return "forward OK"


@check("focal tversky loss")
def check_loss():
    import jax
    import jax.numpy as jnp

    from light_unet_tpu.models.losses import focal_tversky_loss

    pred = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    target = (jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 16, 1)) > 0.8).astype(
        jnp.float32
    )
    loss = float(focal_tversky_loss(pred, target))
    assert 0.0 <= loss <= 1.0
    grad = jax.grad(lambda p: focal_tversky_loss(p, target))(pred)
    assert bool(jnp.isfinite(grad).all())
    return f"loss {loss:.4f}, grads finite"


@check("nifti codec round trip")
def check_nifti():
    import tempfile

    import numpy as np

    from light_unet_tpu.utils import nifti

    data = np.random.default_rng(0).random((8, 9, 10)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "x.nii.gz"
        nifti.save(nifti.Nifti1Image(data, np.diag([4.0, 4.0, 4.0, 1.0])), p)
        img = nifti.load(p)
        assert np.array_equal(np.asarray(img.dataobj), data)
        assert img.header.get_zooms() == (4.0, 4.0, 4.0)
    return "ok"


def main() -> int:
    for fn in (check_python, check_imports, check_devices, check_config,
               check_model, check_loss, check_nifti):
        fn()
    width = max(len(n) for n, _, _ in RESULTS)
    print("\n" + "=" * 70)
    print("INSTALLATION VERIFICATION")
    print("=" * 70)
    ok = True
    for name, passed, detail in RESULTS:
        mark = "PASS" if passed else "FAIL"
        ok &= passed
        print(f"  [{mark}] {name:<{width}}  {detail}")
    print("=" * 70)
    print("ALL CHECKS PASSED" if ok else "SOME CHECKS FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
