"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before the first jax import anywhere in the test session.
"""

import os
import sys
from pathlib import Path

# The environment pins JAX_PLATFORMS to the tunneled TPU plugin and ignores
# env-var overrides; jax.config is the reliable way to force the CPU backend.
os.environ.pop("JAX_PLATFORMS", None)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual mesh for sharding tests
# CPU/TPU conv defaults to fast low-precision passes; tests verify numerics.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def reference_config_path():
    """Reference YAML (only used for schema-parity tests; skipped if absent)."""
    p = Path("/root/reference/configs/unet_fl70.yaml")
    if not p.exists():
        pytest.skip("reference configs not available")
    return p
