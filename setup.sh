#!/usr/bin/env bash
# Environment setup for light_unet_tpu (parity with the reference's setup.sh:
# dependency check + standard directory tree). No venv/pip here — jax, flax,
# optax, scipy, pandas, tensorboardX are expected to be preinstalled
# (e.g. a TPU VM image).
set -euo pipefail

cd "$(dirname "$0")"

echo "== checking python dependencies =="
python - <<'EOF'
import importlib, sys
missing = []
for mod in ("jax", "flax", "optax", "numpy", "scipy", "yaml", "pandas", "tensorboardX"):
    try:
        importlib.import_module(mod)
    except ImportError:
        missing.append(mod)
if missing:
    sys.exit(f"missing dependencies: {', '.join(missing)}")
import jax
print(f"jax {jax.__version__}, devices: {jax.devices()}")
EOF

echo "== creating directory tree =="
mkdir -p data/raw/images data/raw/labels data/processed data/splits \
         models/checkpoints logs/tensorboard inference/prob_maps inference/bboxes

echo "== verifying installation =="
python tests/verify_installation.py

echo "Setup complete. Next: put NIfTI volumes under data/raw/{images,labels}/ and run:"
echo "  python main.py --mode all"
