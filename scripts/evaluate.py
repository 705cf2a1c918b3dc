#!/usr/bin/env python
"""Drop-in stage entrypoint (reference users run `python scripts/evaluate.py`;
see scripts/evaluate.py in the reference).  Thin shim over the in-process CLI:
equivalent to `python main.py --mode evaluate ...` with the same flags."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from light_unet_tpu.cli import run

if __name__ == "__main__":
    sys.exit(run(["--mode", "evaluate", *sys.argv[1:]]))
