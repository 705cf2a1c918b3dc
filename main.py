#!/usr/bin/env python
"""Pipeline entry point (CLI parity with the reference's ``main.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from light_unet_tpu.cli import run

if __name__ == "__main__":
    sys.exit(run())
