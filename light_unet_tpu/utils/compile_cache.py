"""Persistent XLA compilation cache setup.

Cold-start XLA compilation of the full serving program set costs minutes
over the tunneled chip (254.8 s measured in ``BENCH_r02.json``); JAX ships a
persistent on-disk compilation cache that makes every later process reuse
the compiled executables.  The reference has no equivalent (torch eager).

Called once at process startup by the CLI (``cli.py``) and the benchmark
harness (``bench.py``); library users can call it themselves.  Idempotent.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str]) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``None``/empty disables (returns None).  ``~`` expands.  Returns the
    resolved directory on success.  The ``LIGHT_UNET_NO_COMPILE_CACHE`` env
    var force-disables (useful for measuring true cold-start compiles).
    """
    if not cache_dir or os.environ.get("LIGHT_UNET_NO_COMPILE_CACHE"):
        return None
    path = Path(cache_dir).expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:
        # stderr, never stdout: bench.py calls this before emitting its ONE
        # driver-parsed JSON line (ADVICE r3)
        import sys

        print(f"WARNING: cannot create compilation cache dir {path}: {e}", file=sys.stderr)
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache every compile that took noticeable time; the default threshold
    # (1 s) would skip the small bucketed program variants whose compiles
    # still add up over the tunnel
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(path)
