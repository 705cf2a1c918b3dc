"""Multi-host (multi-process) mesh entry.

SURVEY §2c requires that the mesh abstraction not preclude multi-host
deployment: ``mesh_from_config`` builds from ``jax.devices()``, which spans
every process once the distributed runtime is initialized — so the single
entry point needed is calling ``jax.distributed.initialize`` BEFORE first
device use.  ``maybe_distributed_init`` is that entry, driven by the
``tpu:`` config section (``distributed`` / ``coordinator_address`` /
``num_processes`` / ``process_id``):

* **TPU pods**: every process runs the same program; the TPU runtime
  autodetects coordinator, process count and id, so ``distributed: true``
  alone suffices (one process per host, all chips of the pod slice appear
  in ``jax.devices()`` and DP batches shard over the global mesh).
* **CPU (tests / smoke)**: the three fields are set explicitly and the
  in-process XLA CPU client is wired with gloo TCP collectives, so
  cross-process collectives execute for real — the 2-process smoke test
  (``tests/integration/test_multihost.py``) compiles AND runs a global-mesh
  program this way.

Everything downstream is unchanged: processes run identical SPMD programs,
``shard_batch``'s ``device_put`` places each process's addressable shards,
and XLA's collectives ride ICI within a host / DCN across hosts.

The reference has no distributed path at all
(``/root/reference/light_unet/core/trainer.py:53`` — single device, no
torch.distributed anywhere).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def is_distributed_initialized() -> bool:
    from jax._src import distributed

    return distributed.global_state.client is not None


def maybe_distributed_init(tpu_cfg) -> bool:
    """Initialize the JAX distributed runtime if the config asks for it.

    Call before any device use (the CLI does, at stage entry).  Returns
    True when the process is part of a multi-process run.  Idempotent:
    repeated calls (or an already-initialized runtime, e.g. under pytest
    workers) are no-ops.
    """
    want = bool(getattr(tpu_cfg, "distributed", False)) or (
        getattr(tpu_cfg, "num_processes", None) or 0
    ) > 1
    if not want:
        return False
    if is_distributed_initialized():
        return True

    import jax

    # CPU backend: cross-process collectives need an implementation wired
    # into the client at creation time (TPU ships its own; this flag is
    # ignored there).  Must happen before first backend use.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jaxlibs without the option
        pass

    kwargs = {}
    if getattr(tpu_cfg, "coordinator_address", None):
        kwargs["coordinator_address"] = tpu_cfg.coordinator_address
    if getattr(tpu_cfg, "num_processes", None):
        kwargs["num_processes"] = int(tpu_cfg.num_processes)
    if getattr(tpu_cfg, "process_id", None) is not None:
        kwargs["process_id"] = int(tpu_cfg.process_id)
    # TPU pods autodetect all three when none are given
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True
