"""Device-mesh and sharding helpers (data parallelism over ICI).

The reference is strictly single-device (``light_unet/core/trainer.py:53``,
no torch.distributed anywhere — SURVEY §2c).  The TPU-native framework adds
one distributed axis that preserves behavior: **data parallelism** — batches
sharded along a 1-D ``data`` mesh axis, parameters replicated, gradient
reduction inserted by XLA as ICI collectives (the scaling-book recipe:
annotate shardings, let the compiler place psums).

The sliding-window patch axis uses the same mesh for inference fan-out.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data_axis: str = "data",
    devices: Optional[Sequence] = None,
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D mesh over all (or the given) devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if mesh_shape is not None:
        want = int(np.prod(mesh_shape))
        if want > devices.size:
            raise ValueError(
                f"mesh_shape {mesh_shape} needs {want} devices, have {devices.size}"
            )
        if want < devices.size:
            # a stale/typo'd mesh_shape silently running on a pod subset is a
            # debugging trap — make the subset loud (ADVICE r3)
            import warnings

            warnings.warn(
                f"mesh_shape {tuple(mesh_shape)} uses only {want} of "
                f"{devices.size} available devices ({devices.size - want} idle)",
                stacklevel=2,
            )
        devices = devices.ravel()[:want].reshape(tuple(mesh_shape))
        axis_names = tuple(f"axis{i}" if i > 0 else data_axis for i in range(devices.ndim))
        return Mesh(devices, axis_names)
    return Mesh(devices, (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard leading (batch) axis across the data axis; rest replicated."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh], data_axis: str = "data"):
    """device_put a (possibly nested) batch with the leading axis sharded."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(batch)
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_chain(chain, mesh: Optional[Mesh], data_axis: str = "data"):
    """device_put a [K, B, ...] K-step chain with the BATCH (second) axis
    sharded — the scan axis K stays replicated."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(chain)
    return jax.device_put(chain, NamedSharding(mesh, P(None, data_axis)))


def replicate(tree, mesh: Optional[Mesh]):
    """device_put a pytree fully replicated over the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def mesh_from_config(tpu_cfg, batch_size: Optional[int] = None) -> Optional[Mesh]:
    """Build the mesh described by ``TpuConfig`` (None for a single device).

    With ``batch_size`` given and ``tpu_cfg.batch_per_device`` off, the data
    axis is capped at the largest device count that divides the global batch
    (parameters are replicated, so using fewer devices is always safe) — and
    a loud warning is emitted when that drops devices, because at the
    reference's batch 2 an 8-chip pod would silently idle 6 chips.  With
    ``batch_per_device`` on, ``batch_size`` is per-device, the global batch
    is ``batch_size * n_devices``, and every device always carries a shard.
    """
    devices = jax.devices()
    if tpu_cfg.mesh_shape is not None:
        return create_mesh(tpu_cfg.data_axis, devices, tpu_cfg.mesh_shape)
    n = len(devices)
    if batch_size is not None and not getattr(tpu_cfg, "batch_per_device", False):
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n < len(devices):
            import warnings

            warnings.warn(
                f"global batch {batch_size} is not divisible by "
                f"{len(devices)} devices; using only {n} "
                f"({len(devices) - n} idle). Set tpu.batch_per_device: true "
                f"to scale the global batch to batch_size x n_devices "
                f"(remember to adjust the learning rate accordingly).",
                stacklevel=2,
            )
        devices = devices[:n]
    if n == 1:
        return None
    return create_mesh(tpu_cfg.data_axis, devices)


def effective_batch_size(tpu_cfg, batch_size: int, mesh: Optional[Mesh]) -> int:
    """Global batch: ``batch_size`` as-is, or ``batch_size * mesh size`` when
    ``tpu_cfg.batch_per_device`` is set (LR note: with N devices this is an
    N-fold larger global batch — scale the learning rate to taste)."""
    if mesh is not None and getattr(tpu_cfg, "batch_per_device", False):
        return int(batch_size) * int(np.prod(mesh.devices.shape))
    return int(batch_size)
