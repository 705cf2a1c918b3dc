"""Block-sparse D2H fetch of probability maps.

A body-masked probability map is EXACTLY zero outside the (dilated) body
mask — typically 55-70% of a whole-body volume (and 100% of the compile
bucket's Z padding).  Fetching the dense map over the tunneled TPU link
costs ~0.65 s per 12 MB uint16 volume and is the serving pipeline's
largest single phase, so instead of shipping the zeros the device packs
the map into occupied blocks and only those cross the link:

* the map is viewed as ``block``^3 tiles (one bandwidth pass on device);
* occupied tiles (any voxel != 0) are enumerated with a capacity-capped
  sized ``nonzero`` — the same exact-overflow pattern as the component
  extractor (``ops/components.py``) — and gathered into a ``[cap, block^3]``
  array;
* D2H moves ``count + indices + blocks``; the host scatters the tiles back.

The reconstruction is BIT-IDENTICAL to fetching the dense array (the same
values land in the same places; untouched voxels are the zeros they were),
and when more than ``cap`` tiles are occupied the overflow is detected
exactly and the caller falls back to fetching the dense map, which never
left the device.  There is no approximation anywhere in this path.

Reference counterpart: none — the reference saves prob maps straight from
local GPU memory (``light_unet/core/inferencer.py:164-165``); this exists
because the TPU serving link is the bottleneck (docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import numpy as np


class SparsePack(NamedTuple):
    """Block-sparse dispatch result: ``dense`` stays on device (fetched only
    on capacity overflow); the fetch reads ``count`` (4 bytes), then moves a
    device-sliced ``idx[:b] / tiles[:b]`` prefix where ``b`` is ``count``
    rounded up to a geometric bucket — so link bytes track the volume's
    ACTUAL occupancy, not the static capacity."""

    dense: Any
    count: Any
    idx: Any
    tiles: Any
    cap: int
    block: int

    def link_arrays(self) -> tuple:
        """The arrays worth ``copy_to_host_async``-ing at dispatch time.

        Only ``count``: the tile payload is sliced to the occupancy bucket at
        fetch time, so prefetching the full [cap, block^3] array would put
        exactly the bytes we're avoiding back on the link."""
        return (self.count,)


def slice_bucket(n: int, cap: int) -> int:
    """Round ``n`` up to a 64-aligned geometric (~1.5x) bucket, capped at
    ``cap``.  Bucketing bounds the number of tiny slice-program variants
    (~14 for a 12k-tile grid) at <=25% transfer overhead; in practice one
    dataset hits 1-2 buckets."""
    b = 64
    while b < n:
        b = _ceil_div(b * 3 // 2, 64) * 64
    return min(b, cap)


_slice_jit = None  # built on first use; jit-cached per (shape, dtype, n)


def _slice_rows(tiles, idx, n: int):
    global _slice_jit
    if _slice_jit is None:
        import jax

        _slice_jit = jax.jit(lambda t, i, n: (t[:n], i[:n]), static_argnums=2)
    return _slice_jit(tiles, idx, n)


def fetch_maybe_sparse(out) -> np.ndarray:
    """Materialize a dispatch result (dense device array or SparsePack) on
    host — bit-identical either way (overflow falls back to the dense copy,
    which never left the device)."""
    if isinstance(out, SparsePack):
        n = int(out.count)
        if n > out.cap:
            return np.asarray(out.dense)  # exact overflow -> dense fallback
        b = slice_bucket(n, out.cap)
        tiles_b, idx_b = _slice_rows(out.tiles, out.idx, b)
        return unpack_blocks(
            np.asarray(idx_b), np.asarray(tiles_b), out.dense.shape, out.block
        )
    return np.asarray(out)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def block_grid(padded_shape: Sequence[int], block: int) -> Tuple[int, int, int]:
    """Tile counts per axis for a volume of ``padded_shape``."""
    return tuple(_ceil_div(int(s), block) for s in padded_shape)  # type: ignore[return-value]


def block_cap(padded_shape: Sequence[int], block: int, frac: float) -> int:
    """Static tile capacity: ``frac`` of the grid, rounded up to 64 tiles.

    ``frac`` should exceed the expected occupied fraction (body + dilation +
    tile-boundary overhang); overflow is detected exactly at fetch time and
    falls back to the dense copy, so a too-small cap costs speed, never
    correctness.
    """
    nb = int(np.prod(block_grid(padded_shape, block)))
    cap = _ceil_div(max(1, int(np.ceil(nb * float(frac)))), 64) * 64
    return min(cap, nb)


def pack_blocks(vol, block: int, cap: int):
    """Traceable: pack occupied ``block``^3 tiles of ``vol`` [D,H,W].

    Returns ``(count i32, idx [cap] i32, tiles [cap, block^3] vol.dtype)``;
    ``idx`` slots beyond ``count`` hold ``nb`` (the out-of-range sentinel)
    and their tiles are zero.  ``count`` may exceed ``cap`` — that is the
    exact overflow signal; ``idx``/``tiles`` are then truncated and must
    not be used.
    """
    import jax.numpy as jnp

    d, h, w = vol.shape
    nd, nh, nw = block_grid(vol.shape, block)
    pad = [(0, nd * block - d), (0, nh * block - h), (0, nw * block - w)]
    if any(p[1] for p in pad):
        vol = jnp.pad(vol, pad)  # zero pad -> padding tiles are never occupied
    nb = nd * nh * nw
    tiles = (
        vol.reshape(nd, block, nh, block, nw, block)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nb, block * block * block)
    )
    occupied = jnp.any(tiles != 0, axis=1)
    count = jnp.sum(occupied, dtype=jnp.int32)
    (idx,) = jnp.nonzero(occupied, size=cap, fill_value=nb)
    idx = idx.astype(jnp.int32)
    # sentinel row nb is all zeros -> fill slots gather a zero tile
    tiles_all = jnp.concatenate([tiles, jnp.zeros((1, tiles.shape[1]), tiles.dtype)])
    return count, idx, tiles_all[idx]


def unpack_blocks(
    idx: np.ndarray, tiles: np.ndarray, padded_shape: Sequence[int], block: int
) -> np.ndarray:
    """Host: scatter packed tiles back into a dense [padded_shape] volume.

    Exactly inverts ``pack_blocks`` (callers must have checked
    ``count <= cap`` first).
    """
    idx = np.asarray(idx)
    tiles = np.asarray(tiles)
    nd, nh, nw = block_grid(padded_shape, block)
    nb = nd * nh * nw
    flat = np.zeros((nb, block * block * block), tiles.dtype)
    valid = idx < nb
    flat[idx[valid]] = tiles[valid]
    vol = (
        flat.reshape(nd, nh, nw, block, block, block)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(nd * block, nh * block, nw * block)
    )
    return vol[: padded_shape[0], : padded_shape[1], : padded_shape[2]]
