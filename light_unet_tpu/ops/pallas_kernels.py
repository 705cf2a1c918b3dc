"""Fused Pallas TPU kernels for the model's hot elementwise/normalization ops.

The reference runs InstanceNorm3d + LeakyReLU after every conv
(``light_unet/models/unet3d.py:51-52``) through cuDNN/ATen kernels; the
XLA lowering of the same computation reads the activation twice from HBM
(one pass for the mean/variance reduction, one to normalize).  The fused
kernel below does the whole thing in ONE HBM read + one write by keeping a
sample's activation resident in VMEM:

    y = leaky_relu((x - mean_c) * rsqrt(var_c + eps) * scale_c + bias_c)

with per-(sample, channel) biased statistics over the spatial volume —
exactly torch ``InstanceNorm3d(C, affine=True)`` semantics.

Design notes (see pallas guide):

* Layout: an NDHWC activation ``[B, D, H, W, C]`` is viewed (free, row-major
  bitcast) as ``[B, D*H, W*C]``.  For every level of the 217K-param U-Net
  the lane dimension ``W*C`` is exactly 768 = 6x128 (48x16, 24x32, 12x64),
  so the VPU runs fully packed with no Mosaic lane padding.
* The block (one sample) stays in its input dtype in VMEM; statistics and
  normalization run over small ``chunk x WC`` f32 slices inside
  ``fori_loop``s, so f32 temporaries never materialize at full block size.
* Per-channel sums fold out of per-(w,c)-lane sums with a tiny one-hot
  matmul on the MXU (Mosaic requires 2-D x 2-D dots).

The kernel is inference-path only (no custom VJP); the training step keeps
the jnp implementation.  ``fused_instance_norm_leaky_relu`` transparently
falls back to jnp when the layout contract doesn't hold (e.g. the 6x6x6x128
bottleneck level, whose D*H=36 isn't sublane-aligned — it is also tiny, so
the fallback costs nothing).

Measured verdict (TPU v5e, full 217K-param forward on 96x48^3x1 bf16,
synced timing): jnp/XLA 59 ms vs this kernel 76 ms.  The 3.5 MB per-sample
blocks leave no VMEM headroom for double-buffered grid DMA, so the saved
HBM read is lost to serialization — XLA's two fused passes pipeline better.
The kernel therefore ships correct and tested but OFF by default
(``tpu.use_pallas``); it becomes profitable only on hardware/generations
where the VMEM budget fits two blocks in flight.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# one sample's activation must fit VMEM twice (input block + output block)
_VMEM_BLOCK_BUDGET_BYTES = 12 * 1024 * 1024


def _pick_chunk(dh: int) -> int:
    for c in (256, 128, 64, 32, 16, 8):
        if dh % c == 0:
            return c
    return 0


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, channels: int, eps: float,
            slope: float, chunk: int):
    dh, wc = x_ref.shape[1], x_ref.shape[2]
    n_chunks = dh // chunk
    n_spatial = dh * (wc // channels)

    def accum(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (
            s1 + jnp.sum(xc, axis=0, keepdims=True),
            s2 + jnp.sum(xc * xc, axis=0, keepdims=True),
        )

    zeros = jnp.zeros((1, wc), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_chunks, accum, (zeros, zeros))

    # fold W out of the (w, c) lane sums with one-hot matmuls on the MXU
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (wc, channels), 0) % channels
    chan = jax.lax.broadcasted_iota(jnp.int32, (wc, channels), 1)
    onehot = (lane_c == chan).astype(jnp.float32)  # [WC, C]

    sums = jnp.dot(
        jnp.concatenate([s1, s2], axis=0), onehot,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [2, C]
    mean_c = sums[0:1] / n_spatial  # [1, C]
    var_c = jnp.maximum(sums[1:2] / n_spatial - mean_c * mean_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)

    # broadcast per-channel stats back to the WC lanes: [2, C] @ [C, WC]
    back = jnp.dot(
        jnp.concatenate([mean_c, rstd_c], axis=0),
        onehot.T,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [2, WC]
    mean_l = back[0:1]
    a_l = back[1:2] * scale_ref[:]  # rstd * scale, per lane
    b_l = bias_ref[:] - mean_l * a_l  # y = x * a + b

    def norm(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * a_l + b_l
        y = jnp.where(y > 0, y, slope * y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm, 0)


@partial(jax.jit, static_argnames=("channels", "eps", "slope", "chunk"))
def _fused_in_leaky_pallas(x3, scale_l, bias_l, *, channels: int, eps: float,
                           slope: float, chunk: int):
    b, dh, wc = x3.shape
    return pl.pallas_call(
        partial(_kernel, channels=channels, eps=eps, slope=slope, chunk=chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, dh, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dh, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dh, wc), x3.dtype),
    )(x3, scale_l, bias_l)


def pallas_layout_ok(shape, dtype) -> bool:
    """True when ``[B, D, H, W, C]`` satisfies the kernel's layout contract
    (and we are actually on a TPU — on CPU the jnp path is the lowering)."""
    if jax.default_backend() != "tpu":
        return False
    if len(shape) != 5:
        return False
    _, d, h, w, c = shape
    wc = w * c
    if wc % LANE != 0 or _pick_chunk(d * h) == 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return 2 * itemsize * d * h * wc <= _VMEM_BLOCK_BUDGET_BYTES


def fused_instance_norm_leaky_relu(
    x, scale, bias, *, eps: float = 1e-5, negative_slope: float = 0.01
):
    """InstanceNorm3d(affine) + LeakyReLU over ``[B, D, H, W, C]`` in one pass.

    Falls back to the plain jnp implementation when the layout contract
    doesn't hold (see module docstring).
    """
    b, d, h, w, c = x.shape
    if pallas_layout_ok(x.shape, x.dtype):
        wc = w * c
        x3 = x.reshape(b, d * h, wc)  # free: row-major NDHWC bitcast
        scale_l = jnp.tile(scale.astype(jnp.float32), w).reshape(1, wc)
        bias_l = jnp.tile(bias.astype(jnp.float32), w).reshape(1, wc)
        y = _fused_in_leaky_pallas(
            x3, scale_l, bias_l, channels=c, eps=float(eps),
            slope=float(negative_slope), chunk=_pick_chunk(d * h),
        )
        return y.reshape(b, d, h, w, c)
    return reference_instance_norm_leaky_relu(
        x, scale, bias, eps=eps, negative_slope=negative_slope
    )


def reference_instance_norm_leaky_relu(x, scale, bias, *, eps=1e-5, negative_slope=0.01):
    """Plain jnp version (the training path / numerical oracle for tests)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.where(y > 0, y, negative_slope * y).astype(x.dtype)


def _self_test():  # pragma: no cover - manual smoke entry
    import time

    rng = np.random.default_rng(0)
    for (d, h, w, c) in [(48, 48, 48, 16), (24, 24, 24, 32), (12, 12, 12, 64), (6, 6, 6, 128)]:
        used = pallas_layout_ok((2, d, h, w, c), jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, d, h, w, c)).astype(np.float32)) * 3 + 1
        s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        bvec = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        got = fused_instance_norm_leaky_relu(x, s, bvec)
        want = reference_instance_norm_leaky_relu(x, s, bvec)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"{d}x{h}x{w}x{c} (pallas={used}): max|err| = {err:.2e}")
        assert err < 1e-4, err

    # timing at the model's hot level, bf16 like the inference path
    xb = (jnp.asarray(rng.standard_normal((96, 48, 48, 48, 16)).astype(np.float32))
          .astype(jnp.bfloat16))
    s = jnp.ones((16,), jnp.float32)
    z = jnp.zeros((16,), jnp.float32)
    for name, f in [("pallas", fused_instance_norm_leaky_relu),
                    ("jnp", reference_instance_norm_leaky_relu)]:
        g = jax.jit(lambda x: f(x, s, z))
        g(xb).block_until_ready()
        ts = []
        for _ in range(10):
            t0 = time.time(); g(xb).block_until_ready(); ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms on 96x48^3x16 bf16")


if __name__ == "__main__":  # pragma: no cover
    _self_test()
