"""Fused residual-block Pallas TPU kernel (the SURVEY §2b open row).

The reference's hot op is the residual block
(``light_unet/models/unet3d.py:37-93``): conv→IN→LeakyReLU→conv→IN→+res→
LeakyReLU.  XLA's lowering materializes every intermediate in HBM — per
48³×16 sample roughly 13-15 full-activation HBM passes (conv reads/writes,
two-pass InstanceNorms, residual add).  The roofline
(``docs/PERFORMANCE.md``) pins the whole 96-patch forward bandwidth-bound
at 36% of its floor, so those passes ARE the remaining single-chip
headroom.

This kernel runs the ENTIRE block per sample with activations resident in
VMEM:

    HBM traffic: read x (1x with D-halo, +1x for the residual pass)
                 + write out (1x)
    vs XLA:      ~13-15 activation-sized passes

Design (see pallas guide):

* Lane-packed layout ``[D, H, W*C]``: every level of the 217K-param U-Net
  has W*C_out = 768 = 6x128 lanes (48x16, 24x32, 12x64, 6x128), so the VPU
  runs fully packed.  The 3x3x3 depthwise conv is 27 shifted FMAs on the
  VPU — shifts along H (sublanes) and W (lanes, by C) are static
  slice+concat with explicit zero edges (no roll/mask, interpret-safe);
  the D shift indexes slab planes.
* The pointwise 1x1x1 conv is a block-diagonal matmul on the MXU: in the
  (w, c) lane order the ``[W*Cin, W*C]`` matrix is nonzero only on
  aligned ``[ib, ob]`` diagonal tiles and every tile is the SAME
  ``kron(I, pw)`` matrix, so one small weight block serves all tiles.
* InstanceNorm statistics accumulate as per-lane (w,c) sums during the
  conv pass and fold to per-channel with a one-hot MXU matmul (the
  pattern validated by ``ops/pallas_kernels.py``); normalization folds to
  a per-lane ``y = x*a + b``.
* Per-sample VMEM: x slab (+halo, DMA'd from HBM), h [D,H,WC] (conv1 out,
  normalized in place), h2 [D,H,WC] (conv2 out), out staging slab —
  ≈ 11 MB worst case (up3: 48³, Cin=32).  x and out stay in HBM
  (memory_space ANY) with manual slab DMAs, so Mosaic never tries to
  double-buffer multi-MB blocks — the failure mode of the norm-only
  kernel (negative result #2 in docs/PERFORMANCE.md) was exactly that.
  Here each loaded byte feeds two convs + two norms, so DMA serialization
  is amortized ~15x deeper.

Numerics mirror the lax path's rounding points: conv accumulation in f32,
intermediates rounded to the compute dtype (bf16 in serving), statistics
in f32 from the rounded values, normalized outputs rounded before the
residual add.  Inference-only (no VJP) — the training step keeps the lax
path.  ``fused_block_supported`` gates layout; unsupported shapes fall
back to the lax implementation via the caller.

Reference parity: ``/root/reference/light_unet/models/unet3d.py:37-93``
(ResidualBlock), ``:12-23`` (DepthwiseSeparableConv3d).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
LEAKY_SLOPE = 0.01
IN_EPS = 1e-5
# per-sample VMEM budget for scratch + staging (v5e-conservative)
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024

_TAPS = [(kd, kh, kw) for kd in (-1, 0, 1) for kh in (-1, 0, 1) for kw in (-1, 0, 1)]


def _pad_h(h: int) -> int:
    """Sublane-pad H to a multiple of 8: Mosaic requires HBM<->VMEM DMA
    window extents along the second-minor (sublane) dim to be 8-aligned,
    so H=6/12 volumes ship with zero pad rows (masked in-kernel; the
    48^3/24^3 hot shapes are already aligned and take the unpadded path)."""
    return -(-h // 8) * 8


def _pick_sd(d: int) -> int:
    """Slab depth: largest divisor of D that is <= 8."""
    for sd in (8, 6, 4, 3, 2, 1):
        if d % sd == 0 and sd <= d:
            return sd
    return 1


def _pad_lanes(n: int) -> int:
    """Lane-pad to a multiple of 128: Mosaic DMA window extents along the
    minor (lane) dim must be 128-aligned, so the cin==1 init block's
    WCin=W lanes ship zero-padded (zero rows in the pointwise matrix
    nullify whatever the depthwise taps smear into the pad lanes)."""
    return -(-n // LANE) * LANE


def _pw_blocking(cin: int, c: int, wcin: int, wcout: int):
    """(ib, ob, n_blocks) for the block-diagonal pointwise matmul.

    ``ib * n_blocks`` is the PADDED input lane count the kernel's buffers
    use (== wcin except for cin==1, where it is wcin lane-padded to 128)."""
    if cin == 1:
        return _pad_lanes(wcin), wcout, 1
    ib = LANE if c >= cin else 2 * LANE
    ob = ib * c // cin
    return ib, ob, wcin // ib


def fused_block_supported(shape, cin: int, c: int, dtype) -> bool:
    """Layout contract: lane-packed WC multiples of 128 (or Cin==1), D
    slab-divisible, and the VMEM plan under budget."""
    if len(shape) != 5:
        return False
    _, d, h, w, _ = shape
    wcin, wcout = w * cin, w * c
    if wcout % LANE != 0 or c > wcout:
        return False
    if cin != 1 and wcin % LANE != 0:
        return False
    if cin != 1:
        ib, ob, nb = _pw_blocking(cin, c, wcin, wcout)
        if ib > wcin or wcin % ib != 0 or ob * nb != wcout:
            return False
    sd = _pick_sd(d)
    hp = _pad_h(h)
    wcin_p = wcin if cin != 1 else _pad_lanes(wcin)
    itm = jnp.dtype(dtype).itemsize
    vmem = (
        (sd + 2) * hp * wcin_p * itm   # x slab
        + 2 * d * hp * wcout * itm     # h + h2
        + sd * hp * wcout * itm        # out staging
        + 2 * 27 * max(wcin, wcout) * 4  # dw tables
        + 3 * 2 * LANE * 2 * LANE * itm  # pw blocks (generous)
        + 2 * 1024 * 1024              # working vregs slop
    )
    return vmem <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on VALUES, shapes static)
# ---------------------------------------------------------------------------

def _shift_rows(v, k: int):
    """out[i, :] = v[i+k, :], zero-filled at the edges (k in {-1,0,1})."""
    if k == 0:
        return v
    h = v.shape[0]
    z = jnp.zeros((abs(k), v.shape[1]), v.dtype)
    if k > 0:
        return jnp.concatenate([v[k:], z], axis=0)
    return jnp.concatenate([z, v[:h + k]], axis=0)


def _shift_lanes(v, k: int):
    """out[:, j] = v[:, j+k], zero-filled (k = kw*C, multiple of C)."""
    if k == 0:
        return v
    wc = v.shape[1]
    z = jnp.zeros((v.shape[0], abs(k)), v.dtype)
    if k > 0:
        return jnp.concatenate([v[:, k:], z], axis=1)
    return jnp.concatenate([z, v[:, :wc + k]], axis=1)


def _dw_plane(read_plane, d, w_tab_ref, c: int):
    """3x3x3 depthwise conv output plane d: 27 shifted FMAs, f32 acc.

    ``read_plane(dd)`` returns the (already zero-edged) input plane [H, WC]
    in f32.  Channel weights are per-lane rows of ``w_tab_ref`` [27, WC].
    """
    acc = None
    for kd in (-1, 0, 1):
        src = read_plane(d + kd)
        for kh in (-1, 0, 1):
            sh = _shift_rows(src, kh)
            for kw in (-1, 0, 1):
                tap = (kd + 1) * 9 + (kh + 1) * 3 + (kw + 1)
                s = _shift_lanes(sh, kw * c)
                term = w_tab_ref[tap:tap + 1, :] * s
                acc = term if acc is None else acc + term
    return acc


def _pw_plane(v, m_ref, ib: int, ob: int, nb: int, dtype, precision):
    """Block-diagonal pointwise matmul: [H, WCin] -> [H, WCout] (f32).

    ``v`` is rounded to the compute dtype first (the lax path materializes
    the depthwise output in compute dtype before the pointwise conv)."""
    vd = v.astype(dtype)
    m = m_ref[:]
    parts = [
        jax.lax.dot_general(
            vd[:, t * ib:(t + 1) * ib], m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        for t in range(nb)
    ]
    return parts[0] if nb == 1 else jnp.concatenate(parts, axis=1)


def _fold_norm(s1, s2, sb_ref, onehot, n_spatial: int, eps: float):
    """Per-lane (a, b) for y = x*a + b from lane sums + affine params.

    ``s1``/``s2`` are [1, WC] f32 lane sums of x and x², ``sb_ref`` is
    [2, WC] (scale row, bias row), ``onehot`` [WC, C] folds W out of the
    lane sums (validated pattern from ops/pallas_kernels.py)."""
    sums = jax.lax.dot_general(
        jnp.concatenate([s1, s2], axis=0), onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [2, C]
    mean_c = sums[0:1] / n_spatial
    var_c = jnp.maximum(sums[1:2] / n_spatial - mean_c * mean_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    back = jax.lax.dot_general(
        jnp.concatenate([mean_c, rstd_c], axis=0), onehot.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [2, WC]
    a = back[1:2] * sb_ref[0:1, :]
    b = sb_ref[1:2, :] - back[0:1, :] * a
    return a, b


def _leaky(v):
    return jnp.where(v > 0, v, LEAKY_SLOPE * v)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _block_kernel(
    # inputs
    x_hbm, dw1_ref, pw1_ref, sb1_ref, dw2_ref, pw2_ref, sb2_ref, sc_ref, sbs_ref,
    # outputs
    out_hbm,
    # scratch
    xs, h_ref, h2_ref, ys, in_sem, out_sem,
    *,
    dims, cin: int, c: int, identity: bool, dtype, precision,
):
    d, hh, w = dims
    hp = _pad_h(hh)
    wcin, wcout = w * cin, w * c
    sd = _pick_sd(d)
    n_slabs = d // sd
    n_spatial = d * hh * w  # stats over REAL rows only (pad rows masked)
    b = pl.program_id(0)
    # pad-row mask: conv taps smear real row hh-1 into pad rows, so every
    # plane that feeds statistics or the next conv is re-zeroed beyond hh
    rmask = (
        None
        if hp == hh
        else jax.lax.broadcasted_iota(jnp.int32, (hp, 1), 0) < hh
    )

    def mask_rows(v):
        if rmask is None:
            return v
        return jnp.where(rmask, v, jnp.zeros_like(v))

    lane_c = jax.lax.broadcasted_iota(jnp.int32, (wcout, c), 0) % c
    chan = jax.lax.broadcasted_iota(jnp.int32, (wcout, c), 1)
    onehot = (lane_c == chan).astype(jnp.float32)  # [WC, C]

    ib1, ob1, nb1 = _pw_blocking(cin, c, wcin, wcout)
    wcin_p = ib1 * nb1  # lane-padded input width (== wcin unless cin==1)

    def dma_slab(lo: int, hi: int, dst_lo: int):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, lo:hi], xs.at[dst_lo:dst_lo + (hi - lo)], in_sem
        )
        cp.start()
        cp.wait()

    zero_plane_in = jnp.zeros((hp, wcin_p), dtype)

    # ---- pass 1: conv1 (+ shortcut stats) slab by slab -------------------
    s1 = jnp.zeros((1, wcout), jnp.float32)
    s2 = jnp.zeros((1, wcout), jnp.float32)
    s1s = jnp.zeros((1, wcout), jnp.float32)
    s2s = jnp.zeros((1, wcout), jnp.float32)
    for s in range(n_slabs):
        d0 = s * sd
        lo, hi = max(d0 - 1, 0), min(d0 + sd + 1, d)
        dma_slab(lo, hi, lo - (d0 - 1))
        if d0 == 0:
            xs[0] = zero_plane_in
        if d0 + sd == d:
            xs[sd + 1] = zero_plane_in

        def p1_body(di, carry):
            cs1, cs2, cs1s, cs2s = carry

            def rd(dd):
                # xs index 0 holds plane d0-1
                return xs[dd - d0 + 1].astype(jnp.float32)

            dw = _dw_plane(lambda dd: rd(dd), d0 + di, dw1_ref, cin)
            hpw = _pw_plane(dw, pw1_ref, ib1, ob1, nb1, dtype, precision)
            hbf = mask_rows(hpw.astype(dtype))
            h_ref[d0 + di] = hbf
            hf = hbf.astype(jnp.float32)
            cs1 = cs1 + jnp.sum(hf, axis=0, keepdims=True)
            cs2 = cs2 + jnp.sum(hf * hf, axis=0, keepdims=True)
            if not identity:
                scp = _pw_plane(
                    xs[di + 1].astype(jnp.float32), sc_ref, ib1, ob1, nb1,
                    dtype, precision,
                )
                scf = scp.astype(dtype).astype(jnp.float32)
                cs1s = cs1s + jnp.sum(scf, axis=0, keepdims=True)
                cs2s = cs2s + jnp.sum(scf * scf, axis=0, keepdims=True)
            return cs1, cs2, cs1s, cs2s

        # di is a traced loop index: xs[dd - d0 + 1] stays in-bounds because
        # the slab buffer holds exactly [d0-1, d0+sd] (edges zeroed above)
        s1, s2, s1s, s2s = jax.lax.fori_loop(
            0, sd, p1_body, (s1, s2, s1s, s2s)
        )

    a1, b1 = _fold_norm(s1, s2, sb1_ref, onehot, n_spatial, IN_EPS)
    if not identity:
        a_s, b_s = _fold_norm(s1s, s2s, sbs_ref, onehot, n_spatial, IN_EPS)

    # ---- pass 1.5: g = leaky(norm1(h)) in place ---------------------------
    def norm_body(dd, _):
        # pad rows re-zeroed: norm's +b1 would leave leaky(b1) there, and
        # conv2 treats rows >= hh as the zero edge
        g = mask_rows(_leaky(h_ref[dd].astype(jnp.float32) * a1 + b1))
        h_ref[dd] = g.astype(dtype)
        return 0

    jax.lax.fori_loop(0, d, norm_body, 0)

    # ---- pass 2: conv2 from g (VMEM-resident), h2 + stats -----------------
    def rd_g(dd):
        ok = jnp.logical_and(dd >= 0, dd < d).astype(jnp.float32)
        ddc = jnp.clip(dd, 0, d - 1)
        return h_ref[ddc].astype(jnp.float32) * ok

    s1 = jnp.zeros((1, wcout), jnp.float32)
    s2 = jnp.zeros((1, wcout), jnp.float32)

    def p2_body(dd, carry):
        cs1, cs2 = carry
        dw = _dw_plane(rd_g, dd, dw2_ref, c)
        hpw = _pw_plane(dw, pw2_ref, LANE, LANE, wcout // LANE, dtype, precision)
        hbf = mask_rows(hpw.astype(dtype))
        h2_ref[dd] = hbf
        hf = hbf.astype(jnp.float32)
        return (
            cs1 + jnp.sum(hf, axis=0, keepdims=True),
            cs2 + jnp.sum(hf * hf, axis=0, keepdims=True),
        )

    s1, s2 = jax.lax.fori_loop(0, d, p2_body, (s1, s2))
    a2, b2 = _fold_norm(s1, s2, sb2_ref, onehot, n_spatial, IN_EPS)

    # ---- pass 3: y = leaky(norm2(h2) + residual), slab DMA out ------------
    for s in range(n_slabs):
        d0 = s * sd
        dma_slab(d0, d0 + sd, 1)  # no halo; reuse xs (offset 1 arbitrary)

        def p3_body(di, _):
            y = (h2_ref[d0 + di].astype(jnp.float32) * a2 + b2).astype(dtype)
            if identity:
                res = xs[di + 1]
            else:
                scp = _pw_plane(
                    xs[di + 1].astype(jnp.float32), sc_ref, ib1, ob1, nb1,
                    dtype, precision,
                )
                res = (scp.astype(dtype).astype(jnp.float32) * a_s + b_s).astype(dtype)
            out = _leaky(y.astype(jnp.float32) + res.astype(jnp.float32))
            ys[di] = out.astype(dtype)
            return 0

        jax.lax.fori_loop(0, sd, p3_body, 0)
        cp = pltpu.make_async_copy(ys, out_hbm.at[b, d0:d0 + sd], out_sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("dims", "cin", "c", "identity", "dtype", "precision", "interpret"),
)
def _fused_block_call(
    x4, dw1, pw1, sb1, dw2, pw2, sb2, sc, sbs,
    *, dims, cin, c, identity, dtype, precision, interpret,
):
    bsz = x4.shape[0]
    d, hh, w = dims
    hp = _pad_h(hh)
    wcin, wcout = w * cin, w * c
    ibp, _, nbp = _pw_blocking(cin, c, wcin, wcout)
    wcin_p = ibp * nbp
    sd = _pick_sd(d)
    kern = partial(
        _block_kernel,
        dims=dims, cin=cin, c=c, identity=identity, dtype=dtype,
        precision=precision,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    wspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            vspec(),  # x in HBM
            wspec(), wspec(), wspec(),  # dw1, pw1, sb1
            wspec(), wspec(), wspec(),  # dw2, pw2, sb2
            wspec(), wspec(),  # sc, sbs
        ],
        out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct((bsz, d, hp, wcout), dtype),
        scratch_shapes=[
            pltpu.VMEM((sd + 2, hp, wcin_p), dtype),  # xs
            pltpu.VMEM((d, hp, wcout), dtype),        # h (then g)
            pltpu.VMEM((d, hp, wcout), dtype),        # h2
            pltpu.VMEM((sd, hp, wcout), dtype),       # out staging
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x4, dw1, pw1, sb1, dw2, pw2, sb2, sc, sbs)


def _dw_lane_table(dw_kernel, w: int, lanes: int | None = None):
    """[3,3,3,1,C] flax depthwise kernel -> [27, W*C] per-lane tap rows.

    ``lanes`` (cin==1 only) zero-pads the lane dim to the DMA-aligned
    width; pad-lane products are discarded by the pointwise matrix's zero
    rows either way."""
    c = dw_kernel.shape[-1]
    flat = dw_kernel.reshape(27, c).astype(jnp.float32)
    tab = jnp.tile(flat, (1, w))
    if lanes is not None and lanes != tab.shape[1]:
        tab = jnp.pad(tab, ((0, 0), (0, lanes - tab.shape[1])))
    return tab


def _pw_block_matrix(pw_kernel, ib: int, cin: int, dtype, rows: int | None = None):
    """[1,1,1,Cin,C] flax pointwise kernel -> shared [ib, ob] diagonal tile.

    ``rows`` (cin==1 only) zero-pads the input-lane rows to the DMA-aligned
    width: pad lanes contribute nothing to the matmul, nullifying whatever
    the depthwise taps smeared into them."""
    pw = pw_kernel.reshape(pw_kernel.shape[-2], pw_kernel.shape[-1])
    nw = ib // cin
    m = jnp.kron(jnp.eye(nw, dtype=pw.dtype), pw)
    if rows is not None and rows != m.shape[0]:
        m = jnp.pad(m, ((0, rows - m.shape[0]), (0, 0)))
    return m.astype(dtype)


def _sb_rows(scale, bias, w: int):
    """Per-channel affine params -> [2, W*C] lane rows (scale, bias)."""
    return jnp.stack(
        [jnp.tile(scale.astype(jnp.float32), w), jnp.tile(bias.astype(jnp.float32), w)]
    )


def fused_residual_block(
    x, blk, *, dtype=jnp.bfloat16, precision=None, interpret: bool = False
):
    """Run one residual block via the fused Pallas kernel.

    ``x``: [B, D, H, W, Cin] activation (any dtype; cast to ``dtype``).
    ``blk``: the flax param subtree of a ResidualBlock (conv1/conv2/norm1/
    norm2 [+ shortcut_conv/shortcut_norm]).  Caller must have checked
    ``fused_block_supported`` — this function asserts it.
    """
    bsz, d, hh, w, cin = x.shape
    c = blk["conv1"]["pointwise"]["kernel"].shape[-1]
    identity = "shortcut_conv" not in blk
    assert fused_block_supported(x.shape, cin, c, dtype), (x.shape, cin, c)
    wcin = w * cin
    ib1, _, nb1 = _pw_blocking(cin, c, wcin, w * c)
    wcin_p = ib1 * nb1  # lane-padded input width (== wcin unless cin==1)
    # cin==1: the diagonal tile is built at the LOGICAL width (one W copy
    # per input lane) then row-padded to the DMA-aligned ib1
    ib_logical = wcin if cin == 1 else ib1

    dw1 = _dw_lane_table(blk["conv1"]["depthwise"]["kernel"], w, lanes=wcin_p)
    pw1 = _pw_block_matrix(
        blk["conv1"]["pointwise"]["kernel"], ib_logical, cin, dtype, rows=ib1
    )
    sb1 = _sb_rows(blk["norm1"]["scale"], blk["norm1"]["bias"], w)
    dw2 = _dw_lane_table(blk["conv2"]["depthwise"]["kernel"], w)
    pw2 = _pw_block_matrix(blk["conv2"]["pointwise"]["kernel"], LANE, c, dtype)
    sb2 = _sb_rows(blk["norm2"]["scale"], blk["norm2"]["bias"], w)
    if identity:
        sc = jnp.zeros_like(pw1)
        sbs = jnp.zeros_like(sb1)
    else:
        sc = _pw_block_matrix(
            blk["shortcut_conv"]["kernel"], ib_logical, cin, dtype, rows=ib1
        )
        sbs = _sb_rows(blk["shortcut_norm"]["scale"], blk["shortcut_norm"]["bias"], w)

    prec = precision if precision is not None else jax.lax.Precision.DEFAULT
    x4 = x.astype(dtype).reshape(bsz, d, hh, wcin)
    hp = _pad_h(hh)
    if hp != hh:
        # sublane-align H for the HBM<->VMEM DMA windows (zero rows double
        # as the conv's zero edge; the kernel masks them out of the stats)
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, hp - hh), (0, 0)))
    if wcin_p != wcin:
        # lane-align W*Cin (cin==1): zero pad lanes are edge-correct for the
        # depthwise taps; the pointwise matrix's zero rows drop them
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, wcin_p - wcin)))
    y = _fused_block_call(
        x4, dw1, pw1, sb1, dw2, pw2, sb2, sc, sbs,
        dims=(d, hh, w), cin=cin, c=c, identity=identity, dtype=dtype,
        precision=prec, interpret=interpret,
    )
    if hp != hh:
        y = y[:, :, :hh]
    return y.reshape(bsz, d, hh, w, c)
