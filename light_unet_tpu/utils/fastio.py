"""ctypes bindings for the native fastio library (``native/fastio.cpp``).

Provides GIL-free, multithreaded NIfTI decode (gzip inflate + dtype
conversion + scl scaling) for the host data path.  Falls back transparently
to the pure-Python codec (``utils/nifti.py``) when the shared library isn't
built or a file needs features the native path doesn't cover (big-endian).

Build on demand: ``make -C native`` (or ``ensure_built()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from light_unet_tpu.utils import nifti

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libfastio.so"

_lib = None
_lib_lock = threading.Lock()


def ensure_built(quiet: bool = True) -> bool:
    """Compile the shared library if missing.  Returns availability."""
    if _LIB_PATH.exists():
        return True
    if not (_NATIVE_DIR / "fastio.cpp").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and not ensure_built():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fastio_read_header.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.fastio_read_header.restype = ctypes.c_int
        lib.fastio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.fastio_decode.restype = ctypes.c_int64
        lib.fastio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.fastio_decode_batch.restype = None
        lib.fastio_version.restype = ctypes.c_int
        try:  # added in fastio_version 2; older .so builds lack the symbol
            lib.fastio_order_stats.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_void_p,
            ]
            lib.fastio_order_stats.restype = ctypes.c_int
        except AttributeError:
            pass
        try:  # added in fastio_version 3
            lib.fastio_quantize_pad.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
            lib.fastio_quantize_pad.restype = ctypes.c_int
        except AttributeError:
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def percentiles(data: np.ndarray, qs: Sequence[float]) -> Optional[List[float]]:
    """``np.percentile(data, qs)``-exact values via native selection.

    ``np.percentile`` sorts the full volume (O(n log n) and a host-core
    monopoly for seconds on a whole-body PET); the linear-interpolation
    method only needs TWO order statistics per quantile, which
    ``fastio_order_stats`` finds with successive ``std::nth_element``
    partitions (~k linear passes).  numpy divides q by ``float32(100)`` for
    float32 arrays, so a python-float q runs the whole index/gamma/lerp
    chain in float32 while an ``np.float64`` q promotes it to float64 — the
    arithmetic below uses the same numpy scalar ops in the same order, so
    NEP-50 promotion reproduces either chain bit-identically to the
    reference's ``np.percentile`` calls (pinned in
    ``tests/unit/test_fastio.py``).

    Returns None when the native path can't serve the request (library or
    symbol missing, non-float32 input — a different numpy dtype chain —
    empty input, or non-finite values: NaN breaks the strict weak order
    ``nth_element`` needs and inf breaks lerp exactness); the caller falls
    back to numpy.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fastio_order_stats"):
        return None
    data = np.asarray(data)
    if data.dtype != np.float32:
        return None
    flat = np.ascontiguousarray(data.ravel())
    n = flat.size
    if n == 0:
        return None
    # non-finite detection happens inside the native scratch copy (kErrData
    # -> rc != 0 -> numpy fallback); no separate host isfinite pass needed
    # numpy 'linear': qt = q / f32(100); virtual index vi = (n-1)*qt;
    # prev = floor(vi), next = prev+1, gamma = vi - floor(vi) — all in qt's
    # promoted dtype (f32 for python-float q, f64 for np.float64 q)
    ranks: List[int] = []
    spec = []
    for q in qs:
        qt = np.true_divide(q, np.float32(100.0))
        vi = (n - 1) * qt
        prev_f = np.floor(vi)
        prev = int(prev_f)
        nxt = prev + 1
        if vi >= n - 1:  # numpy's above-bounds clamp: both point at the max
            prev = nxt = n - 1
        prev = max(prev, 0)
        nxt = min(max(nxt, 0), n - 1)
        t = vi - prev_f
        spec.append((prev, nxt, t))
        ranks.extend((prev, nxt))
    uniq = sorted(set(ranks))
    idx = np.asarray(uniq, dtype=np.int64)
    out = np.empty(len(uniq), dtype=np.float32)
    rc = lib.fastio_order_stats(
        flat.ctypes.data_as(ctypes.c_void_p), n,
        idx.ctypes.data_as(ctypes.c_void_p), len(uniq),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    by_rank = dict(zip(uniq, out))
    vals = []
    for prev, nxt, t in spec:
        a = by_rank[prev]
        b = by_rank[nxt]
        if prev == nxt:
            vals.append(float(a))
            continue
        # numpy _lerp: diff in the data dtype, products promote with t
        diff = b - a
        if t >= 0.5:
            vals.append(float(b - diff * (1 - t)))
        else:
            vals.append(float(a + diff * t))
    return vals


def quantize_pad(
    image: np.ndarray, pshape: Tuple[int, int, int], lo: float, hi: float
) -> Optional[np.ndarray]:
    """uint16-quantize ``image`` into the clip range [lo, hi] and place it in
    a zero-padded C-ordered buffer of ``pshape`` — one native pass.

    Replaces the serving path's numpy chain (``np.clip`` temp, three in-place
    f32 passes, and a cast-assign that is also an F->C transpose copy for
    decoded NIfTI views) with a single strided read + sequential write, GIL
    released.  Bit-identical to the numpy chain (same f32 op order, compiled
    with -ffp-contract=off; pinned + fuzzed in ``tests/unit/test_fastio.py``).

    Returns None when the native path can't serve it (library/symbol missing,
    non-f32 input, not 3-D); the caller falls back to numpy.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fastio_quantize_pad"):
        return None
    image = np.asarray(image)
    if image.dtype != np.float32 or image.ndim != 3 or len(pshape) != 3:
        return None
    if any(p < d for p, d in zip(pshape, image.shape)):
        return None
    if image.size == 0:
        return None
    itemsize = image.dtype.itemsize
    if any(s % itemsize for s in image.strides):
        return None  # misaligned view — let numpy handle it
    dims = np.asarray(image.shape, dtype=np.int64)
    strides_el = np.asarray(
        [s // itemsize for s in image.strides], dtype=np.int64
    )
    pdims = np.asarray(pshape, dtype=np.int64)
    # numpy computes the scale in float64 and THEN casts — reproduce exactly
    scale = np.float32(65535.0 / (hi - lo)) if hi > lo else np.float32(0.0)
    out = np.empty(pshape, dtype=np.uint16)
    rc = lib.fastio_quantize_pad(
        image.ctypes.data_as(ctypes.c_void_p),
        dims.ctypes.data_as(ctypes.c_void_p),
        strides_el.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        pdims.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(lo), ctypes.c_float(hi), ctypes.c_float(scale),
    )
    if rc != 0:
        return None
    return out


def read_header(path) -> Optional[nifti.Nifti1Header]:
    """Parse just the header (cheap partial inflate for .gz)."""
    lib = _load()
    if lib is None:
        return nifti.load(path).header  # fallback: full load
    buf = (ctypes.c_uint8 * nifti.HEADER_SIZE)()
    rc = lib.fastio_read_header(str(path).encode(), buf)
    if rc != 0:
        return None
    return nifti.Nifti1Header.parse(bytes(buf))


def load_f32(path) -> Tuple[np.ndarray, nifti.Nifti1Header]:
    """Decode one NIfTI volume to a float32 array (scl scaling applied —
    nibabel ``get_fdata`` semantics).  Falls back to the Python codec on any
    native-path failure."""
    lib = _load()
    if lib is not None:
        hdr = read_header(path)
        if hdr is not None and hdr.endian == "<":
            shape = hdr.get_data_shape()
            n = int(np.prod(shape)) if shape else 0
            out = np.empty(n, dtype=np.float32)
            hbuf = (ctypes.c_uint8 * nifti.HEADER_SIZE)()
            rc = lib.fastio_decode(
                str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), n, hbuf
            )
            if rc == n:
                return out.reshape(shape, order="F"), hdr
    img = nifti.load(path)
    return img.get_fdata(np.float32), img.header


def load_batch_f32(
    paths: Sequence, n_threads: int = 0
) -> List[Tuple[np.ndarray, nifti.Nifti1Header]]:
    """Decode many volumes in parallel native threads (one syscall boundary,
    no GIL).  Falls back per-file to the Python codec."""
    lib = _load()
    if lib is None:
        return [load_f32(p) for p in paths]

    headers: List[Optional[nifti.Nifti1Header]] = [read_header(p) for p in paths]
    native_idx = [
        i for i, h in enumerate(headers) if h is not None and h.endian == "<"
    ]
    results: List[Optional[Tuple[np.ndarray, nifti.Nifti1Header]]] = [None] * len(paths)

    if native_idx:
        n = len(native_idx)
        bufs = []
        caps = (ctypes.c_int64 * n)()
        dsts = (ctypes.c_void_p * n)()
        hdrs = (ctypes.c_void_p * n)()
        cpaths = (ctypes.c_char_p * n)()
        hdr_bufs = []
        for j, i in enumerate(native_idx):
            shape = headers[i].get_data_shape()
            count = int(np.prod(shape)) if shape else 0
            arr = np.empty(count, dtype=np.float32)
            bufs.append(arr)
            caps[j] = count
            dsts[j] = arr.ctypes.data_as(ctypes.c_void_p).value
            hb = (ctypes.c_uint8 * nifti.HEADER_SIZE)()
            hdr_bufs.append(hb)
            hdrs[j] = ctypes.cast(hb, ctypes.c_void_p).value
            cpaths[j] = str(paths[i]).encode()
        counts = (ctypes.c_int64 * n)()
        lib.fastio_decode_batch(cpaths, n, dsts, caps, hdrs, counts, int(n_threads))
        for j, i in enumerate(native_idx):
            if counts[j] == caps[j]:
                shape = headers[i].get_data_shape()
                results[i] = (bufs[j].reshape(shape, order="F"), headers[i])

    for i, r in enumerate(results):
        if r is None:
            results[i] = load_f32(paths[i])
    return results  # type: ignore[return-value]
