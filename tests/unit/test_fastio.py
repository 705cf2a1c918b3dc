"""Native fastio library: decode parity with the Python codec."""

import numpy as np
import pytest

from light_unet_tpu.utils import fastio, nifti


@pytest.fixture(scope="module")
def lib_available():
    if not fastio.ensure_built():
        pytest.skip("native fastio not built (no compiler?)")
    assert fastio.available()
    return True


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
def test_decode_matches_python_codec(tmp_path, rng, lib_available, suffix, dtype):
    data = (rng.random((9, 11, 13)) * 50).astype(dtype)
    affine = np.diag([4.0, 4.0, 4.0, 1.0])
    path = tmp_path / f"vol{suffix}"
    nifti.save(nifti.Nifti1Image(data, affine), path)

    arr, hdr = fastio.load_f32(path)
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr, data.astype(np.float32))
    assert hdr.get_zooms() == (4.0, 4.0, 4.0)


def test_decode_applies_scaling(tmp_path, lib_available):
    data = np.arange(27, dtype=np.int16).reshape(3, 3, 3)
    img = nifti.Nifti1Image(data, np.eye(4))
    img.header.scl_slope = 3.0
    img.header.scl_inter = -1.0
    path = tmp_path / "scaled.nii.gz"
    nifti.save(img, path)
    arr, _ = fastio.load_f32(path)
    np.testing.assert_allclose(arr, data * 3.0 - 1.0)


def test_read_header_only(tmp_path, rng, lib_available):
    data = rng.random((5, 6, 7)).astype(np.float32)
    path = tmp_path / "h.nii.gz"
    nifti.save(nifti.Nifti1Image(data, np.diag([2.0, 3.0, 4.0, 1.0])), path)
    hdr = fastio.read_header(path)
    assert hdr.get_data_shape() == (5, 6, 7)
    assert hdr.get_zooms() == (2.0, 3.0, 4.0)


def test_batch_decode(tmp_path, rng, lib_available):
    paths = []
    arrays = []
    for i in range(5):
        data = rng.random((6 + i, 7, 8)).astype(np.float32)
        p = tmp_path / f"b{i}.nii.gz"
        nifti.save(nifti.Nifti1Image(data, np.eye(4)), p)
        paths.append(p)
        arrays.append(data)
    out = fastio.load_batch_f32(paths, n_threads=3)
    assert len(out) == 5
    for (arr, hdr), expected in zip(out, arrays):
        np.testing.assert_allclose(arr, expected)


def test_fallback_on_missing_file(tmp_path, lib_available):
    with pytest.raises(Exception):
        fastio.load_f32(tmp_path / "nope.nii.gz")


def test_fortran_order_matches(tmp_path, lib_available):
    """Native path must reproduce the codec's (nx,ny,nz) F-order layout."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "f.nii"
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    arr, _ = fastio.load_f32(path)
    np.testing.assert_array_equal(arr, data)


def test_nan_slope_no_scaling_native(tmp_path, lib_available):
    """ADVICE r1: native decode must treat NaN slope/inter as 1.0/0.0."""
    import struct

    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    path = tmp_path / "nan.nii"
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    buf = bytearray(path.read_bytes())
    struct.pack_into("<2f", buf, 112, float("nan"), float("nan"))
    path.write_bytes(bytes(buf))
    arr, _ = fastio.load_f32(path)
    assert np.isfinite(arr).all()
    np.testing.assert_array_equal(arr, data)


def test_hostile_header_dims_do_not_crash(tmp_path, lib_available):
    """ADVICE r1: a corrupt/hostile header claiming petabyte dims must come
    back as a negative error code, not std::terminate the process."""
    import ctypes
    import gzip
    import struct

    data = np.zeros((2, 2, 2), dtype=np.float32)
    path = tmp_path / "hostile.nii.gz"
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    # rewrite dims to 7 x int16-max and negative, re-gzip
    with gzip.open(path, "rb") as f:
        buf = bytearray(f.read())
    struct.pack_into("<8h", buf, 40, 7, 32767, 32767, 32767, 32767, 32767, 32767, 32767)
    with gzip.open(path, "wb") as f:
        f.write(bytes(buf))
    lib = fastio._load()
    out = np.empty(64, dtype=np.float32)
    hbuf = (ctypes.c_uint8 * nifti.HEADER_SIZE)()
    rc = lib.fastio_decode(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), 64, hbuf)
    assert rc < 0  # clean error, process alive

    # negative dims likewise
    struct.pack_into("<8h", buf, 40, 3, -5, 4, 4, 1, 1, 1, 1)
    with gzip.open(path, "wb") as f:
        f.write(bytes(buf))
    rc = lib.fastio_decode(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), 64, hbuf)
    assert rc < 0


class TestOrderStatsPercentiles:
    """Native percentile selection must be bit-identical to np.percentile."""

    def test_matches_numpy_exact(self, rng, lib_available):
        for shape, qs in [
            ((67,), (0.5, 99.5)),
            ((40, 31, 17), (0.5, 99.5)),
            ((123456,), (0.0, 0.5, 37.2, 50.0, 99.5, 100.0)),
        ]:
            data = (rng.standard_normal(shape) * 100).astype(np.float32)
            got = fastio.percentiles(data, qs)
            assert got is not None
            want = [float(np.percentile(data, q)) for q in qs]
            assert got == want, f"shape={shape} qs={qs}: {got} != {want}"

    def test_duplicates_and_constant(self, lib_available):
        data = np.full((5000,), 3.25, np.float32)
        assert fastio.percentiles(data, (0.5, 99.5)) == [3.25, 3.25]
        data = np.repeat(np.float32([1, 2, 2, 2, 9]), 1000)
        got = fastio.percentiles(data, (10.0, 50.0, 90.0))
        want = [float(np.percentile(data, q)) for q in (10.0, 50.0, 90.0)]
        assert got == want

    def test_single_element(self, lib_available):
        assert fastio.percentiles(np.float32([7.5]), (0.5, 99.5)) == [7.5, 7.5]

    def test_nan_falls_back(self, lib_available):
        data = np.float32([1.0, np.nan, 2.0])
        assert fastio.percentiles(data, (50.0,)) is None

    def test_empty_falls_back(self, lib_available):
        assert fastio.percentiles(np.empty((0,), np.float32), (50.0,)) is None

    def test_compute_clip_values_uses_native(self, rng, lib_available):
        from light_unet_tpu.ops.intensity import compute_clip_values

        data = (rng.random((30, 30, 30)) * 1000).astype(np.float32)
        lo, hi = compute_clip_values(data)
        assert lo == float(np.percentile(data, 0.5))
        assert hi == float(np.percentile(data, 99.5))
        # non-f32 input must take the numpy path and still be exact
        lo64, hi64 = compute_clip_values(data.astype(np.float64))
        assert (lo64, hi64) == (
            float(np.percentile(data.astype(np.float64), 0.5)),
            float(np.percentile(data.astype(np.float64), 99.5)),
        )


def _numpy_quantize_pad(image, pshape, lo, hi):
    """The serving path's original numpy chain (fused.py fallback)."""
    padded = np.zeros(pshape, np.uint16)
    scale = np.float32(65535.0 / (hi - lo)) if hi > lo else np.float32(0.0)
    tmp = np.clip(image, lo, hi)
    tmp -= np.float32(lo)
    tmp *= scale
    tmp += np.float32(0.5)
    padded[tuple(slice(0, s) for s in image.shape)] = tmp
    return padded


class TestQuantizePad:
    """Native single-pass quantize+pad must be bit-identical to the numpy
    chain it replaces (clip -> -=lo -> *=scale -> +=0.5 -> uint16 cast into a
    zeroed padded buffer)."""

    def test_fuzz_bit_identical(self, rng, lib_available):
        for trial in range(30):
            d = tuple(int(x) for x in rng.integers(1, 24, size=3))
            p = tuple(dd + int(x) for dd, x in zip(d, rng.integers(0, 9, size=3)))
            img = (rng.random(d, dtype=np.float32) * 20 - 3).astype(np.float32)
            if trial % 3 == 1:
                img = np.asfortranarray(img)  # decoded-NIfTI layout
            elif trial % 3 == 2:
                big = (rng.random((d[0] + 4, d[1] + 2, d[2] + 5), dtype=np.float32) * 20)
                img = big[2 : 2 + d[0], 1 : 1 + d[1], 3 : 3 + d[2]]  # strided view
            lo = float(rng.random() * 4 - 1)
            hi = lo + float(rng.random() * 10)
            out = fastio.quantize_pad(img, p, lo, hi)
            assert out is not None
            assert np.array_equal(out, _numpy_quantize_pad(img, p, lo, hi))

    def test_wholebody_fortran_layout(self, rng, lib_available):
        img = np.asfortranarray(
            (rng.random((80, 80, 120)) * 15 - 1).astype(np.float32)
        )
        p = (80, 80, 128)
        out = fastio.quantize_pad(img, p, 0.2, 11.7)
        assert np.array_equal(out, _numpy_quantize_pad(img, p, 0.2, 11.7))

    def test_degenerate_range(self, lib_available):
        img = np.full((4, 4, 4), 3.0, np.float32)
        out = fastio.quantize_pad(img, (4, 4, 6), 3.0, 3.0)  # hi == lo
        assert np.array_equal(out, _numpy_quantize_pad(img, (4, 4, 6), 3.0, 3.0))
        out = fastio.quantize_pad(img, (4, 4, 6), 5.0, 2.0)  # hi < lo
        assert np.array_equal(out, _numpy_quantize_pad(img, (4, 4, 6), 5.0, 2.0))

    def test_extremes_clip_exactly(self, lib_available):
        img = np.array(
            [[[-1e30, 1e30, 0.0, 0.5]]], np.float32
        )  # +-inf-magnitude floats clamp to the range ends
        out = fastio.quantize_pad(img, (1, 1, 4), 0.0, 1.0)
        assert np.array_equal(out, _numpy_quantize_pad(img, (1, 1, 4), 0.0, 1.0))
        assert out[0, 0, 0] == 0 and out[0, 0, 1] == 65535

    def test_rejects_unsupported(self, rng, lib_available):
        f64 = rng.random((3, 3, 3))
        assert fastio.quantize_pad(f64, (3, 3, 3), 0.0, 1.0) is None
        f32_2d = rng.random((3, 3)).astype(np.float32)
        assert fastio.quantize_pad(f32_2d, (3, 3, 3), 0.0, 1.0) is None
        small_pad = rng.random((4, 4, 4)).astype(np.float32)
        assert fastio.quantize_pad(small_pad, (4, 4, 3), 0.0, 1.0) is None
        empty = np.zeros((0, 3, 3), np.float32)
        assert fastio.quantize_pad(empty, (1, 3, 3), 0.0, 1.0) is None

    def test_fused_prepare_uses_native(self, rng, lib_available, monkeypatch):
        """FusedVolumePipeline.prepare's uint16 upload buffer must be
        bit-identical whether the native path or the numpy fallback builds
        it."""
        from light_unet_tpu.config import Config
        from light_unet_tpu.ops import fused as fused_mod

        cfg = Config()
        cfg.data.patch_size = [16, 16, 16]
        pipe = fused_mod.FusedVolumePipeline(
            lambda p, x: x[..., :1], cfg, patch_batch=8, transfer_dtype="uint16"
        )
        img = np.asfortranarray(
            (rng.random((20, 22, 30)) * 12 - 1).astype(np.float32)
        )
        native = np.asarray(pipe.prepare(img)[0])
        monkeypatch.setattr(
            "light_unet_tpu.utils.fastio.quantize_pad", lambda *a, **k: None
        )
        fallback = np.asarray(pipe.prepare(img)[0])
        assert native.dtype == fallback.dtype == np.uint16
        assert np.array_equal(native, fallback)


class TestLibdeflateDecode:
    """The libdeflate whole-stream gzip decode (fastio_version 4) must be
    bit-identical to the zlib fallback (FASTIO_ZLIB=1 forces it)."""

    @pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
    def test_paths_bit_identical(self, tmp_path, rng, lib_available,
                                 monkeypatch, dtype):
        data = (rng.random((17, 9, 23)) * 200 - 50).astype(dtype)
        path = tmp_path / "vol.nii.gz"
        nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)

        monkeypatch.setenv("FASTIO_ZLIB", "1")
        a_zlib, h_zlib = fastio.load_f32(path)
        monkeypatch.delenv("FASTIO_ZLIB")
        a_ld, h_ld = fastio.load_f32(path)

        assert np.array_equal(a_zlib, a_ld)
        assert h_zlib.to_bytes() == h_ld.to_bytes()

    def test_fuzz_sizes_and_levels(self, tmp_path, rng, lib_available,
                                   monkeypatch):
        # odd shapes + gzip levels: member boundaries land anywhere
        for i, (shape, level) in enumerate(
            [((1, 1, 1), 1), ((5, 7, 3), 9), ((31, 2, 64), 6),
             ((8, 8, 8), 0), ((13, 1, 255), 1)]
        ):
            data = (rng.random(shape) * 1000).astype(np.float32)
            path = tmp_path / f"f{i}.nii.gz"
            nifti.save(nifti.Nifti1Image(data, np.eye(4)), path,
                       compresslevel=level)
            monkeypatch.setenv("FASTIO_ZLIB", "1")
            a_zlib, _ = fastio.load_f32(path)
            monkeypatch.delenv("FASTIO_ZLIB")
            a_ld, _ = fastio.load_f32(path)
            assert np.array_equal(a_zlib, a_ld), (shape, level)

    def test_trailing_garbage_falls_back(self, tmp_path, rng, lib_available):
        # gzip stream with trailing bytes after the member: libdeflate
        # rejects, the zlib prefix decode must still serve the volume
        data = (rng.random((6, 5, 4)) * 10).astype(np.float32)
        path = tmp_path / "trail.nii.gz"
        nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
        with open(path, "ab") as f:
            f.write(b"\x00garbage-after-member")
        arr, _ = fastio.load_f32(path)
        np.testing.assert_allclose(arr, data)
