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
