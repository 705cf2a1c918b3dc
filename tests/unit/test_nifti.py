"""NIfTI-1 codec round-trip and header-semantics tests."""

import gzip
import struct

import numpy as np
import pytest

from light_unet_tpu.utils import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
def test_roundtrip(tmp_path, rng, suffix, dtype):
    data = (rng.random((7, 9, 11)) * 100).astype(dtype)
    affine = np.diag([4.0, 4.0, 4.0, 1.0])
    affine[:3, 3] = [-10.0, 5.0, 2.5]
    img = nifti.Nifti1Image(data, affine)
    path = tmp_path / f"vol{suffix}"
    nifti.save(img, path)

    loaded = nifti.load(path)
    assert loaded.shape == (7, 9, 11)
    np.testing.assert_array_equal(np.asarray(loaded.dataobj), data)
    np.testing.assert_allclose(loaded.affine, affine, atol=1e-6)
    assert loaded.header.get_zooms() == (4.0, 4.0, 4.0)


def test_get_fdata_applies_scaling(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    img = nifti.Nifti1Image(data, np.eye(4))
    img.header.scl_slope = 2.0
    img.header.scl_inter = 1.0
    path = tmp_path / "scaled.nii"
    nifti.save(img, path)
    out = nifti.load(path).get_fdata()
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, data.astype(np.float64) * 2.0 + 1.0)


def test_header_passthrough_on_save(tmp_path, rng):
    """Saving with a loaded header preserves affine + spacing (the inferencer
    writes prob maps with the original affine/header, inferencer.py:165)."""
    data = rng.random((5, 6, 7)).astype(np.float32)
    affine = np.array(
        [[0, -4.0, 0, 12.0], [4.0, 0, 0, -7.0], [0, 0, 4.0, 3.0], [0, 0, 0, 1.0]]
    )
    p1 = tmp_path / "orig.nii.gz"
    nifti.save(nifti.Nifti1Image(data, affine), p1)
    orig = nifti.load(p1)

    prob = (data * 0.5).astype(np.float32)
    p2 = tmp_path / "prob.nii.gz"
    nifti.save(nifti.Nifti1Image(prob, orig.affine, orig.header), p2)
    reloaded = nifti.load(p2)
    np.testing.assert_allclose(reloaded.affine, affine, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(reloaded.dataobj), prob)


def test_fortran_order_layout(tmp_path):
    """NIfTI stores x-fastest; a saved array must round-trip element order."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "f.nii"
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    raw = path.read_bytes()
    payload = np.frombuffer(raw[352:], dtype=np.float32)
    # first element along axis-0 varies fastest on disk
    np.testing.assert_array_equal(payload[:2], data[:, 0, 0])


def test_rejects_garbage(tmp_path):
    path = tmp_path / "bad.nii"
    path.write_bytes(b"\x00" * 400)
    with pytest.raises(nifti.NiftiError):
        nifti.load(path)


def test_rejects_corrupt_gzip(tmp_path):
    """A .nii.gz that isn't gzip (or is truncated) must raise NiftiError,
    not leak gzip.BadGzipFile/EOFError (found by the e2e verify drive)."""
    for name, content in [("bad1.nii.gz", b"not a nifti"),
                          ("bad2.nii.gz", b"\x1f\x8b\x08\x00trunc")]:
        path = tmp_path / name
        path.write_bytes(content)
        with pytest.raises(nifti.NiftiError):
            nifti.load(path)


def test_gzip_output_is_gzip(tmp_path):
    data = np.zeros((3, 3, 3), dtype=np.float32)
    path = tmp_path / "z.nii.gz"
    nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
    with gzip.open(path, "rb") as f:
        buf = f.read()
    assert struct.unpack_from("<i", buf, 0)[0] == 348
    assert buf[344:347] == b"n+1"


def test_save_from_array_resets_source_scaling(tmp_path):
    """ADVICE r1 (high): building an image from an in-memory array must drop
    scl_slope/scl_inter inherited from a donor header, or every reload
    re-applies the raw file's scaling to already-scaled data."""
    # source file: int16 stored, slope 0.01 / inter 5.0
    raw = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    src_img = nifti.Nifti1Image(raw, np.diag([4.0, 4.0, 4.0, 1.0]))
    src_img.header.scl_slope = 0.01
    src_img.header.scl_inter = 5.0
    src_path = tmp_path / "src.nii.gz"
    nifti.save(src_img, src_path)

    src = nifti.load(src_path)
    scaled = src.get_fdata(np.float32)  # values in [5.0, 5.07]
    normalized = (scaled - scaled.min()) / (scaled.max() - scaled.min())

    # preprocess-style save: normalized array + the ORIGINAL header
    out_path = tmp_path / "norm.nii.gz"
    nifti.save(nifti.Nifti1Image(normalized.astype(np.float32), src.affine, src.header), out_path)

    back = nifti.load(out_path)
    assert back.header.scl_slope in (0.0, 1.0)
    assert back.header.scl_inter == 0.0
    np.testing.assert_allclose(back.get_fdata(np.float32), normalized, rtol=1e-6)


def test_nan_slope_means_no_scaling(tmp_path):
    """nibabel treats scl_slope=NaN as 'no scaling'; it must not NaN-flood."""
    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    img = nifti.Nifti1Image(data, np.eye(4))
    path = tmp_path / "nan.nii"
    nifti.save(img, path)
    # poke NaN slope/inter directly into the saved header bytes
    buf = bytearray(path.read_bytes())
    struct.pack_into("<2f", buf, 112, float("nan"), float("nan"))
    path.write_bytes(bytes(buf))
    out = nifti.load(path).get_fdata(np.float32)
    np.testing.assert_array_equal(out, data)
