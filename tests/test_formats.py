"""Self-contained NRRD / NIfTI-1 readers-writers (data/formats.py).

The reference's entire data surface is nrrd.read/nrrd.write
(PW_AL.py:291, eval_utils.py:233) plus nibabel (datasets/utils.py:3);
these tests pin our from-scratch implementations: round-trips across
dtypes/encodings, hand-built headers for the reader-only paths
(big endian, detached data, ascii, NIfTI scaling), and registry fallback.
"""

import gzip
import os
import struct

import numpy as np
import pytest

from nnal_tpu.data import formats
from nnal_tpu.data.io import read_volume


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32,
                                   np.float32, np.float64])
@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_nrrd_roundtrip(tmp_path, dtype, encoding):
    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 100, size=(7, 5, 3))).astype(dtype)
    p = str(tmp_path / "v.nrrd")
    formats.write_nrrd(p, arr, encoding=encoding, keyvals={"who": "test"})
    back, hdr = formats.read_nrrd(p)
    assert back.dtype == np.dtype(dtype).newbyteorder("<") or \
        back.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(back, arr)
    assert hdr["who"] == "test"
    assert [int(s) for s in hdr["sizes"].split()] == [7, 5, 3]


def test_nrrd_fortran_disk_order(tmp_path):
    """First axis fastest on disk — pynrrd's contract, which the
    reference's raveled-index conventions rely on."""
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "v.nrrd")
    formats.write_nrrd(p, arr, encoding="raw")
    raw = open(p, "rb").read().split(b"\n\n", 1)[1]
    flat = np.frombuffer(raw, dtype="<i2")
    # element (1,0,0) is the second value on disk (axis 0 fastest)
    assert flat[0] == arr[0, 0, 0] and flat[1] == arr[1, 0, 0]


def test_nrrd_big_endian_and_aliases(tmp_path):
    arr = np.arange(12, dtype=">i2").reshape(3, 4)
    payload = np.ascontiguousarray(arr.T).tobytes()
    hdr = (b"NRRD0001\n"
           b"type: short\n"
           b"dimension: 2\n"
           b"sizes: 3 4\n"
           b"endian: big\n"
           b"encoding: raw\n\n")
    p = str(tmp_path / "be.nrrd")
    open(p, "wb").write(hdr + payload)
    back, _ = formats.read_nrrd(p)
    np.testing.assert_array_equal(back.astype(np.int16), arr.astype(np.int16))


def test_nrrd_detached_and_ascii(tmp_path):
    arr = np.arange(6, dtype=np.int32).reshape(2, 3)
    # detached raw data file
    open(str(tmp_path / "d.raw"), "wb").write(
        np.ascontiguousarray(arr.T).astype("<i4").tobytes())
    open(str(tmp_path / "d.nhdr"), "wb").write(
        b"NRRD0004\ntype: int\ndimension: 2\nsizes: 2 3\n"
        b"endian: little\nencoding: raw\ndata file: d.raw\n")
    back, _ = formats.read_nrrd(str(tmp_path / "d.nhdr"))
    np.testing.assert_array_equal(back, arr)
    # ascii encoding (values in Fortran order)
    vals = " ".join(str(v) for v in np.ascontiguousarray(arr.T).ravel())
    open(str(tmp_path / "a.nrrd"), "wb").write(
        b"NRRD0001\ntype: int\ndimension: 2\nsizes: 2 3\n"
        b"encoding: ascii\n\n" + vals.encode())
    back, _ = formats.read_nrrd(str(tmp_path / "a.nrrd"))
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(1)
    arr = rng.uniform(0, 50, size=(6, 5, 4)).astype(dtype)
    p = str(tmp_path / ("v" + suffix))
    formats.write_nifti(p, arr, pixdim=(1.0, 1.0, 2.5))
    back = formats.read_nifti(p)
    assert back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_nifti_scaling_and_big_endian(tmp_path):
    """Hand-built header with scl_slope/inter and big-endian layout —
    must match nibabel's np.asanyarray(img.dataobj) semantics."""
    arr = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    for bo in ("<", ">"):
        hdr = bytearray(352)
        struct.pack_into(bo + "i", hdr, 0, 348)
        struct.pack_into(bo + "8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
        struct.pack_into(bo + "h", hdr, 70, 4)       # int16
        struct.pack_into(bo + "h", hdr, 72, 16)
        struct.pack_into(bo + "f", hdr, 108, 352.0)
        struct.pack_into(bo + "2f", hdr, 112, 2.0, -1.0)  # slope, inter
        hdr[344:348] = b"n+1\x00"
        p = str(tmp_path / f"s{bo == '>'}.nii")
        with open(p, "wb") as f:
            f.write(bytes(hdr))
            f.write(np.ascontiguousarray(arr.T).astype(bo + "i2").tobytes())
        back = formats.read_nifti(p)
        assert back.dtype.kind == "f"
        np.testing.assert_allclose(back, arr * 2.0 - 1.0)


def test_registry_fallback_reads_both_formats(tmp_path):
    """read_volume must handle .nrrd/.nii.gz with no optional libs — the
    io.py registry wires the formats.py fallbacks when they are absent."""
    arr = np.arange(60, dtype=np.float32).reshape(5, 4, 3)
    pn = str(tmp_path / "v.nrrd")
    pz = str(tmp_path / "v.nii.gz")
    formats.write_nrrd(pn, arr)
    formats.write_nifti(pz, arr)
    np.testing.assert_array_equal(read_volume(pn), arr)
    np.testing.assert_array_equal(read_volume(pz), arr)


def test_nifti_gz_is_actually_gzipped(tmp_path):
    arr = np.zeros((4, 4), dtype=np.float32)
    p = str(tmp_path / "v.nii.gz")
    formats.write_nifti(p, arr)
    with open(p, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    with gzip.open(p, "rb") as f:
        assert struct.unpack("<i", f.read(4))[0] == 348
