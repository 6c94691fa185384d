"""Minimal self-contained NIfTI-1 reader/writer (pure numpy + gzip).

The reference reads/writes volumes through nibabel and SimpleITK
(ccdm/datasets/ruijin.py:104-118, ccdm/ddpm/evaluator.py:141-148); neither
library is available here, so the framework carries its own NIfTI-1 codec.
Supports .nii / .nii.gz, the common scalar dtypes, scl_slope/inter
scaling, and pixdim spacing — everything the pipelines need.

NIfTI-1 layout: 348-byte header (+4 byte extension flag), voxel data at
`vox_offset`, Fortran (column-major) voxel order.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["read_nifti", "write_nifti"]

# NIfTI-1 datatype codes
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _open(path, mode: str):
    p = str(path)
    if p.endswith(".gz"):
        if "w" in mode:
            # level 1: ~5-10x faster than the gzip default (9) and near-equal
            # size on noisy CT float payloads — 3.4 s -> sub-second for a
            # 128x256x256 volume on the single-core hosts fronting TPUs
            return gzip.open(p, mode, compresslevel=1)
        return gzip.open(p, mode)
    return open(p, mode)


def read_nifti(path) -> Tuple[np.ndarray, dict]:
    """Returns (data, header_info) with data in C-order indexed [..., z, y, x]
    (reversed header-axis order — the SimpleITK GetArrayFromImage convention
    the reference loaders operate in, so axis 0 of a 3D volume is z/depth)
    and header_info = {'spacing': (dx,dy,dz), 'affine': 4x4 or None}.
    Spacing stays in world/header order (x, y, z), as SimpleITK's GetSpacing."""
    with _open(path, "rb") as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            sizeof_hdr = struct.unpack(">i", hdr[0:4])[0]
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            endian = ">"
        magic = hdr[344:348]
        if magic not in (b"n+1\x00", b"ni1\x00"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

        dim = struct.unpack(endian + "8h", hdr[40:56])
        ndim = dim[0]
        shape = dim[1 : 1 + ndim]
        datatype = struct.unpack(endian + "h", hdr[70:72])[0]
        pixdim = struct.unpack(endian + "8f", hdr[76:108])
        vox_offset = int(struct.unpack(endian + "f", hdr[108:112])[0])
        scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
        scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
        srow = np.frombuffer(hdr[280:328], dtype=endian + "f4").reshape(3, 4)
        sform_code = struct.unpack(endian + "h", hdr[254:256])[0]

        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)

        f.read(max(vox_offset - 348, 0))
        count = int(np.prod(shape))
        raw = f.read(count * dtype.itemsize)
        data = np.frombuffer(raw, dtype=dtype, count=count)
        # NIfTI voxel order is Fortran (x fastest): a C-order reshape to the
        # reversed dims is exactly the (z, y, x) layout — no transpose needed
        data = data.reshape(shape[::-1])

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter

    affine = None
    if sform_code > 0:
        affine = np.vstack([srow, [0, 0, 0, 1]]).astype(np.float32)
    info = {"spacing": tuple(float(p) for p in pixdim[1 : 1 + min(ndim, 3)]), "affine": affine}
    return np.ascontiguousarray(data), info


def write_nifti(path, data: np.ndarray, spacing: Optional[Tuple[float, ...]] = None, affine=None) -> None:
    """Write a NIfTI-1 (.nii or .nii.gz) volume.

    `data` is indexed [..., z, y, x] (read_nifti's convention); header dims
    are the reversed shape, so a (D, H, W) volume stores as nx=W, ny=H, nz=D
    and opens correctly oriented in standard viewers. `spacing` stays in
    world order (dx, dy, dz).

    Routes through the native writer (native/nifti_native.cc:jig_write_nifti —
    GIL-free deflate, so serving writer threads overlap with device compute)
    when the library is built, with this pure-Python codec as the
    byte-compatible fallback."""
    data = np.asarray(data)
    try:
        from .native import write_nifti_native

        if write_nifti_native(path, data, spacing=spacing, affine=affine):
            return
    except Exception:
        pass  # fall through to the pure-Python writer
    if data.dtype == np.bool_:
        data = data.astype(np.uint8)
    if data.dtype not in _DTYPE_CODES:
        data = data.astype(np.float32)
    ndim = data.ndim
    shape = data.shape
    spacing = tuple(spacing or (1.0,) * min(ndim, 3))

    hdr = bytearray(352)  # 348 header + 4-byte extension flag (zeros)
    struct.pack_into("<i", hdr, 0, 348)
    dim = [ndim] + list(shape[::-1]) + [1] * (7 - ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, _DTYPE_CODES[data.dtype])
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    pixdim = [1.0] + list(spacing) + [1.0] * (7 - len(spacing))
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    # sform: diag(spacing) unless an affine is given
    if affine is None:
        affine = np.eye(4, dtype=np.float32)
        for i in range(min(3, len(spacing))):
            affine[i, i] = spacing[i]
    struct.pack_into("<h", hdr, 252, 1)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<12f", hdr, 280, *np.asarray(affine, np.float32)[:3].reshape(-1))
    hdr[344:348] = b"n+1\x00"

    # C-order ravel of (..., z, y, x) IS Fortran order of the (x, y, z) dims
    payload = np.ascontiguousarray(data).reshape(-1)
    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(payload.tobytes())
