"""ctypes bindings for the native data-path library (native/nifti_native.cc).

Transparent acceleration of the host-side hot path (gzip NIfTI decode +
window-norm + label remap + one-hot); every entry point falls back to the
pure-Python implementations when the library is absent.  Build with
`make -C native` (auto-attempted once on import)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "read_nifti_native", "write_nifti_native",
           "window_norm_native", "remap_labels_native", "one_hot_native"]

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libjig_native.so"
_lib = None
_tried = False


class _Info(ctypes.Structure):
    _fields_ = [
        ("ndim", ctypes.c_int32),
        ("shape", ctypes.c_int64 * 8),
        ("spacing", ctypes.c_float * 8),
        ("datatype", ctypes.c_int32),
        ("error", ctypes.c_int32),
    ]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:  # one best-effort build
            subprocess.run(["make", "-C", str(_LIB_PATH.parent)], capture_output=True, timeout=120)
        except Exception:
            pass
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.jig_read_nifti.restype = ctypes.c_int32
        lib.jig_read_nifti.argtypes = [ctypes.c_char_p, ctypes.POINTER(_Info), ctypes.POINTER(ctypes.c_float)]
        lib.jig_window_norm.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float, ctypes.c_float]
        lib.jig_remap_labels.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.jig_one_hot.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ]
        try:  # absent from pre-writer builds of the .so — degrade to read-only
            lib.jig_write_nifti.restype = ctypes.c_int32
            lib.jig_write_nifti.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ]
            lib._jig_has_write = True
        except AttributeError:
            lib._jig_has_write = False
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def read_nifti_native(path) -> Optional[Tuple[np.ndarray, dict]]:
    """Returns (float32 volume indexed [..., z, y, x], info) or None if
    unavailable/unsupported. Matches data/nifti.py:read_nifti: the array is
    the reversed-header-axis (SimpleITK) layout; spacing stays (dx,dy,dz)."""
    lib = _load()
    if lib is None:
        return None
    info = _Info()
    rc = lib.jig_read_nifti(str(path).encode(), ctypes.byref(info), None)
    if rc != 0:
        return None
    # info.shape holds header (x, y, z) dims; the C reader emits the raw
    # Fortran buffer, which in C order is the reversed-dims (z, y, x) array
    shape = tuple(int(info.shape[i]) for i in range(info.ndim))[::-1]
    out = np.empty(shape, np.float32)
    rc = lib.jig_read_nifti(
        str(path).encode(), ctypes.byref(info), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        return None
    spacing = tuple(float(info.spacing[i]) for i in range(min(info.ndim, 3)))
    return out, {"spacing": spacing, "affine": None}


def window_norm_native(img: np.ndarray, window_pos: float = 60.0, window_width: float = 360.0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    lib.jig_window_norm(img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), img.size,
                        ctypes.c_float(window_pos), ctypes.c_float(window_width))
    return img


def remap_labels_native(seg: np.ndarray, tumor: Optional[np.ndarray], designated, tumor_class: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    seg = np.ascontiguousarray(seg, np.float32)
    out = np.empty(seg.shape, np.int32)
    des = np.asarray(designated, np.int32)
    tptr = None
    if tumor is not None:
        tumor = np.ascontiguousarray(tumor, np.float32)
        tptr = tumor.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.jig_remap_labels(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), seg.size,
        des.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(des), tumor_class,
    )
    return out


def one_hot_native(labels: np.ndarray, num_classes: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    out = np.empty(labels.shape + (num_classes,), np.float32)
    lib.jig_one_hot(labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), labels.size, num_classes)
    return out


# NIfTI datatype codes for the write path (subset the writer supports;
# mirrors data/nifti.py _DTYPE_CODES)
_WRITE_CODES = {
    np.dtype(np.uint8): 2, np.dtype(np.int16): 4, np.dtype(np.int32): 8,
    np.dtype(np.float32): 16, np.dtype(np.float64): 64,
    np.dtype(np.int8): 256, np.dtype(np.uint16): 512, np.dtype(np.uint32): 768,
    np.dtype(np.int64): 1024, np.dtype(np.uint64): 1280,
}


def write_nifti_native(path, data: np.ndarray, spacing=None, affine=None,
                       level: int = 1) -> bool:
    """Native .nii/.nii.gz write (header + deflate, GIL-free; data is
    [..., z, y, x] so its C buffer is already the file's Fortran voxel
    order).  Byte-compatible with data/nifti.py:write_nifti; `level` is
    the gzip level (1 = fast, the right trade for noisy CT floats).
    Returns False when the library (or this symbol) is unavailable so the
    caller can fall back to the Python codec."""
    lib = _load()
    if lib is None or not getattr(lib, "_jig_has_write", False):
        return False
    data = np.ascontiguousarray(data)
    if data.dtype == np.bool_:
        data = data.astype(np.uint8)
    if data.dtype not in _WRITE_CODES:
        data = np.ascontiguousarray(data, dtype=np.float32)
    shape = (ctypes.c_int64 * data.ndim)(*data.shape)
    spacing = tuple(spacing or (1.0,) * min(data.ndim, 3))
    spc = (ctypes.c_float * len(spacing))(*[float(s) for s in spacing])
    aff_ptr = None
    if affine is not None:
        rows = np.asarray(affine, np.float32)[:3].reshape(-1)
        aff_ptr = (ctypes.c_float * 12)(*rows)
    rc = lib.jig_write_nifti(
        str(path).encode(), data.ctypes.data_as(ctypes.c_void_p), shape,
        data.ndim, _WRITE_CODES[data.dtype], spc, len(spacing), aff_ptr,
        int(level))
    return rc == 0
