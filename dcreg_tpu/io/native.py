"""ctypes bindings to the native host runtime (native/dcreg_native.cpp).

Provides the C++ tier of the framework's host side -- the components the
reference implements with PCL/FLANN C++ (PCD IO, exact KD-tree NN, voxel
downsampling; utils.hpp:393-424, icp_test_runner loaders).  The library is
compiled on first use with g++ (no external deps); every entry point has a
pure-Python/JAX fallback, so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _build_and_load():
    so = os.path.join(_SRC_DIR, "libdcreg_native.so")
    src = os.path.join(_SRC_DIR, "dcreg_native.cpp")
    if not os.path.exists(so) or (os.path.exists(src) and
                                  os.path.getmtime(src) > os.path.getmtime(so)):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _SRC_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    lib = ctypes.CDLL(so)
    lib.pcd_read.restype = ctypes.c_void_p
    lib.pcd_read.argtypes = [ctypes.c_char_p]
    lib.pcd_num_points.restype = ctypes.c_int64
    lib.pcd_num_points.argtypes = [ctypes.c_void_p]
    lib.pcd_has_intensity.restype = ctypes.c_int
    lib.pcd_has_intensity.argtypes = [ctypes.c_void_p]
    lib.pcd_copy_xyz.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pcd_copy_intensity.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.pcd_free.argtypes = [ctypes.c_void_p]
    lib.pcd_write.restype = ctypes.c_int
    lib.pcd_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_knn.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_void_p]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_float, ctypes.c_void_p]
    lib.dcreg_last_error.restype = ctypes.c_char_p
    return lib


def get_lib():
    """The loaded native library, building it on first call; None if the
    toolchain or sources are unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
        return _LIB


def available() -> bool:
    return get_lib() is not None


def pcd_read_native(path):
    """Parse a PCD via the C++ reader -> dict(xyz (N,3) f32, intensity?).

    Raises RuntimeError (with the C++ error string) on malformed files."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.pcd_read(str(path).encode())
    if not h:
        raise RuntimeError(f"pcd_read failed: "
                           f"{lib.dcreg_last_error().decode()}")
    try:
        n = lib.pcd_num_points(h)
        xyz = np.empty((n, 3), np.float32)
        lib.pcd_copy_xyz(h, xyz.ctypes.data_as(ctypes.c_void_p))
        out = {"xyz": xyz}
        if lib.pcd_has_intensity(h):
            inten = np.empty(n, np.float32)
            lib.pcd_copy_intensity(h, inten.ctypes.data_as(ctypes.c_void_p))
            out["intensity"] = inten
        return out
    finally:
        lib.pcd_free(h)


def pcd_write_native(path, xyz, intensity=None, binary=True):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    ip = None
    if intensity is not None:
        intensity = np.ascontiguousarray(np.asarray(intensity, np.float32))
        ip = intensity.ctypes.data_as(ctypes.c_void_p)
    rc = lib.pcd_write(str(path).encode(),
                       xyz.ctypes.data_as(ctypes.c_void_p), ip,
                       xyz.shape[0], 1 if binary else 0)
    if rc != 0:
        raise RuntimeError(f"pcd_write failed: "
                           f"{lib.dcreg_last_error().decode()}")


class KDTree:
    """Exact host-side KD-tree (the pcl::KdTreeFLANN analogue); used as the
    NN oracle in tests and for host-side map preprocessing."""

    def __init__(self, points):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(np.asarray(points, np.float32))
        self._h = lib.kdtree_build(
            self._pts.ctypes.data_as(ctypes.c_void_p), self._pts.shape[0])

    def knn(self, queries, k=5):
        q = np.ascontiguousarray(np.asarray(queries, np.float32))
        nq = q.shape[0]
        idx = np.empty((nq, k), np.int32)
        d2 = np.empty((nq, k), np.float32)
        self._lib.kdtree_knn(self._h, q.ctypes.data_as(ctypes.c_void_p),
                             nq, k, idx.ctypes.data_as(ctypes.c_void_p),
                             d2.ctypes.data_as(ctypes.c_void_p))
        return d2, idx

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.kdtree_free(self._h)
        except Exception:
            pass


def voxel_downsample_native(xyz, voxel_size):
    """Centroid-per-voxel downsampling (map preparation)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    out = np.empty_like(xyz)
    m = lib.voxel_downsample(xyz.ctypes.data_as(ctypes.c_void_p),
                             xyz.shape[0], ctypes.c_float(voxel_size),
                             out.ctypes.data_as(ctypes.c_void_p))
    return out[:m].copy()
