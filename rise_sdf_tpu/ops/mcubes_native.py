"""ctypes binding for the native marching-tets library.

Builds ``native/libmcubes.so`` on first use (make + g++); falls back by
raising so callers use the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    root = os.path.abspath(root)
    so = os.path.join(root, "libmcubes.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", root], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.mcubes_run.restype = ctypes.c_void_p
    lib.mcubes_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float]
    lib.mcubes_num_verts.restype = ctypes.c_int64
    lib.mcubes_num_verts.argtypes = [ctypes.c_void_p]
    lib.mcubes_num_faces.restype = ctypes.c_int64
    lib.mcubes_num_faces.argtypes = [ctypes.c_void_p]
    lib.mcubes_copy.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int64)]
    lib.mcubes_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def marching_tets_native(level: np.ndarray, threshold: float = 0.0):
    lib = _load()
    level = np.ascontiguousarray(level, np.float32)
    rx, ry, rz = level.shape
    handle = lib.mcubes_run(
        level.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rx, ry, rz, ctypes.c_float(threshold))
    try:
        nv = lib.mcubes_num_verts(handle)
        nf = lib.mcubes_num_faces(handle)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((nf, 3), np.int64)
        if nv:
            lib.mcubes_copy(
                handle, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return verts, faces
    finally:
        lib.mcubes_free(handle)
