"""Marching-cubes bindings: native C++ core (``native/marching_cubes.cpp``)
compiled on first use with g++ and loaded via ctypes.

Replaces the reference's ``mcubes.marching_cubes`` dependency
(``nerf/utils.py:198``) — this image does not vendor PyMCubes, and mesh
extraction is a host-side O(res^3) scan where native code is the right tool.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_lib():
    src = os.path.join(_repo_root(), "native", "marching_cubes.cpp")
    out = os.path.join(_repo_root(), "native", "libmarching_cubes.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        )
    return out


def _get_lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.mc_run.restype = ctypes.c_int
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
    return _LIB


def marching_cubes(field, iso):
    """field: [nx, ny, nz] float32 numpy.  Returns (verts [V, 3] in grid
    coords, tris [T, 3] int32)."""
    lib = _get_lib()
    field = np.ascontiguousarray(field, np.float32)
    nx, ny, nz = field.shape
    # generous bounds: <= 3 verts & 5 tris per cube on the surface
    max_verts = max(1024, int(field.size * 3))
    max_tris = max(1024, int(field.size * 5))
    verts = np.empty((max_verts, 3), np.float32)
    tris = np.empty((max_tris, 3), np.int32)
    nverts = ctypes.c_long(0)
    ntris = ctypes.c_long(0)
    rc = lib.mc_run(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, float(iso),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_verts, ctypes.byref(nverts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_tris, ctypes.byref(ntris),
    )
    if rc != 0:
        raise RuntimeError(f"marching_cubes buffer overflow (rc={rc})")
    return verts[: nverts.value].copy(), tris[: ntris.value].copy()
