"""ctypes bindings for the native host-side geometry kernels (C++).

Builds ``native/src/ngm_native.cpp`` on demand with g++ (cached as
``native/build/libngm_native.so``) and exposes:

- :func:`marching_tetrahedra`: isosurface extraction from a density block
  (replaces pytorch3d marching_cubes, reference run_mapping.py:2294).
- :func:`rasterize_depth`: double-sided depth rasterization for occlusion
  culling (replaces pyrender/EGL, reference mesh_culling.py:41-120).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Tuple

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "src" / "ngm_native.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "libngm_native.so"

_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.is_file() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", str(_LIB), str(_SRC),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.marching_tetrahedra.restype = ctypes.c_int
        lib.marching_tetrahedra.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # grid
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # nx ny nz
            ctypes.c_float,  # iso
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # verts_out, max_verts
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,  # tris_out, max_tris
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rasterize_depth.restype = None
        lib.rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # verts
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,  # tris
            ctypes.POINTER(ctypes.c_float),  # w2c
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,  # width height
            ctypes.POINTER(ctypes.c_float),  # depth_out
        ]
        _lib = lib
        return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def marching_tetrahedra(
    grid: np.ndarray, isolevel: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface of an (nx, ny, nz) float32 grid.

    Returns:
        verts: (V, 3) float32 in continuous grid-index coordinates (x, y, z).
        tris: (T, 3) int32 vertex indices.
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    lib = _load()
    max_verts = max(1024, 4 * int(np.prod(grid.shape[:2])) * 16)
    max_tris = 2 * max_verts
    while True:
        verts = np.empty((max_verts, 3), np.float32)
        tris = np.empty((max_tris, 3), np.int32)
        nv = ctypes.c_int(0)
        nt = ctypes.c_int(0)
        status = lib.marching_tetrahedra(
            _fptr(grid), nx, ny, nz, ctypes.c_float(isolevel),
            _fptr(verts), max_verts, _iptr(tris), max_tris,
            ctypes.byref(nv), ctypes.byref(nt),
        )
        if status == 0:
            return verts[: nv.value].copy(), tris[: nt.value].copy()
        max_verts *= 2
        max_tris *= 2


def rasterize_depth(
    verts: np.ndarray,
    tris: np.ndarray,
    w2c: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
) -> np.ndarray:
    """Double-sided z-buffer depth map of a mesh from an OpenCV pinhole camera.

    Args:
        verts: (V, 3) float32 world vertices. tris: (T, 3) int32.
        w2c: (4, 4) world-to-camera (OpenCV convention: z forward).

    Returns:
        (height, width) float32 depth (0 where empty).
    """
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    w2c = np.ascontiguousarray(w2c, dtype=np.float32)
    depth = np.zeros((height, width), np.float32)
    lib = _load()
    lib.rasterize_depth(
        _fptr(verts), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris),
        _fptr(w2c),
        ctypes.c_float(fx), ctypes.c_float(fy), ctypes.c_float(cx), ctypes.c_float(cy),
        width, height, _fptr(depth),
    )
    return depth
