"""ctypes bindings for the native C++ mesh operations (native/meshops.cpp).

The shared library is compiled on first use with g++ (cached next to the
source; no pybind11 in this environment — plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "meshops.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libmeshops.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True,
        )
    lib = ctypes.CDLL(so)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    ip = ctypes.POINTER(ctypes.c_int)

    lib.lgm_marching_tetrahedra.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        f32p, ctypes.c_int, i32p, ctypes.c_int, ip, ip,
    ]
    lib.lgm_decimate_cluster.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_float,
        f32p, i32p, ip, ip,
    ]
    lib.lgm_weld_and_clean.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_float,
        f32p, i32p, ip, ip,
    ]
    _lib = lib
    return lib


def marching_cubes(grid: np.ndarray, iso: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of a [nx, ny, nz] density grid at level ``iso``.
    Returns (verts [V, 3] in grid-index coordinates, faces [F, 3] int32).
    Implemented as marching tetrahedra (see native/meshops.cpp)."""
    lib = _load()
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    cap_v, cap_f = 1 << 20, 1 << 21
    for _ in range(4):
        verts = np.empty((cap_v, 3), np.float32)
        faces = np.empty((cap_f, 3), np.int32)
        nv = ctypes.c_int()
        nf = ctypes.c_int()
        rc = lib.lgm_marching_tetrahedra(
            grid, nx, ny, nz, float(iso), verts, cap_v, faces, cap_f,
            ctypes.byref(nv), ctypes.byref(nf),
        )
        if rc == 0:
            return verts[: nv.value].copy(), faces[: nf.value].copy()
        cap_v = max(cap_v * 2, nv.value + 1)
        cap_f = max(cap_f * 2, nf.value + 1)
    raise RuntimeError("marching tetrahedra output exceeded retry caps")


def decimate(verts: np.ndarray, faces: np.ndarray, cell: float
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform-grid vertex-clustering decimation (cell in mesh units)."""
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    lib.lgm_decimate_cluster(
        verts, len(verts), faces, len(faces), float(cell), out_v, out_f,
        ctypes.byref(nv), ctypes.byref(nf),
    )
    v, f = out_v[: nv.value].copy(), out_f[: nf.value].copy()
    return clean(v, f, eps=0.0)[0:2]


def clean(verts: np.ndarray, faces: np.ndarray, eps: float = 1e-5
          ) -> Tuple[np.ndarray, np.ndarray]:
    """Weld near-duplicate vertices, drop degenerate faces and
    unreferenced vertices (kiui clean_mesh equivalent)."""
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    lib.lgm_weld_and_clean(
        verts, len(verts), faces, len(faces), float(eps), out_v, out_f,
        ctypes.byref(nv), ctypes.byref(nf),
    )
    return out_v[: nv.value].copy(), out_f[: nf.value].copy()


def decimate_to_target(verts: np.ndarray, faces: np.ndarray,
                       target_faces: int, iters: int = 8
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Binary-search the clustering cell size for ~target face count
    (the reference targets 5e4 faces, convert.py:296)."""
    if len(faces) <= target_faces:
        return verts, faces
    ext = verts.max(0) - verts.min(0)
    lo, hi = 1e-4 * ext.max(), 0.3 * ext.max()
    best = (verts, faces)
    for _ in range(iters):
        cell = float(np.sqrt(lo * hi))
        v, f = decimate(verts, faces, cell)
        if len(f) > target_faces:
            lo = cell
            best = (v, f)
        else:
            hi = cell
            best = (v, f)
            if len(f) > 0.5 * target_faces:
                break
    return best
