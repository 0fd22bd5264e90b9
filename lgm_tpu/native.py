"""ctypes bindings for the native C++ runtime (native/*.cpp).

Two shared libraries, each compiled on first use with g++ (cached next
to the source; no pybind11 in this environment — plain C ABI + ctypes):

- ``meshops``: marching tetrahedra, decimation, weld/clean (the
  reference's PyMCubes/pymeshlab deps, SURVEY.md §2b N5/N11).
- ``dataload``: the data-pipeline hot path — threaded PNG/JPEG decode,
  white-bg composite, bilinear resize (the native half of the
  reference's torch-DataLoader worker pool, SURVEY.md §2a #7/#8).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

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
    lib.lgm_chart_unwrap.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, f32p, ctypes.c_int, f32p, i32p, ip, ip,
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


def chart_unwrap(verts: np.ndarray, faces: np.ndarray,
                 cos_thresh: float = 0.5, margin: float = 0.01
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Chart-based UV atlas (xatlas-class replacement, ref:
    convert.py:370-372): normal-coherent chart growing + per-chart plane
    projection + shelf packing at uniform texel density. Returns
    (verts' [V', 3] with chart-boundary duplication, uv [V', 2] in
    [0, 1]^2, faces [F, 3], n_charts). ``cos_thresh`` bounds a chart's
    normal spread (0.5 = 60 deg from the chart mean), which bounds the
    plane-projection stretch to 1/cos_thresh."""
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    max_v = 3 * len(faces) + 8
    out_v = np.empty((max_v, 3), np.float32)
    out_uv = np.empty((max_v, 2), np.float32)
    out_f = np.empty_like(faces)
    nv = ctypes.c_int()
    nc = ctypes.c_int()
    rc = lib.lgm_chart_unwrap(
        verts, len(verts), faces, len(faces), float(cos_thresh),
        float(margin), out_v, max_v, out_uv, out_f,
        ctypes.byref(nv), ctypes.byref(nc),
    )
    if rc != 0:
        raise RuntimeError(f"chart_unwrap overflow: needs {nv.value} verts")
    return (out_v[: nv.value].copy(), out_uv[: nv.value].copy(),
            out_f.copy(), nc.value)


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


# ---------------------------------------------------------------------------
# Native data loader (native/dataload.cpp)
# ---------------------------------------------------------------------------

_DL_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                       "dataload.cpp")
_DL_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                      "libdataload.so")

_dl_lib = None
_dl_failed = False


def _load_dataload():
    """Compile/load the decode library; returns None if the image
    libraries are unavailable (callers fall back to the cv2 path)."""
    global _dl_lib, _dl_failed
    if _dl_lib is not None or _dl_failed:
        return _dl_lib
    src = os.path.abspath(_DL_SRC)
    so = os.path.abspath(_DL_SO)
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", so, "-lpng", "-ljpeg", "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        _dl_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    ip = ctypes.POINTER(ctypes.c_int)

    lib.lgm_load_views.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int,
        ctypes.c_int, f32p, f32p,
        ctypes.c_int, f32p, f32p,
        u8p, ctypes.c_int,
    ]
    lib.lgm_load_views.restype = ctypes.c_int
    lib.lgm_decode_rgba.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int, ip, ip,
    ]
    lib.lgm_decode_rgba.restype = ctypes.c_int
    _dl_lib = lib
    return lib


def dataload_available() -> bool:
    return _load_dataload() is not None


def load_views(paths: List[str], size_a: int, size_b: int = 0,
               n_threads: int = 4):
    """Decode `len(paths)` images; white-bg composite; bilinear resize
    to ``size_a`` (and optionally ``size_b``). Returns
    (rgb_a [n,Sa,Sa,3], mask_a [n,Sa,Sa], rgb_b|None, mask_b|None,
    ok [n] bool). Unreadable entries have ok=False and undefined pixels
    (callers skip-and-pad, the provider contract)."""
    lib = _load_dataload()
    assert lib is not None, "native dataload unavailable"
    n = len(paths)
    enc = [p.encode() for p in paths]
    offsets = np.zeros(n, np.int64)
    pos = 0
    blob = bytearray()
    for i, e in enumerate(enc):
        offsets[i] = pos
        blob += e + b"\0"
        pos += len(e) + 1
    rgb_a = np.empty((n, size_a, size_a, 3), np.float32)
    mask_a = np.empty((n, size_a, size_a), np.float32)
    if size_b > 0:
        rgb_b = np.empty((n, size_b, size_b, 3), np.float32)
        mask_b = np.empty((n, size_b, size_b), np.float32)
    else:  # dummy 1-elem buffers (the C side never touches them)
        rgb_b = np.empty((1, 1, 1, 3), np.float32)
        mask_b = np.empty((1, 1, 1), np.float32)
    ok = np.zeros(n, np.uint8)
    lib.lgm_load_views(
        bytes(blob), offsets, n, size_a, rgb_a, mask_a,
        size_b, rgb_b, mask_b, ok, n_threads,
    )
    if size_b > 0:
        return rgb_a, mask_a, rgb_b, mask_b, ok.astype(bool)
    return rgb_a, mask_a, None, None, ok.astype(bool)


def decode_rgba(path: str, cap_hw: int = 4096) -> Optional[np.ndarray]:
    """Decode one PNG/JPEG to float RGBA [H, W, 4] in [0, 1] (alpha == 1
    when the file has none). None if unreadable."""
    lib = _load_dataload()
    assert lib is not None, "native dataload unavailable"
    # The C side writes h*w pixels contiguously from the buffer start.
    buf = np.empty(cap_hw * cap_hw * 4, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.lgm_decode_rgba(path.encode(), buf, cap_hw,
                             ctypes.byref(h), ctypes.byref(w))
    if rc == -2:  # retry with the reported size
        cap = max(h.value, w.value)
        buf = np.empty(cap * cap * 4, np.float32)
        rc = lib.lgm_decode_rgba(path.encode(), buf, cap,
                                 ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    n = h.value * w.value * 4
    return buf[:n].reshape(h.value, w.value, 4).copy()


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
