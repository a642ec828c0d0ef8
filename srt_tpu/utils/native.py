"""ctypes bindings for the native host-runtime library (native/).

Loads ``libsrt_native.so`` (building it with make on first use when a
toolchain is present); every entry point has a pure-Python fallback in
utils/obj_loader.py / utils/bvh.py, and tests assert the two produce
identical results.  Use ``SRT_NO_NATIVE=1`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsrt_native.so"))

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SRT_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.srt_obj_load.restype = ctypes.c_void_p
    lib.srt_obj_load.argtypes = [ctypes.c_char_p]
    lib.srt_obj_counts.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int64)
    ] * 3
    lib.srt_obj_arrays.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.srt_obj_material.restype = ctypes.c_int
    lib.srt_obj_material.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.srt_obj_free.argtypes = [ctypes.c_void_p]
    lib.srt_bvh_build.restype = ctypes.c_int64
    lib.srt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _uptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def load_object_native(path: str):
    """Native OBJ load -> MeshData, or None when unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.srt_obj_load(path.encode())
    if not handle:
        return None
    try:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        nm = ctypes.c_int64()
        lib.srt_obj_counts(handle, ctypes.byref(nv), ctypes.byref(nt),
                           ctypes.byref(nm))
        positions = np.empty((nv.value, 3), np.float32)
        uvs = np.empty((nv.value, 2), np.float32)
        tri_vidx = np.empty((nt.value, 3), np.uint32)
        tri_mat = np.empty((nt.value,), np.uint32)
        lib.srt_obj_arrays(handle, _fptr(positions), _fptr(uvs),
                           _uptr(tri_vidx), _uptr(tri_mat))

        from srt_tpu.utils.obj_loader import MaterialDef, MeshData
        materials: List[MaterialDef] = []
        for i in range(nm.value):
            kd = (ctypes.c_float * 3)()
            ks = (ctypes.c_float * 3)()
            ns = ctypes.c_float()
            ut = ctypes.c_int()
            buf = ctypes.create_string_buffer(4096)
            lib.srt_obj_material(handle, i, kd, ks, ctypes.byref(ns),
                                 ctypes.byref(ut), buf, 4096)
            materials.append(MaterialDef(
                diffuse=tuple(kd), specular=tuple(ks),
                specular_ex=float(ns.value),
                use_texture=bool(ut.value),
                texture_path=buf.value.decode() or None,
            ))
        return MeshData(
            positions=positions, uvs=uvs, tri_vidx=tri_vidx, tri_mat=tri_mat,
            materials=materials,
            name=os.path.splitext(os.path.basename(path))[0],
        )
    finally:
        lib.srt_obj_free(handle)


def build_bvh_native(centers: np.ndarray, bounds_min: np.ndarray,
                     bounds_max: np.ndarray, leaf_size: int = 2):
    """Native BVH build -> FlatBVH, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = centers.shape[0]
    centers = np.ascontiguousarray(centers, np.float32)
    bmin = np.ascontiguousarray(bounds_min, np.float32)
    bmax = np.ascontiguousarray(bounds_max, np.float32)
    cap = max(1, 2 * n - 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_first = np.zeros(cap, np.uint32)
    node_count = np.zeros(cap, np.uint32)
    order = np.empty(n, np.uint32)
    used = lib.srt_bvh_build(
        _fptr(centers), _fptr(bmin), _fptr(bmax), n, leaf_size,
        _fptr(node_min), _fptr(node_max), _uptr(node_first),
        _uptr(node_count), _uptr(order),
    )
    from srt_tpu.utils.bvh import FlatBVH
    return FlatBVH(
        node_min=node_min[:used].copy(),
        node_max=node_max[:used].copy(),
        node_first=node_first[:used].copy(),
        node_count=node_count[:used].copy(),
        prim_order=order,
    )
