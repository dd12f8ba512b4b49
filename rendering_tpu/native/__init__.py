"""ctypes bindings for the native host runtime (native/rt_native.cpp).

Provides drop-in fast paths for OBJ loading and SAH BVH construction
with bit-identical float32 results to the numpy implementations (the
contract is tested in tests/test_native.py). Falls back silently to
Python when the shared library isn't built; set RTPU_NATIVE=0 to force
the Python paths.

Build: `make -C native` (done automatically on first import when a
compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SO = os.path.join(_HERE, "librt_native.so")

_lib = None


def _try_build() -> bool:
    src = os.path.join(_REPO, "native", "rt_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("RTPU_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.rtn_load_obj.restype = ctypes.c_void_p
    lib.rtn_load_obj.argtypes = [ctypes.c_char_p, f32p, f32p, f32p,
                                 ctypes.c_float]
    lib.rtn_mesh_ntris.restype = ctypes.c_int64
    lib.rtn_mesh_ntris.argtypes = [ctypes.c_void_p]
    lib.rtn_mesh_copy.argtypes = [ctypes.c_void_p] + [f32p] * 6
    lib.rtn_mesh_free.argtypes = [ctypes.c_void_p]

    lib.rtn_build_bvh.restype = ctypes.c_void_p
    lib.rtn_build_bvh.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int,
                                  ctypes.c_int]
    lib.rtn_bvh_sizes.argtypes = [ctypes.c_void_p] + [i64p] * 5
    lib.rtn_bvh_copy.argtypes = [ctypes.c_void_p, f32p, f32p, i32p, i32p,
                                 i32p, i32p, i32p, f32p, f32p]
    lib.rtn_bvh_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_obj_native(path: str, size, rmat9: np.ndarray, pos, bias: float):
    """Returns the same tuple layout as the Python loader's MeshArrays
    fields, or None if unavailable / file missing."""
    lib = get_lib()
    if lib is None:
        return None
    size = np.ascontiguousarray(size, np.float32)
    rmat = np.ascontiguousarray(rmat9, np.float32).reshape(9)
    pos = np.ascontiguousarray(pos, np.float32)
    h = lib.rtn_load_obj(path.encode(), _fp(size), _fp(rmat), _fp(pos),
                         ctypes.c_float(bias))
    if not h:
        return None
    try:
        t = int(lib.rtn_mesh_ntris(h))
        v = np.empty((t, 3, 3), np.float32)
        n = np.empty((t, 3, 3), np.float32)
        uv = np.empty((t, 3, 2), np.float32)
        tangent = np.empty((t, 3), np.float32)
        bitangent = np.empty((t, 3), np.float32)
        bounds = np.empty((2, 3), np.float32)
        lib.rtn_mesh_copy(h, _fp(v), _fp(n), _fp(uv), _fp(tangent),
                          _fp(bitangent), _fp(bounds))
        return v, n, uv, tangent, bitangent, bounds
    finally:
        lib.rtn_mesh_free(h)


def build_bvh_native(tri_v: np.ndarray, root_bounds: np.ndarray,
                     ac_penalty: int, leaf_chunk: int):
    """Returns a dict of FlatBVH fields, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tri_v = np.ascontiguousarray(tri_v, np.float32)
    bounds = np.ascontiguousarray(root_bounds, np.float32).reshape(6)
    t = tri_v.shape[0]
    h = lib.rtn_build_bvh(_fp(tri_v), ctypes.c_int64(t), _fp(bounds),
                          ctypes.c_int(ac_penalty), ctypes.c_int(leaf_chunk))
    if not h:
        return None
    try:
        n_nodes = ctypes.c_int64()
        n_leaf = ctypes.c_int64()
        n_real = ctypes.c_int64()
        copies = ctypes.c_int64()
        n_tris = ctypes.c_int64()
        lib.rtn_bvh_sizes(h, ctypes.byref(n_nodes), ctypes.byref(n_leaf),
                          ctypes.byref(n_real), ctypes.byref(copies),
                          ctypes.byref(n_tris))
        nn, nl = int(n_nodes.value), int(n_leaf.value)
        node_min = np.empty((nn, 3), np.float32)
        node_max = np.empty((nn, 3), np.float32)
        skip = np.empty((nn,), np.int32)
        leaf_start = np.empty((nn,), np.int32)
        leaf_count = np.empty((nn,), np.int32)
        real_flag = np.empty((nn,), np.int32)
        leaf_tris = np.empty((nl,), np.int32)
        reach_lo = np.empty((t, 3), np.float32)
        reach_hi = np.empty((t, 3), np.float32)
        lib.rtn_bvh_copy(h, _fp(node_min), _fp(node_max), _ip(skip),
                         _ip(leaf_start), _ip(leaf_count), _ip(real_flag),
                         _ip(leaf_tris), _fp(reach_lo), _fp(reach_hi))
        return dict(
            node_min=node_min, node_max=node_max, skip=skip,
            leaf_start=leaf_start, leaf_count=leaf_count,
            real_flag=real_flag, leaf_tris=leaf_tris,
            n_real_nodes=int(n_real.value), tri_copies=int(copies.value),
            leaf_chunk=leaf_chunk, reach_lo=reach_lo, reach_hi=reach_hi,
        )
    finally:
        lib.rtn_bvh_free(h)
