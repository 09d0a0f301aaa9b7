"""ctypes bindings for the native binned-SAH builder.

Build with `make -C native` (g++, no extra deps). `accel/sah.py` auto-uses
this when the .so is present; the numpy builder stays the fallback and
semantic reference.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libbvh_native.so")
    if not os.path.exists(path):
        raise ImportError(f"native builder not built ({path}); run make -C native")
    lib = ctypes.CDLL(path)
    lib.lumen_build_sah.restype = ctypes.c_int
    lib.lumen_build_sah.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def build_sah(tri_pos: np.ndarray, leaf_size: int = 4):
    """Same contract as `accel.sah.build_sah_arrays`."""
    lib = _load()
    tp = np.ascontiguousarray(tri_pos, np.float32)
    n = tp.shape[0]
    max_nodes = max(2 * n, 16)
    max_slots = max(
        ((2 * n + leaf_size - 1) // leaf_size + 2) * leaf_size, 4 * leaf_size
    )
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    child0 = np.empty(max_nodes, np.int32)
    child1 = np.empty(max_nodes, np.int32)
    order = np.empty(max_slots, np.int32)
    n_nodes = ctypes.c_int32()
    n_leaves = ctypes.c_int32()
    max_depth = ctypes.c_int32()
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.lumen_build_sah(
        fp(tp), n, leaf_size,
        fp(node_lo), fp(node_hi), ip(child0), ip(child1), ip(order),
        max_nodes, max_slots,
        ctypes.byref(n_nodes), ctypes.byref(n_leaves), ctypes.byref(max_depth),
    )
    if rc != 0:
        raise RuntimeError(f"lumen_build_sah failed with code {rc}")
    nn = n_nodes.value
    nl = n_leaves.value
    return (
        node_lo[:nn].copy(),
        node_hi[:nn].copy(),
        child0[:nn].copy(),
        child1[:nn].copy(),
        order[: nl * leaf_size].astype(np.int64),
        int(max_depth.value),
    )
