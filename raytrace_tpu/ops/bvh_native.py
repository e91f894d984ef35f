"""ctypes bindings for the native binned-SAH BVH builder (csrc/bvh_builder.cc).

Compiles the shared library on first import if it is missing or stale (plain
g++, no external deps). Importing this module raises ImportError/OSError when
no toolchain is available; ops/bvh.py catches that and falls back to the
numpy median-split builder, so the native path is a pure accelerator.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "csrc", "bvh_builder.cc"))
_LIB = os.path.join(_HERE, "_libbvh.so")


def _compile() -> None:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-fPIC", "-shared", "-std=c++17", "-march=native",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SRC):
        raise ImportError(f"native builder source missing: {_SRC}")
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        try:
            _compile()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise ImportError(f"native BVH builder compile failed: {e}") from e
    lib = ctypes.CDLL(_LIB)
    f = lib.build_bvh_sah
    p_f32 = ctypes.POINTER(ctypes.c_float)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    f.restype = ctypes.c_int64
    f.argtypes = [
        p_f32, p_f32, p_f32, ctypes.c_int64, ctypes.c_int32,
        p_f32, p_f32, p_i32, p_i32, p_i32, p_i32, p_i64, p_i32,
    ]
    return lib


_lib = _load()


def build_bvh_sah(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = 4
) -> tuple[dict, np.ndarray]:
    """Binned-SAH build → (flat node arrays, primitive permutation); same
    contract as ops/bvh.build_bvh."""
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    n = v0.shape[0]
    max_nodes = max(1, 2 * n)
    bmin = np.empty((max_nodes, 3), np.float32)
    bmax = np.empty((max_nodes, 3), np.float32)
    right = np.zeros(max_nodes, np.int32)
    first = np.zeros(max_nodes, np.int32)
    count = np.zeros(max_nodes, np.int32)
    axis = np.zeros(max_nodes, np.int32)
    perm = np.empty(n, np.int64)
    max_depth = np.zeros(1, np.int32)

    c = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    n_nodes = _lib.build_bvh_sah(
        c(v0, ctypes.c_float), c(v1, ctypes.c_float), c(v2, ctypes.c_float),
        ctypes.c_int64(n), ctypes.c_int32(leaf_size),
        c(bmin, ctypes.c_float), c(bmax, ctypes.c_float),
        c(right, ctypes.c_int32), c(first, ctypes.c_int32),
        c(count, ctypes.c_int32), c(axis, ctypes.c_int32),
        c(perm, ctypes.c_int64), c(max_depth, ctypes.c_int32),
    )
    n_nodes = int(n_nodes)
    arrays = dict(
        bmin=bmin[:n_nodes].copy(), bmax=bmax[:n_nodes].copy(),
        right=right[:n_nodes].copy(), first=first[:n_nodes].copy(),
        count=count[:n_nodes].copy(), axis=axis[:n_nodes].copy(),
        max_depth=int(max_depth[0]), leaf_size=int(leaf_size),
    )
    return arrays, perm
