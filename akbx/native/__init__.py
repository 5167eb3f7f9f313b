"""Native (C++/OpenMP) runtime components, loaded via ctypes.

No pybind11 in this image; the shared library exposes a C ABI and is
compiled on first use (g++ -O3 -fopenmp) into ``~/.cache/akbx_native``.
``available()`` gates callers so pure-Python environments degrade
gracefully.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "huygens.cpp")
_lib = None
_load_error: str | None = None


def _build_dir() -> str:
    d = os.environ.get("AKBX_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/akbx_native"))
    os.makedirs(d, exist_ok=True)
    return d


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_build_dir(), f"libakbx_huygens_{digest}.so")


def _compile(path: str):
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", path]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    """Load (building if needed) the native library; returns ctypes lib."""
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        raise RuntimeError(_load_error)
    path = _lib_path()
    try:
        if not os.path.exists(path):
            _compile(path)
        lib = ctypes.CDLL(path)
    except (subprocess.CalledProcessError, OSError) as e:
        _load_error = f"native build failed: {e}"
        raise RuntimeError(_load_error) from e

    lib.huygens_propagate.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.huygens_propagate.restype = None
    lib.calc_ds.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                            ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    lib.calc_ds.restype = None
    lib.num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def huygens_propagate(tgt_pts, src_pts, w_re, w_im, k: float):
    """f64 OpenMP Huygens sum.  Arrays are (3, N)/(3, M) float64."""
    lib = load()
    tgt = np.ascontiguousarray(tgt_pts, dtype=np.float64)
    src = np.ascontiguousarray(src_pts, dtype=np.float64)
    wr = np.ascontiguousarray(w_re, dtype=np.float64)
    wi = np.ascontiguousarray(w_im, dtype=np.float64)
    n = tgt.shape[1]
    m = src.shape[1]
    out_re = np.empty(n, dtype=np.float64)
    out_im = np.empty(n, dtype=np.float64)
    lib.huygens_propagate(_ptr(tgt), n, _ptr(src), m, _ptr(wr), _ptr(wi),
                          float(k), _ptr(out_re), _ptr(out_im))
    return out_re, out_im


def calc_ds(points, n_v: int, n_h: int) -> np.ndarray:
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty(n_v * n_h, dtype=np.float64)
    lib.calc_ds(_ptr(pts), n_v, n_h, _ptr(out))
    return out


def num_threads() -> int:
    return int(load().num_threads())
