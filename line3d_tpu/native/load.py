"""ctypes loader + on-demand builder for the native runtime library.

The reference's host runtime is C++ (SURVEY.md §2); the sequential host
stages here (F-H union-find, event sweep) are likewise native, built with g++
on first use.  Python fallbacks exist for every entry point, so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libline3d_native.so")
_SRC = os.path.join(_HERE, "fh_cluster.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native library.  Returns True when a usable .so exists.

    The .so is machine-local (compiled -march=native) and never shipped —
    an existing binary is reused when it is at least as new as the source;
    with the source absent (installed package) an existing binary is
    trusted as-is.
    """
    have_lib = os.path.exists(_LIB_PATH)
    have_src = os.path.exists(_SRC)
    if have_lib and not force and \
            (not have_src or
             os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return True
    if not have_src:
        return have_lib
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return have_lib and not force


def get_lib():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # stale/foreign binary — rebuild once for this machine
            if not build(force=True):
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.fh_cluster.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_double, i64p]
        lib.fh_cluster.restype = None
        lib.sweep_events.argtypes = [i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     i64p, i64p]
        lib.sweep_events.restype = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.grid_cc_compact.argtypes = [f32p, u8p, f32p, ctypes.c_int64,
                                        ctypes.c_int64, i32p]
        lib.grid_cc_compact.restype = ctypes.c_int64
        lib.region_moments.argtypes = [i32p, f32p, f32p, ctypes.c_int64,
                                       ctypes.c_int64, f64p]
        lib.region_moments.restype = None
        lib.region_extents.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                       f64p, f64p, f64p, f64p, f64p]
        lib.region_extents.restype = None
        _lib = lib
        return _lib
