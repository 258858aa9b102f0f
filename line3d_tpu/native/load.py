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
_SRCS = [os.path.join(_HERE, "fh_cluster.cpp"),
         os.path.join(_HERE, "affinity_enum.cpp")]

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
    srcs = [s for s in _SRCS if os.path.exists(s)]
    if have_lib and not force and \
            (not srcs or
             os.path.getmtime(_LIB_PATH) >= max(os.path.getmtime(s)
                                                for s in srcs)):
        return True
    if not srcs:
        return have_lib
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-fopenmp", "-o", _LIB_PATH] + srcs,
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
        if hasattr(lib, "sweep_events_batched"):
            lib.sweep_events_batched.argtypes = [
                i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i64p, i64p, i64p]
            lib.sweep_events_batched.restype = ctypes.c_int64
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
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        # NOTE: when a C function's ABI changes, RENAME the symbol (e.g.
        # affinity_enumerate -> affinity_enumerate_packed): the loader
        # trusts prebuilt source-absent binaries, and the hasattr gates
        # below are the only thing keeping a stale .so from being called
        # with the wrong argument layout.
        if hasattr(lib, "affinity_enumerate_packed"):
            lib.affinity_enumerate_packed.argtypes = [
                i64p, i64p, ctypes.c_int64,          # key_sorted, rows, B
                i64p, ctypes.c_int64,                # allp_packed, P
                i64p,                                # row_lookup
                i64p, i64p, f64p,                    # coll csr
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # S, M, exp
                i64p, i64p, i8p, f64p]               # outputs
            lib.affinity_enumerate_packed.restype = ctypes.c_int64
        if hasattr(lib, "affinity_similarity"):
            lib.affinity_similarity.argtypes = [
                i64p, i64p, ctypes.c_int64,
                f64p, f64p, f64p, f32p, f32p, i32p,
                f64p, f64p, f64p, ctypes.c_double, f64p]
            lib.affinity_similarity.restype = None
        if hasattr(lib, "affinity_capacity"):
            lib.affinity_capacity.argtypes = [i64p, ctypes.c_int64, i64p,
                                              ctypes.c_int64]
            lib.affinity_capacity.restype = ctypes.c_int64
        if hasattr(lib, "affinity_finalize"):
            lib.affinity_finalize.argtypes = [
                i64p, i64p, i8p, f64p, ctypes.c_int64,   # candidates
                f32p, ctypes.c_int64,                    # score, B
                f64p, f64p, f64p, f32p, f32p, i32p,      # best arrays
                f64p, f64p, f64p,                        # camera arrays
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                i32p, i32p, f32p, i64p,                  # outputs
                np.ctypeslib.ndpointer(np.int64, shape=(1,),
                                       flags="C_CONTIGUOUS")]
            lib.affinity_finalize.restype = ctypes.c_int64
        if hasattr(lib, "affinity_weights_range"):
            lib.affinity_weights_range.argtypes = [
                i64p, i64p, i8p, f64p,                   # candidates
                ctypes.c_int64, ctypes.c_int64,          # lo, hi
                f32p,                                    # score
                f64p, f64p, f64p, f32p, f32p, i32p,      # best arrays
                f64p, f64p, f64p,                        # camera arrays
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                f64p]                                    # w_out [hi-lo]
            lib.affinity_weights_range.restype = None
        if hasattr(lib, "affinity_emit"):
            lib.affinity_emit.argtypes = [
                f64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                i32p, i32p, f32p, i64p,
                np.ctypeslib.ndpointer(np.int64, shape=(1,),
                                       flags="C_CONTIGUOUS")]
            lib.affinity_emit.restype = ctypes.c_int64
        if hasattr(lib, "lsd_carve"):
            lib.lsd_carve.argtypes = [
                f32p, f32p, i32p, u8p, ctypes.c_int64,       # norm, angle,
                ctypes.c_int64, ctypes.c_int64,              # labels, fail
                ctypes.c_double, ctypes.c_double,            # prec, dens_th
                ctypes.c_int64, f64p, ctypes.c_int64]        # min_sz, out
            lib.lsd_carve.restype = ctypes.c_int64
        if hasattr(lib, "sort_unique_i64"):
            lib.sort_unique_i64.argtypes = [i64p, ctypes.c_int64]
            lib.sort_unique_i64.restype = ctypes.c_int64
        if hasattr(lib, "native_set_num_threads"):
            lib.native_set_num_threads.argtypes = [ctypes.c_int64]
            lib.native_set_num_threads.restype = None
        if hasattr(lib, "lsd_front"):
            lib.lsd_front.argtypes = [
                f32p, ctypes.c_int64, ctypes.c_int64,        # img, H, W
                f32p, ctypes.c_int64,                        # kern, nk
                i32p, f32p, ctypes.c_int64, ctypes.c_int64,  # iy, wy, oh, ty
                i32p, f32p, ctypes.c_int64, ctypes.c_int64,  # ix, wx, ow, tx
                ctypes.c_double, ctypes.c_float,             # rho, notdef
                f32p, f32p, u8p]                             # norm/angle/def
            lib.lsd_front.restype = ctypes.c_int64
        _lib = lib
        return _lib
