"""Lazy ctypes build/load of the native host kernels."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None | bool = None  # None = not tried, False = failed


def _build() -> ctypes.CDLL | None:
    src = os.path.join(_SRC_DIR, "map_matcher.cpp")
    out = os.path.join(_SRC_DIR, "_podtpu_native.so")
    if not os.path.exists(out) or (
        os.path.getmtime(out) < os.path.getmtime(src)
    ):
        tmp = tempfile.mktemp(suffix=".so", dir=_SRC_DIR)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, out)
        except (OSError, subprocess.SubprocessError) as exc:
            if os.path.exists(tmp):
                os.unlink(tmp)
            print(f"podtpu.native: build failed ({exc}); using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError as exc:
        print(f"podtpu.native: load failed ({exc}); using numpy fallback")
        return None
    lib.class_tp_fp.restype = ctypes.c_int
    lib.class_tp_fp.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = _build()
            _LIB = lib if lib is not None else False
    return _LIB or None


def native_class_tp_fp(dets: np.ndarray, gts: np.ndarray,
                       iou_threshold: float):
    """Greedy TP/FP matching (dets pre-sorted by -conf). Returns (tp, fp)
    or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    gts = np.ascontiguousarray(gts, np.float32)
    n, m = len(dets), len(gts)
    tp = np.zeros(n, np.float32)
    fp = np.zeros(n, np.float32)
    fptr = ctypes.POINTER(ctypes.c_float)
    rc = lib.class_tp_fp(
        dets.ctypes.data_as(fptr), n,
        gts.ctypes.data_as(fptr), m,
        ctypes.c_float(iou_threshold),
        tp.ctypes.data_as(fptr), fp.ctypes.data_as(fptr),
    )
    if rc != 0:  # pragma: no cover
        return None
    return tp, fp
