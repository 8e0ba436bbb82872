"""ctypes loader for the native ingest/IO helpers (``ifcb_native.cpp``).

``lib()`` returns the loaded library or ``None`` — every caller keeps a
pure-NumPy fallback, so the framework works without a compiler; the native
path is a host-throughput optimization. The shared object is built on first
use with the bundled Makefile (``g++`` is assumed present on build hosts).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libifcb_native.so"
_lib = None
_tried = False


def lib():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.is_file():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_HERE, check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        handle = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    handle.adc_count_rows.restype = ctypes.c_longlong
    handle.adc_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
    handle.adc_parse.restype = ctypes.c_longlong
    handle.adc_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
    ]
    handle.format_probs.restype = ctypes.c_longlong
    handle.format_probs.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_char_p,
        ctypes.c_longlong,
    ]
    _lib = handle
    return _lib


def _ll_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def adc_parse(raw: bytes):
    """(widths, heights, starts) int64 arrays, or None if native unavailable."""
    handle = lib()
    if handle is None:
        return None
    n = handle.adc_count_rows(raw, len(raw))
    widths = np.zeros(n, np.int64)
    heights = np.zeros(n, np.int64)
    starts = np.zeros(n, np.int64)
    got = handle.adc_parse(raw, len(raw), _ll_ptr(widths), _ll_ptr(heights),
                           _ll_ptr(starts), n)
    if got < 0:
        return None
    return widths[:got], heights[:got], starts[:got]


def format_probs(roi_ids, probs):
    """CSV body bytes for (roi, probabilities) rows, or None."""
    handle = lib()
    if handle is None:
        return None
    roi_ids = np.ascontiguousarray(roi_ids, np.int64)
    probs = np.ascontiguousarray(probs, np.float64)
    n, c = probs.shape
    cap = n * (24 + 8 * c)
    out = ctypes.create_string_buffer(cap)
    written = handle.format_probs(
        _ll_ptr(roi_ids),
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, c, out, cap,
    )
    if written < 0:
        return None
    return out.raw[:written]
