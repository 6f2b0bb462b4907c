"""ctypes bindings for the native host runtime (dsvc_native.so).

Build with ``python -m diffsvc_tpu.native.build`` (plain g++, no pybind11).
Every entry point has a numpy fallback in its caller, so the framework works
without the extension; the extension removes Python/scipy overhead from the
slicer and preprocessing inner loops.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "dsvc_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i64 = ctypes.c_int64
    lib.window_maximum.argtypes = [f32p, i64, i64, f32p]
    lib.window_rms.argtypes = [f32p, i64, i64, f32p]
    lib.align_uniform.argtypes = [i64, i64, i32p]
    lib.f0_to_coarse.argtypes = [f32p, i64, ctypes.c_int32, ctypes.c_float,
                                 ctypes.c_float, i32p]
    lib.pcm16_to_float.argtypes = [i16p, i64, f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def window_maximum(arr: np.ndarray, win: int) -> np.ndarray:
    lib = _load()
    arr = _f32(arr)
    out = np.empty(len(arr) - win + 1, np.float32)
    lib.window_maximum(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       len(arr), win,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def window_rms(arr: np.ndarray, win: int) -> np.ndarray:
    lib = _load()
    arr = _f32(arr)
    out = np.empty(len(arr) - win + 1, np.float32)
    lib.window_rms(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   len(arr), win,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def align_uniform(mel_len: int, n_units: int) -> np.ndarray:
    lib = _load()
    out = np.empty(mel_len, np.int32)
    lib.align_uniform(mel_len, n_units,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def f0_to_coarse(f0: np.ndarray, f0_bin: int, f0_min: float, f0_max: float
                 ) -> np.ndarray:
    lib = _load()
    f0 = _f32(f0)
    out = np.empty(len(f0), np.int32)
    lib.f0_to_coarse(f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     len(f0), f0_bin, f0_min, f0_max,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def pcm16_to_float(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(len(pcm), np.float32)
    lib.pcm16_to_float(pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                       len(pcm),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
