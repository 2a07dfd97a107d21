"""ctypes loader for the C++ runtime library (csrc/ttx_runtime.cc).

The native library accelerates CPU-side hot paths of the data/eval pipeline:
batch edit distance (CER) and WAV decoding.  Pure-Python fallbacks exist for
every entry point, so the framework works without the build step; ``make -C
csrc`` (or ``python csrc/build.py``) produces ``libttx_runtime.so``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _candidate_paths():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(here, "csrc", "libttx_runtime.so")
    yield os.path.join(here, "libttx_runtime.so")
    env = os.environ.get("TTX_RUNTIME_LIB")
    if env:
        yield env


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ttx_levenshtein.restype = ctypes.c_int64
        lib.ttx_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]

    def levenshtein(self, a: np.ndarray, b: np.ndarray) -> int:
        a = np.ascontiguousarray(a, dtype=np.int32)
        b = np.ascontiguousarray(b, dtype=np.int32)
        return int(self._lib.ttx_levenshtein(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b)))


def library_or_none() -> Optional[_Native]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        for path in _candidate_paths():
            if os.path.exists(path):
                try:
                    _LIB = _Native(ctypes.CDLL(path))
                    break
                except OSError:
                    continue
    return _LIB
