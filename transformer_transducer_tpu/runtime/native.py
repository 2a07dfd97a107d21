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
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i16p = ctypes.POINTER(ctypes.c_int16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ttx_levenshtein.restype = ctypes.c_int64
        lib.ttx_levenshtein.argtypes = [i32p, ctypes.c_int64, i32p,
                                        ctypes.c_int64]
        lib.ttx_batch_levenshtein.restype = ctypes.c_int64
        lib.ttx_batch_levenshtein.argtypes = [i32p, i64p, i32p, i64p,
                                              ctypes.c_int64, i64p]
        lib.ttx_parse_wav.restype = ctypes.c_int64
        lib.ttx_parse_wav.argtypes = [u8p, ctypes.c_int64, i16p,
                                      ctypes.c_int64, i32p]

    def levenshtein(self, a: np.ndarray, b: np.ndarray) -> int:
        a = np.ascontiguousarray(a, dtype=np.int32)
        b = np.ascontiguousarray(b, dtype=np.int32)
        return int(self._lib.ttx_levenshtein(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b)))

    def batch_levenshtein(self, preds, refs):
        """preds/refs: lists of int sequences -> (distance, total_ref_len)."""
        def pack(seqs):
            flat = np.concatenate([np.asarray(s, np.int32) for s in seqs]
                                  or [np.zeros(0, np.int32)]).astype(np.int32)
            off = np.zeros(len(seqs) + 1, np.int64)
            np.cumsum([len(s) for s in seqs], out=off[1:])
            return np.ascontiguousarray(flat), np.ascontiguousarray(off)
        pf, po = pack(preds)
        rf, ro = pack(refs)
        total = ctypes.c_int64(0)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        dist = self._lib.ttx_batch_levenshtein(
            pf.ctypes.data_as(i32p), po.ctypes.data_as(i64p),
            rf.ctypes.data_as(i32p), ro.ctypes.data_as(i64p),
            len(preds), ctypes.byref(total))
        return int(dist), int(total.value)

    def parse_wav(self, raw: bytes):
        """RIFF/PCM16 bytes -> (int16 mono samples, rate) or None on error."""
        buf = np.frombuffer(raw, dtype=np.uint8)
        out = np.empty(len(raw) // 2, dtype=np.int16)
        rate = ctypes.c_int32(0)
        n = self._lib.ttx_parse_wav(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(out),
            ctypes.byref(rate))
        if n < 0:
            return None
        return out[:n].copy(), int(rate.value)


def build(force: bool = False) -> bool:
    """Compile the native library with make; returns True on success."""
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csrc = os.path.join(here, "csrc")
    so = os.path.join(csrc, "libttx_runtime.so")
    if os.path.exists(so) and not force:
        return True
    try:
        subprocess.run(["make", "-C", csrc], check=True, capture_output=True)
        return os.path.exists(so)
    except Exception:
        return False


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
