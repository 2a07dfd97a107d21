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
    # the explicit override must WIN over the bundled artifact, so it
    # comes first
    env = os.environ.get("TTX_RUNTIME_LIB")
    if env:
        yield env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(here, "csrc", "libttx_runtime.so")
    yield os.path.join(here, "libttx_runtime.so")


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
        f32p = ctypes.POINTER(ctypes.c_float)
        self._has_logmel = hasattr(lib, "ttx_logmel")
        if self._has_logmel:  # older prebuilt .so without the featurizer
            lib.ttx_logmel.restype = ctypes.c_int64
            lib.ttx_logmel.argtypes = [i16p, ctypes.c_int64, f32p,
                                       ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_int32, ctypes.c_int32,
                                       f32p, ctypes.c_int64]

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

    def logmel(self, wav: np.ndarray, mel: np.ndarray, n_fft: int = 512,
               hop: int = 160, variant: str = "masked"):
        """int16 wav + (n_mels, n_fft//2+1) f32 filterbank -> (frames, n_mels)
        f32 log-mel, frame-parallel in C++ (no GIL).  None if the loaded
        library predates the featurizer or the call fails."""
        if not getattr(self, "_has_logmel", False):
            return None
        wav = np.ascontiguousarray(wav, dtype=np.int16)
        mel = np.ascontiguousarray(mel, dtype=np.float32)
        n_mels = mel.shape[0]
        out = np.empty((1 + len(wav) // hop, n_mels), dtype=np.float32)
        i16p = ctypes.POINTER(ctypes.c_int16)
        f32p = ctypes.POINTER(ctypes.c_float)
        n = self._lib.ttx_logmel(
            wav.ctypes.data_as(i16p), len(wav),
            mel.ctypes.data_as(f32p), n_mels, n_fft, hop,
            0 if variant == "masked" else 1,
            out.ctypes.data_as(f32p), out.size)
        if n < 0:
            return None
        return out[:n]

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
    src = os.path.join(csrc, "ttx_runtime.cc")
    if os.path.exists(so) and not force:
        # rebuild only when the source is present AND newer than the .so;
        # a prebuilt artifact without csrc/ttx_runtime.cc is fine as-is
        if not os.path.exists(src) \
                or os.path.getmtime(so) >= os.path.getmtime(src):
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
