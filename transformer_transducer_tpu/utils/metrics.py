"""Edit-distance metrics (CER) with an optional native C++ fast path.

Parity surface: the reference computes batch CER via the ``editdistance``
package (reference: ``tt/utils.py:46-50`` ``computer_cer``).  That package is
not available here; we provide a vectorized numpy Levenshtein and, when built,
a C++ implementation from ``csrc/ttx_runtime.cc`` (loaded lazily through
``transformer_transducer_tpu.runtime.native``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _levenshtein_numpy(a: Sequence, b: Sequence) -> int:
    """Row-vectorized Levenshtein DP: O(len(a)) rows of numpy ops."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    b_arr = np.asarray(list(b), dtype=object) if not isinstance(b, np.ndarray) else b
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, sym in enumerate(a, start=1):
        sub = prev[:-1] + (b_arr != sym)
        # insertion/deletion need a sequential min-prefix; use cumulative trick:
        cur = np.empty_like(prev)
        cur[0] = i
        # candidate without the "insertion from left neighbour" dependency
        cand = np.minimum(prev[1:] + 1, sub)
        # resolve left-to-right dependency: cur[j] = min(cand[j], cur[j-1]+1)
        # min-plus prefix scan: cur[j] = min_k<=j (cand[k] + (j-k)), with cand[-1]=cur[0]
        shifted = np.minimum.accumulate(np.concatenate(([cur[0]], cand)) - np.arange(len(b) + 1))
        cur[1:] = shifted[1:] + np.arange(1, len(b) + 1)
        cur[1:] = np.minimum(cur[1:], cand)
        prev = cur
    return int(prev[-1])


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance between two sequences (of ints or strings)."""
    native = _maybe_native()
    if native is not None:
        ai = _as_int_ids(a)
        bi = _as_int_ids(b)
        if ai is not None and bi is not None:
            return native.levenshtein(ai, bi)
    return _levenshtein_numpy(a, b)


def _as_int_ids(seq):
    try:
        arr = np.asarray(seq)
        if arr.dtype.kind in "iu":
            return arr.astype(np.int32)
        return None
    except Exception:
        return None


_NATIVE = False


def _maybe_native():
    global _NATIVE
    if _NATIVE is False:
        try:
            from transformer_transducer_tpu.runtime import native
            _NATIVE = native.library_or_none()
        except Exception:
            _NATIVE = None
    return _NATIVE


def batch_cer(preds: Sequence[Sequence], labels: Sequence[Sequence]) -> Tuple[int, int]:
    """Total edit distance and total label length for a batch.

    Same contract as the reference's ``computer_cer`` (``tt/utils.py:46-50``):
    returns ``(distance, total)``.  Integer-id batches take the single-call
    native path (one FFI crossing for the whole batch instead of one per
    pair); string sequences fall back to per-pair distances.
    """
    native = _maybe_native()
    if native is not None and preds:
        pi = [_as_int_ids(p) for p in preds]
        li = [_as_int_ids(l) for l in labels]
        if all(x is not None for x in pi) and all(x is not None for x in li):
            # note the argument order: distance is computed pred-vs-ref and
            # `total` must be the LABEL length sum
            return native.batch_levenshtein(pi, li)
    dist = sum(levenshtein(label, pred) for pred, label in zip(preds, labels))
    total = sum(len(label) for label in labels)
    return dist, total
