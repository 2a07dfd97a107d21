"""Attention masks (True == masked position).

Parity surface (reference ``tt/utils.py:233-251``):

* ``look_ahead_mask`` — strict upper-triangular causal mask for the label
  encoder;
* ``context_mask`` — banded streaming mask: position *i* may attend to
  ``[i - left, i + right]`` only (the heart of the reference's streaming
  design; espnet twin ``nets_utils.py:268-281``).

The reference's padding masks are documented broken ("训练时输出全是0",
``tt/utils.py:254-289``) and unused in training; here ``padding_mask`` is a
correct length-based implementation for callers that want it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def look_ahead_mask(seq_len: int) -> jnp.ndarray:
    """(U, U) bool; True above the diagonal (no peeking at future labels)."""
    return jnp.triu(jnp.ones((seq_len, seq_len), dtype=bool), k=1)


def context_mask(seq_len: int, left: int = 10, right: int = 2) -> jnp.ndarray:
    """(T, T) bool band mask: True outside ``[i - left, i + right]``.

    ``left < 0`` or ``right < 0`` means unlimited on that side (espnet twin
    semantics, ``nets_utils.py:268-281``).
    """
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    mask = jnp.zeros((seq_len, seq_len), dtype=bool)
    if right >= 0:
        mask = mask | (j - i > right)
    if left >= 0:
        mask = mask | (i - j > left)
    return mask


def padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, T) bool; True at padded positions (length-based, correct)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def combine_masks(*masks):
    """Broadcast-OR of masks; ``None`` entries are skipped."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out | m)
    return out


def context_mask_np(seq_len: int, left: int = 10, right: int = 2) -> np.ndarray:
    i = np.arange(seq_len)[:, None]
    j = np.arange(seq_len)[None, :]
    mask = np.zeros((seq_len, seq_len), dtype=bool)
    if right >= 0:
        mask |= (j - i) > right
    if left >= 0:
        mask |= (i - j) > left
    return mask
