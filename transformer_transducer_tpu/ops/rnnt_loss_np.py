"""Pure-numpy RNN-T loss reference (test oracle only — never the hot path).

Semantics match the external CUDA ``warprnnt_pytorch.RNNTLoss`` the reference
trains with (reference: ``train.py:13,231,53``; HawkAaron warp-transducer):
``logits (B, T, U+1, V)`` unnormalized, targets ``(B, U)``, per-sequence
``-log P(y|x)`` with an internal log-softmax, blank id 0.
"""

from __future__ import annotations

import numpy as np

NEG = -1e30


def log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    s = np.log(np.exp(x - m).sum(axis=axis, keepdims=True))
    return x - m - s


def rnnt_loss_single(log_probs: np.ndarray, labels: np.ndarray, blank: int = 0):
    """Loss and grad (wrt log_probs) for one sequence.

    log_probs: (T, U+1, V) normalized log-probabilities.
    labels: (U,) int.
    Returns (loss, grad) with grad the same shape as log_probs.
    """
    t_max, u1, _ = log_probs.shape
    u_max = len(labels)
    assert u1 >= u_max + 1

    lp_b = log_probs[:, :, blank]
    lp_l = np.full((t_max, u_max + 1), NEG)
    for u in range(u_max):
        lp_l[:, u] = log_probs[:, u, labels[u]]

    alpha = np.full((t_max, u_max + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(t_max):
        for u in range(u_max + 1):
            if t == 0 and u == 0:
                continue
            blank_term = alpha[t - 1, u] + lp_b[t - 1, u] if t > 0 else NEG
            label_term = alpha[t, u - 1] + lp_l[t, u - 1] if u > 0 else NEG
            alpha[t, u] = np.logaddexp(blank_term, label_term)

    log_z = alpha[t_max - 1, u_max] + lp_b[t_max - 1, u_max]

    beta = np.full((t_max, u_max + 1), NEG)
    beta[t_max - 1, u_max] = lp_b[t_max - 1, u_max]
    for t in range(t_max - 1, -1, -1):
        for u in range(u_max, -1, -1):
            if t == t_max - 1 and u == u_max:
                continue
            blank_term = lp_b[t, u] + beta[t + 1, u] if t + 1 < t_max else NEG
            label_term = lp_l[t, u] + beta[t, u + 1] if u + 1 <= u_max else NEG
            beta[t, u] = np.logaddexp(blank_term, label_term)

    grad = np.zeros_like(log_probs)
    for t in range(t_max):
        for u in range(u_max + 1):
            # blank transition posterior
            if t + 1 < t_max:
                g = np.exp(alpha[t, u] + lp_b[t, u] + beta[t + 1, u] - log_z)
            else:
                g = 0.0
            if t == t_max - 1 and u == u_max:
                g += np.exp(alpha[t, u] + lp_b[t, u] - log_z)
            grad[t, u, blank] -= g
            if u < u_max:
                gl = np.exp(alpha[t, u] + lp_l[t, u] + beta[t, u + 1] - log_z)
                grad[t, u, labels[u]] -= gl
    return -log_z, grad


def rnnt_loss_batch(logits: np.ndarray, labels: np.ndarray, t_len: np.ndarray,
                    u_len: np.ndarray, blank: int = 0):
    """Batched loss from unnormalized logits; returns (losses (B,), grads)."""
    b = logits.shape[0]
    losses = np.zeros((b,))
    grads = np.zeros_like(logits)
    for i in range(b):
        lp = log_softmax(logits[i, :t_len[i], :u_len[i] + 1].astype(np.float64))
        loss, grad_lp = rnnt_loss_single(lp, labels[i, :u_len[i]], blank)
        losses[i] = loss
        # chain rule through log_softmax: dL/dz = g - softmax(z) * sum(g)
        probs = np.exp(lp)
        gsum = grad_lp.sum(axis=-1, keepdims=True)
        grads[i, :t_len[i], :u_len[i] + 1] = grad_lp - probs * gsum
    return losses, grads
