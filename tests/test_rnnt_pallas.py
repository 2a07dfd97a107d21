"""Pallas lattice kernels vs the XLA scan oracles (interpret mode on CPU;
run with TTX_TEST_TPU=1 for compiled-on-chip checks)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import transformer_transducer_tpu.ops.rnnt_loss as rl
from transformer_transducer_tpu.ops.pallas.rnnt_kernel import (
    alpha_scan_pallas, beta_scan_pallas)

INTERPRET = jax.default_backend() != "tpu"


def _grids(b=4, t=12, u=5, seed=0):
    rng = np.random.RandomState(seed)
    lp_b = jnp.asarray(rng.randn(b, t, u + 1).astype(np.float32))
    lp_l = jnp.asarray(rng.randn(b, t, u + 1).astype(np.float32))
    t_len = jnp.asarray(rng.randint(t - 3, t + 1, size=(b,)))
    u_len = jnp.asarray(rng.randint(1, u + 1, size=(b,)))
    lp_l = rl._mask_label_grid(lp_l, u_len)
    return lp_b, lp_l, t_len, u_len


def test_alpha_kernel_matches_xla_scan():
    lp_b, lp_l, _, _ = _grids()
    sb, sl = rl._skew(lp_b), rl._skew(lp_l)
    ref = rl._alpha_scan(sb, sl)
    got = alpha_scan_pallas(sb, sl, interpret=INTERPRET)
    # compare only reachable (finite in ref) cells for exactness, all for shape
    mask = np.asarray(ref) > -1e29
    np.testing.assert_allclose(np.asarray(got)[mask], np.asarray(ref)[mask],
                               rtol=1e-5, atol=1e-5)


def test_beta_kernel_matches_xla_scan():
    lp_b, lp_l, t_len, u_len = _grids(seed=1)
    b, t, u1 = lp_b.shape
    sb, sl = rl._skew(lp_b), rl._skew(lp_l)
    d_total = sb.shape[1]
    d_final = t_len - 1 + u_len
    terminal = ((jnp.arange(d_total)[None, :, None] == d_final[:, None, None])
                & (jnp.arange(u1)[None, None, :] == u_len[:, None, None]))
    ref = rl._beta_scan(sb, sl, terminal)
    inject = jnp.where(terminal, sb, rl.NEG)
    got = beta_scan_pallas(sb, sl, inject, interpret=INTERPRET)
    mask = np.asarray(ref) > -1e29
    np.testing.assert_allclose(np.asarray(got)[mask], np.asarray(ref)[mask],
                               rtol=1e-5, atol=1e-5)


def test_full_loss_with_pallas_backend():
    """Force the Pallas path (interpret on CPU) through the custom-VJP loss."""
    rng = np.random.RandomState(2)
    b, t, u, v = 2, 8, 3, 6
    logits = jnp.asarray(rng.randn(b, t, u + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)))
    t_len = jnp.asarray([t, t - 2])
    u_len = jnp.asarray([u, u - 1])

    ref_loss = rl.rnnt_loss(logits, labels, t_len, u_len, reduction="none")
    ref_grad = jax.grad(lambda lg: rl.rnnt_loss(lg, labels, t_len, u_len,
                                                reduction="sum"))(logits)
    if INTERPRET:
        # interpret-mode pallas inside jit-of-custom-vjp is unsupported on CPU;
        # the kernels are validated above, the dispatch switch below on TPU.
        return
    rl.configure_pallas("on")
    try:
        got_loss = rl.rnnt_loss(logits, labels, t_len, u_len, reduction="none")
        got_grad = jax.grad(lambda lg: rl.rnnt_loss(lg, labels, t_len, u_len,
                                                    reduction="sum"))(logits)
    finally:
        rl.configure_pallas("auto")
    np.testing.assert_allclose(np.asarray(got_loss), np.asarray(ref_loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-5)
