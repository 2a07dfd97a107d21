"""Fused joint+lse Pallas kernel vs the XLA chunked oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import transformer_transducer_tpu.ops.rnnt_loss as rl
from transformer_transducer_tpu.ops.pallas.joint_kernel import (
    fused_grid_logprobs_pallas)

INTERPRET = jax.default_backend() != "tpu"
TOL = dict(rtol=1e-5, atol=1e-5) if INTERPRET else dict(rtol=3e-3, atol=3e-3)


def _case(b=2, t=11, u=5, d=16, j=24, v=37, seed=0):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    dec = jnp.asarray(rng.randn(b, u + 1, d).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)).astype(np.int32))
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
               for s in [(d, j), (d, j), (j,), (j, v), (v,)])
    return enc, dec, labels, jp


@pytest.mark.parametrize("seed,dims", [(0, (2, 11, 5, 16, 24, 37)),
                                       (1, (1, 8, 3, 8, 16, 600)),
                                       (2, (3, 24, 7, 32, 48, 1100))])
def test_fused_kernel_matches_xla(seed, dims):
    b, t, u, d, j, v = dims
    enc, dec, labels, jp = _case(b, t, u, d, j, v, seed)
    ref_b, ref_l = rl.fused_grid_logprobs(enc, dec, jp, labels, chunk_size=4)
    got_b, got_l = fused_grid_logprobs_pallas(enc, dec, jp, labels,
                                              interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), **TOL)
    # label column U is undefined (no label there) in both paths; compare :U
    np.testing.assert_allclose(np.asarray(got_l)[:, :, :u],
                               np.asarray(ref_l)[:, :, :u], **TOL)


def test_fused_kernel_in_loss():
    enc, dec, labels, jp = _case()
    t_len = jnp.asarray([11, 9])
    u_len = jnp.asarray([5, 4])
    ref = rl.rnnt_loss_fused(enc, dec, jp, labels, t_len, u_len,
                             chunk_size=4, reduction="none")
    lpb, lpl = fused_grid_logprobs_pallas(enc, dec, jp, labels,
                                          interpret=INTERPRET)
    got = rl.rnnt_loss_grid(lpb, lpl, t_len, u_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4 if INTERPRET else 3e-3)


def test_rnnt_loss_fused_use_pallas_matches_xla():
    """The eval path routes grid extraction through the kernel
    (rnnt_loss_fused(use_pallas=True)); losses must match the XLA chunks."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from transformer_transducer_tpu.ops.rnnt_loss import rnnt_loss_fused

    rng = np.random.RandomState(5)
    b, t, u1, v, d, j = 2, 12, 5, 20, 16, 8
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.3)
    dec = jnp.asarray(rng.randn(b, u1, d).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.randint(1, v, (b, u1 - 1)))
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
               for s in [(d, j), (d, j), (j,), (j, v), (v,)])
    t_len = jnp.asarray([t, t - 3])
    u_len = jnp.asarray([u1 - 1, u1 - 2])
    base = rnnt_loss_fused(enc, dec, jp, labels, t_len, u_len, chunk_size=4,
                           reduction="none")
    pal = rnnt_loss_fused(enc, dec, jp, labels, t_len, u_len,
                          reduction="none", use_pallas=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_pallas_joint_relu_matches_oracle():
    """The kernel's relu branch vs the XLA oracle (CLAUDE.md: every kernel
    path needs an interpret-mode oracle test)."""
    rng = np.random.RandomState(13)
    b, t, u1, v, d, j = 2, 5, 4, 40, 8, 16
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    dec = jnp.asarray(rng.randn(b, u1, d).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, u1 - 1)))
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
               for s in [(d, j), (d, j), (j,), (j, v), (v,)])
    ref = rl.fused_grid_logprobs(enc, dec, jp, labels, chunk_size=2,
                                 activation="relu")
    got = fused_grid_logprobs_pallas(enc, dec, jp, labels,
                                     interpret=INTERPRET, activation="relu")
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
