"""Flash rel-attention kernel (full attention) vs the dense oracle + autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.attention import rel_shift
from transformer_transducer_tpu.ops.pallas.flash_rel_attention import (
    flash_rel_attention)

INTERPRET = jax.default_backend() != "tpu"
TOL = dict(rtol=2e-4, atol=2e-4) if INTERPRET else dict(rtol=5e-3, atol=5e-3)


def dense_oracle(q, k, v, re, u, rb):
    """Unmasked dense rel-attention (the module's training path math)."""
    dh = q.shape[-1]
    ac = jnp.einsum("bind,bjnd->bnij", q + u[None, None], k)
    bd = rel_shift(jnp.einsum("bind,jnd->bnij", q, re)
                   + rb.T[None, :, None, :])
    probs = jax.nn.softmax((ac + bd) / np.sqrt(dh), axis=-1)
    return jnp.einsum("bnij,bjnd->bind", probs, v)


def _inputs(b, t, h, dh, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    return (mk(b, t, h, dh), mk(b, t, h, dh), mk(b, t, h, dh),
            mk(t, h, dh), mk(h, dh), mk(t, h))


@pytest.mark.parametrize("t", [64, 128, 200, 410])
def test_forward_matches_dense(t):
    args = _inputs(2, t, 2, 64, seed=t)
    ref = np.asarray(dense_oracle(*args))
    got = np.asarray(flash_rel_attention(*args, INTERPRET))
    np.testing.assert_allclose(got, ref, **TOL)


@pytest.mark.parametrize("t", [64, 200])
def test_backward_matches_autodiff(t):
    args = _inputs(1, t, 2, 64, seed=100 + t)

    def loss_ref(*a):
        return jnp.sum(dense_oracle(*a) ** 2)

    def loss_flash(*a):
        return jnp.sum(flash_rel_attention(*a, INTERPRET) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_got = jax.grad(loss_flash, argnums=tuple(range(6)))(*args)
    names = ["q", "k", "v", "r_emb", "r_w_bias", "r_bias"]
    for name, a, r in zip(names, g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   err_msg=f"grad {name}", **TOL)


@pytest.mark.slow  # model-level twin of the kernel fwd/bwd parity tests
def test_model_flash_matches_dense():
    """Transducer(flash=True) training forward + grads == dense path."""
    from transformer_transducer_tpu.models.transducer import Transducer
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 150, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 1, 12)
    outs, grads = [], []
    for flash in [False, True]:
        m = Transducer(vocab_size=12, enc=(2, 160, 2, 16, 8, 32),
                       dec=(1, 8, 2, 16, 8, 32), joint_inner=16, flash=flash)
        v = m.init(jax.random.PRNGKey(0), x[:, :8], y)
        outs.append(np.asarray(m.apply(v, x, y)))
        g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x, y) ** 2))(
            v["params"])
        grads.append(g)
    np.testing.assert_allclose(outs[1], outs[0], **TOL)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        grads[1], grads[0])
