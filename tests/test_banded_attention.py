"""Pallas banded attention vs the dense-mask XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.attention import rel_shift, _slice_pos_table
from transformer_transducer_tpu.ops.masks import context_mask
from transformer_transducer_tpu.ops.pallas.banded_attention import banded_attention

INTERPRET = jax.default_backend() != "tpu"
# compiled TPU matmuls round f32 through bf16 MXU passes; interpret mode is exact
TOL = dict(rtol=2e-4, atol=2e-4) if INTERPRET else dict(rtol=5e-3, atol=5e-3)
# model-level comparisons compound kernel-vs-XLA precision differences over
# multiple layers on real TPU (XLA default-precision matmuls use bf16
# operands; the kernel accumulates in f32) — same math, wider band
MODEL_TOL = TOL if INTERPRET else dict(rtol=3e-2, atol=3e-2)


def dense_oracle(q, k, v, re, u, rb, left, right):
    """The module's exact dense-score math (pre out-projection)."""
    b, t, h, dh = q.shape
    ac = jnp.einsum("bind,bjnd->bnij", q + u[None, None], k)
    b_ = jnp.einsum("bind,jnd->bnij", q, re)
    d_ = rb.T[None, :, None, :]
    bd = rel_shift(b_ + d_)
    scores = (ac + bd) / np.sqrt(dh)
    mask = context_mask(t, left, right)
    scores = jnp.where(mask[None, None], -1e30, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnij,bjnd->bind", probs, v)


@pytest.mark.parametrize("t,left,right", [(64, 10, 2), (200, 10, 2),
                                          (410, 10, 2), (128, 7, 0),
                                          (300, 33, 5), (40, 4, 2),
                                          (32, 10, 5)])
def test_banded_kernel_matches_dense(t, left, right):
    rng = np.random.RandomState(t + left)
    b, h, dh = 2, 2, 64
    q = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32))
    re = jnp.asarray(rng.randn(t, h, dh).astype(np.float32) * 0.3)
    u = jnp.asarray(rng.randn(h, dh).astype(np.float32) * 0.3)
    rb = jnp.asarray(rng.randn(t, h).astype(np.float32) * 0.3)

    ref = np.asarray(dense_oracle(q, k, v, re, u, rb, left, right))
    got = np.asarray(banded_attention(q, k, v, re, u, rb, left, right,
                                      interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, **TOL)


def test_banded_kernel_sliced_tables():
    """klen < k_len: caller slices tables first (model front-pad/slice rule)."""
    rng = np.random.RandomState(0)
    t, k_len, h, dh = 100, 160, 2, 64
    q = jnp.asarray(rng.randn(1, t, h, dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(1, t, h, dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(1, t, h, dh).astype(np.float32))
    re_full = jnp.asarray(rng.randn(k_len, h, dh).astype(np.float32) * 0.3)
    u = jnp.asarray(rng.randn(h, dh).astype(np.float32) * 0.3)
    rb_full = jnp.asarray(rng.randn(k_len, h).astype(np.float32) * 0.3)
    re = _slice_pos_table(re_full, t)
    rb = _slice_pos_table(rb_full, t)
    ref = np.asarray(dense_oracle(q, k, v, re, u, rb, 10, 2))
    got = np.asarray(banded_attention(q, k, v, re, u, rb, 10, 2,
                                      interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, **TOL)


def test_model_encode_banded_matches_masked():
    from transformer_transducer_tpu.models.transducer import Transducer
    model = Transducer(vocab_size=12, enc=(2, 160, 2, 8, 4, 16),
                       dec=(1, 8, 2, 8, 4, 16), joint_inner=12)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 150, 8))
    variables = model.init(jax.random.PRNGKey(0), x[:, :8],
                           jnp.zeros((2, 4), jnp.int32))
    ref = model.apply(variables, x, context_mask(150, 10, 2), method="encode")
    got = model.apply(variables, x, 10, 2, method="encode_banded")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **MODEL_TOL)


@pytest.mark.parametrize("t,left,right", [(64, 10, 2), (200, 10, 2),
                                          (128, 7, 0)])
def test_banded_kernel_grads_match_autodiff(t, left, right):
    """Custom VJP (incl. position-table grads) vs autodiff of the dense
    oracle."""
    rng = np.random.RandomState(100 + t)
    b, h, dh = 2, 2, 64
    args = (jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32)),
            jnp.asarray(rng.randn(t, h, dh).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(h, dh).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(t, h).astype(np.float32) * 0.3))
    g = jnp.asarray(rng.randn(b, t, h, dh).astype(np.float32))

    def loss_ref(*a):
        return jnp.sum(dense_oracle(*a, left, right) * g)

    def loss_ker(*a):
        return jnp.sum(banded_attention(*a, left, right,
                                        interpret=INTERPRET) * g)

    refs = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gots = jax.grad(loss_ker, argnums=tuple(range(6)))(*args)
    names = ["dq", "dk", "dv", "d_r_emb", "d_r_w_bias", "d_r_bias"]
    gtol = (dict(rtol=2e-3, atol=2e-3) if INTERPRET
            else dict(rtol=2e-2, atol=2e-2))
    for name, ref, got in zip(names, refs, gots):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   err_msg=name, **gtol)


def test_banded_training_matches_dense_masked_loss():
    """Full train-style fwd+bwd through a banded Transducer equals the
    dense context_mask path: same loss, same parameter gradients."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.ops.rnnt_loss import (
        joint_params_from_variables, rnnt_loss_fused)

    rng = np.random.RandomState(7)
    b, t, u, v, d = 2, 40, 5, 24, 64
    left, right = 4, 2
    kw = dict(vocab_size=v, enc=(2, t, 1, d, 64, 32), dec=(1, u + 1, 1, d, 64, 32),
              joint_inner=16)
    banded_model = Transducer(band=(left, right), **kw)
    dense_model = Transducer(**kw)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.3)
    y = jnp.asarray(rng.randint(1, v, (b, u)))
    t_len = jnp.asarray([t, t - 7])
    u_len = jnp.asarray([u, u - 2])
    params = banded_model.init(jax.random.PRNGKey(0), x, y)["params"]

    def loss_banded(p):
        enc, dec = banded_model.apply({"params": p}, x, y,
                                      method="encode_both")
        return rnnt_loss_fused(enc, dec, joint_params_from_variables(p),
                               y, t_len, u_len, chunk_size=8).mean()

    def loss_dense(p):
        enc = dense_model.apply({"params": p}, x,
                                context_mask(t, left, right), method="encode")
        dec = dense_model.apply(
            {"params": p}, jnp.pad(y, ((0, 0), (1, 0))),
            __import__("transformer_transducer_tpu.ops.masks",
                       fromlist=["look_ahead_mask"]).look_ahead_mask(u + 1),
            method="predict")
        return rnnt_loss_fused(enc, dec, joint_params_from_variables(p),
                               y, t_len, u_len, chunk_size=8).mean()

    lb, gb = jax.value_and_grad(loss_banded)(params)
    ld, gd = jax.value_and_grad(loss_dense)(params)
    np.testing.assert_allclose(float(lb), float(ld),
                               rtol=1e-4 if INTERPRET else 1e-3)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(gd))
    for path, leaf in flat_b:
        got = np.asarray(leaf)
        ref = np.asarray(flat_d[path])
        if INTERPRET:
            np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3,
                                       err_msg=jax.tree_util.keystr(path))
        else:
            # real TPU: the kernel-vs-XLA encoder precision gap (~2e-2, see
            # MODEL_TOL) perturbs the lattice posteriors and hence EVERY
            # param's gradient (decoder leaves included); near-zero elements
            # get sign-level noise, so compare against the LEAF's scale —
            # a wrong gradient would be off by O(scale), not 8 %.
            scale = np.abs(ref).max() + 1e-6
            err = np.abs(got - ref).max()
            assert err <= 0.08 * scale, (
                f"{jax.tree_util.keystr(path)}: max|diff| {err:.4g} vs "
                f"leaf scale {scale:.4g}")
