import numpy as np
import pytest

import jax
import jax.numpy as jnp

import transformer_transducer_tpu.ops.rnnt_loss as rl
import transformer_transducer_tpu.ops.rnnt_loss_np as rlnp


def _random_case(b=3, t=7, u=4, v=6, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    t_len = rng.randint(max(2, t - 3), t + 1, size=(b,)).astype(np.int32)
    u_len = rng.randint(1, u + 1, size=(b,)).astype(np.int32)
    return logits, labels, t_len, u_len


def test_loss_matches_numpy_oracle():
    logits, labels, t_len, u_len = _random_case()
    ref_losses, _ = rlnp.rnnt_loss_batch(logits, labels, t_len, u_len)
    got = rl.rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                       jnp.asarray(t_len), jnp.asarray(u_len), reduction="none")
    np.testing.assert_allclose(np.asarray(got), ref_losses, rtol=1e-4, atol=1e-4)


def test_grad_matches_numpy_oracle():
    logits, labels, t_len, u_len = _random_case(seed=1)
    _, ref_grads = rlnp.rnnt_loss_batch(logits, labels, t_len, u_len)

    def loss_fn(lg):
        return rl.rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                            jnp.asarray(u_len), reduction="sum")

    got = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))
    np.testing.assert_allclose(got, ref_grads, rtol=1e-3, atol=1e-4)


def test_trivial_case_hand_computed():
    # T=1, U=1: the only path is label then blank? No: with T=1 the path is
    # emit label at t=0 then final blank at (0,1).
    v = 3
    logits = np.zeros((1, 1, 2, v), dtype=np.float32)  # uniform
    labels = np.array([[1]], dtype=np.int32)
    loss = rl.rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray([1]), jnp.asarray([1]), reduction="none")
    # P = P(label) * P(blank) = (1/3) * (1/3)
    np.testing.assert_allclose(np.asarray(loss), [2 * np.log(3.0)], rtol=2e-4)


def test_blank_only_path():
    # U=0: only blanks; loss = -sum_t log P(blank at (t, 0))
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 4, 1, 5).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    expected = -lp[0, :, 0, 0].sum()
    labels = np.zeros((1, 0), dtype=np.int32)
    loss = rl.rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray([4]), jnp.asarray([0]), reduction="none")
    np.testing.assert_allclose(np.asarray(loss), [expected], rtol=1e-5)


def test_grid_loss_grad_vs_autodiff_scan():
    """Cross-check the analytic VJP against autodiff through a plain DP."""
    logits, labels, t_len, u_len = _random_case(b=2, t=5, u=3, v=4, seed=3)

    def plain_loss(lg):
        lp_b, lp_l = rl.grid_logprobs_from_logits(lg, jnp.asarray(labels))
        # naive autodiff DP (t-major scan, per-row lax.scan over u)
        return _plain_dp(lp_b, lp_l, jnp.asarray(t_len), jnp.asarray(u_len)).sum()

    def ours_loss(lg):
        return rl.rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                            jnp.asarray(u_len), reduction="sum")

    g_ref = np.asarray(jax.grad(plain_loss)(jnp.asarray(logits)))
    g_got = np.asarray(jax.grad(ours_loss)(jnp.asarray(logits)))
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-3, atol=1e-4)


def _plain_dp(lp_b, lp_l, t_len, u_len):
    NEG = -1e30
    b, t, u1 = lp_b.shape
    u_idx = jnp.arange(u1)
    lp_l = jnp.where((u_idx[None, None, :] < u_len[:, None, None]), lp_l, NEG)

    def row_step(carry, xs):
        prev_alpha = carry                       # (B, U1) alpha at t-1
        lpb_prev, lpl_t = xs                     # lp_b[t-1], lp_l[t]
        base = prev_alpha + lpb_prev

        def u_scan(a_left, inputs):
            base_u, lpl_left = inputs
            val = jnp.logaddexp(base_u, a_left + lpl_left)
            return val, val

        # alpha[t, 0] = base[0]; alpha[t, u] = logaddexp(base[u], alpha[t,u-1]+lp_l[t, u-1])
        init = base[:, 0]
        _, rest = jax.lax.scan(u_scan, init,
                               (base[:, 1:].T, lpl_t[:, :-1].T))
        alpha_t = jnp.concatenate([init[:, None], rest.T], axis=1)
        return alpha_t, alpha_t

    # alpha[0]: first row via label-only scan
    def u_scan0(a_left, lpl_left):
        val = a_left + lpl_left
        return val, val
    init0 = jnp.zeros((b,))
    _, rest0 = jax.lax.scan(u_scan0, init0, lp_l[:, 0, :-1].T)
    alpha0 = jnp.concatenate([init0[:, None], rest0.T], axis=1)

    def t_loop(alpha_prev, tt):
        alpha_t, _ = row_step(alpha_prev, (lp_b[:, tt - 1], lp_l[:, tt]))
        return alpha_t, alpha_t

    alphas = [alpha0]
    a = alpha0
    for tt in range(1, t):
        a, _ = t_loop(a, tt)
        alphas.append(a)
    alpha = jnp.stack(alphas, axis=1)            # (B, T, U1)
    bi = jnp.arange(b)
    return -(alpha[bi, t_len - 1, u_len] + lp_b[bi, t_len - 1, u_len])


def test_fused_path_matches_full_logits():
    rng = np.random.RandomState(4)
    b, t, u, v, d, inner = 2, 9, 3, 7, 6, 10
    enc = rng.randn(b, t, d).astype(np.float32)
    dec = rng.randn(b, u + 1, d).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    t_len = np.array([t, t - 2], dtype=np.int32)
    u_len = np.array([u, u - 1], dtype=np.int32)
    w1 = rng.randn(2 * d, inner).astype(np.float32) * 0.3
    b1 = rng.randn(inner).astype(np.float32) * 0.1
    w2 = rng.randn(inner, v).astype(np.float32) * 0.3
    b2 = rng.randn(v).astype(np.float32) * 0.1
    joint_params = (jnp.asarray(w1[:d]), jnp.asarray(w1[d:]), jnp.asarray(b1),
                    jnp.asarray(w2), jnp.asarray(b2))

    # full-materialization reference
    concat = np.concatenate([
        np.broadcast_to(enc[:, :, None, :], (b, t, u + 1, d)),
        np.broadcast_to(dec[:, None, :, :], (b, t, u + 1, d))], axis=-1)
    logits = np.tanh(concat @ w1 + b1) @ w2 + b2

    ref = rl.rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                       jnp.asarray(t_len), jnp.asarray(u_len), reduction="none")

    def fused(enc_, dec_):
        return rl.rnnt_loss_fused(enc_, dec_, joint_params, jnp.asarray(labels),
                                  jnp.asarray(t_len), jnp.asarray(u_len),
                                  chunk_size=4, reduction="none")

    got = fused(jnp.asarray(enc), jnp.asarray(dec))
    # TPU f32 matmuls round through bf16 MXU passes; the two decompositions
    # (concat@W vs split enc@We+dec@Wd) legitimately differ at ~1e-3 rel.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3)

    # gradients through the fused path match full-logits autodiff
    def full_loss(enc_, dec_):
        cc = jnp.concatenate([
            jnp.broadcast_to(enc_[:, :, None, :], (b, t, u + 1, d)),
            jnp.broadcast_to(dec_[:, None, :, :], (b, t, u + 1, d))], axis=-1)
        lg = jnp.tanh(cc @ w1 + b1) @ w2 + b2
        return rl.rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(t_len),
                            jnp.asarray(u_len), reduction="sum")

    def fused_loss(enc_, dec_):
        return fused(enc_, dec_).sum()

    g_ref = jax.grad(full_loss, argnums=(0, 1))(jnp.asarray(enc), jnp.asarray(dec))
    g_got = jax.grad(fused_loss, argnums=(0, 1))(jnp.asarray(enc), jnp.asarray(dec))
    for a, r in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-3, atol=1e-3)


def test_loss_is_jittable_and_finite():
    logits, labels, t_len, u_len = _random_case(b=4, t=12, u=5, v=8, seed=5)
    f = jax.jit(lambda lg: rl.rnnt_loss(lg, jnp.asarray(labels),
                                        jnp.asarray(t_len), jnp.asarray(u_len)))
    out = f(jnp.asarray(logits))
    assert np.isfinite(np.asarray(out)).all()


def test_fused_no_remat_identical():
    """loss_remat=False (XLA saves joint residuals instead of recomputing)
    is a pure scheduling choice: values AND gradients are identical."""
    rng = np.random.RandomState(11)
    b, t, u, v, d, inner = 2, 9, 3, 7, 6, 10
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    dec = jnp.asarray(rng.randn(b, u + 1, d).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)).astype(np.int32))
    t_len = jnp.asarray([t, t - 2], dtype=jnp.int32)
    u_len = jnp.asarray([u, u - 1], dtype=jnp.int32)
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
               for s in [(d, inner), (d, inner), (inner,), (inner, v), (v,)])

    def loss(remat):
        def f(e, dd):
            return rl.rnnt_loss_fused(e, dd, jp, labels, t_len, u_len,
                                      chunk_size=4, remat=remat)
        return f

    v1, g1 = jax.value_and_grad(loss(True), argnums=(0, 1))(enc, dec)
    v2, g2 = jax.value_and_grad(loss(False), argnums=(0, 1))(enc, dec)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-5,
                                   atol=1e-7)


def test_fused_loss_respects_relu_activation():
    """Regression: fused_grid_logprobs hardcoded tanh; a relu joint trained
    against a tanh-joint loss.  Oracle: full logits through the same relu."""
    import jax
    rng = np.random.RandomState(11)
    b, t, u, v, d, inner = 2, 5, 3, 7, 4, 6
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    dec = jnp.asarray(rng.randn(b, u + 1, d).astype(np.float32))
    y = jnp.asarray(rng.randint(1, v, size=(b, u)))
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
               for s in [(d, inner), (d, inner), (inner,), (inner, v), (v,)])
    t_len = jnp.asarray([t, t - 1])
    u_len = jnp.asarray([u, u - 1])

    w_e, w_d, b1, w_o, b_o = jp
    h = jax.nn.relu(enc[:, :, None, :] @ w_e + dec[:, None, :, :] @ w_d + b1)
    logits = h @ w_o + b_o
    oracle = rl.rnnt_loss(logits, y, t_len, u_len, reduction="none")
    fused = rl.rnnt_loss_fused(enc, dec, jp, y, t_len, u_len, chunk_size=2,
                               reduction="none", activation="relu")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=1e-5)
    # and tanh still differs from relu (the regression would equalize them)
    fused_tanh = rl.rnnt_loss_fused(enc, dec, jp, y, t_len, u_len,
                                    chunk_size=2, reduction="none")
    assert not np.allclose(np.asarray(fused_tanh), np.asarray(oracle))


def test_joint_params_from_tied_variables():
    """Regression: share_embedding models have no project_layer — the fused
    loss path must rebuild the output projection from the embedding table."""
    import jax
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.ops.rnnt_loss import (
        joint_params_from_variables)

    model = Transducer(vocab_size=9, enc=(1, 16, 2, 8, 4, 12),
                       dec=(1, 8, 2, 8, 4, 12), joint_inner=8,
                       share_embedding=True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 8).astype(np.float32))
    y = jnp.asarray(rng.randint(1, 9, size=(2, 3)))
    variables = model.init(jax.random.PRNGKey(0), x, y)
    t_len = jnp.asarray([6, 5])
    u_len = jnp.asarray([3, 2])

    logits = model.apply(variables, x, y)
    oracle = rl.rnnt_loss(logits, y, t_len, u_len, reduction="none")
    enc, dec = model.apply(variables, x, y, method=Transducer.encode_both)
    jp = joint_params_from_variables(variables)
    fused = rl.rnnt_loss_fused(enc, dec, jp, y, t_len, u_len, chunk_size=2,
                               reduction="none")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-5, atol=1e-5)


def test_joint_params_split_with_unequal_enc_dec_dims():
    """Regression: the concat joint kernel split must use the TRUE encoder
    width when enc.d_model != dec.d_model — the half-split default would
    silently mis-assign rows and train a different function than the model
    computes."""
    import jax
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.ops.rnnt_loss import (
        joint_params_from_variables)

    model = Transducer(vocab_size=9, enc=(1, 16, 2, 8, 4, 12),
                       dec=(1, 8, 2, 4, 2, 6), joint_inner=8)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 8).astype(np.float32))
    y = jnp.asarray(rng.randint(1, 9, size=(2, 3)))
    variables = model.init(jax.random.PRNGKey(0), x, y)
    t_len = jnp.asarray([6, 5])
    u_len = jnp.asarray([3, 2])

    logits = model.apply(variables, x, y)
    oracle = rl.rnnt_loss(logits, y, t_len, u_len, reduction="none")
    enc, dec = model.apply(variables, x, y, method=Transducer.encode_both)
    assert enc.shape[-1] == 8 and dec.shape[-1] == 4
    jp = joint_params_from_variables(variables)
    assert jp[0].shape[0] == 8 and jp[1].shape[0] == 4
    fused = rl.rnnt_loss_fused(enc, dec, jp, y, t_len, u_len, chunk_size=2,
                               reduction="none")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-5, atol=1e-5)


def test_overlength_lengths_clamp_to_grid():
    """Regression: t_len > T (or u_len > U) used to place the terminal cell
    off-grid — finite garbage loss, exact-zero gradients, a silent training
    no-op.  Lengths now clamp to the grid: loss/grads equal the full-grid
    (t_len=T, u_len=U) values and gradients stay alive."""
    rng = np.random.RandomState(3)
    b_, t_, u1 = 2, 6, 4
    lp_b = jnp.asarray(np.log(rng.dirichlet(np.ones(3), size=(b_, t_, u1))[..., 0]).astype(np.float32))
    lp_l = jnp.asarray(np.log(rng.dirichlet(np.ones(3), size=(b_, t_, u1))[..., 1]).astype(np.float32))
    good_t = jnp.asarray([t_, t_]); good_u = jnp.asarray([u1 - 1, u1 - 1])
    bad_t = jnp.asarray([t_ + 40, t_]); bad_u = jnp.asarray([u1 - 1, u1 + 9])

    l_good, g_good = jax.value_and_grad(
        lambda a, b: rl.rnnt_loss_grid(a, b, good_t, good_u).sum())(lp_b, lp_l)
    l_bad, g_bad = jax.value_and_grad(
        lambda a, b: rl.rnnt_loss_grid(a, b, bad_t, bad_u).sum())(lp_b, lp_l)
    np.testing.assert_allclose(np.asarray(l_bad), np.asarray(l_good), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_bad), np.asarray(g_good), rtol=1e-6)
    assert float(jnp.abs(g_bad).sum()) > 0.0


def test_zero_t_len_row_is_inert():
    """Regression: a fully-padded batch row (t_len == 0) must contribute
    zero loss and zero gradients, not a wrapped-gather garbage value."""
    import jax
    rng = np.random.RandomState(3)
    b, t, u1 = 2, 4, 3
    lp_b = jnp.asarray(np.log(rng.uniform(0.1, 1, size=(b, t, u1))).astype(np.float32))
    lp_l = jnp.asarray(np.log(rng.uniform(0.1, 1, size=(b, t, u1))).astype(np.float32))
    t_len = jnp.asarray([t, 0])
    u_len = jnp.asarray([u1 - 1, 0])

    def total(lp_b, lp_l):
        return jnp.sum(rl.rnnt_loss_grid(lp_b, lp_l, t_len, u_len))

    losses = rl.rnnt_loss_grid(lp_b, lp_l, t_len, u_len)
    assert float(losses[1]) == 0.0
    assert np.isfinite(np.asarray(losses)).all()
    gb, gl = jax.grad(total, argnums=(0, 1))(lp_b, lp_l)
    assert np.isfinite(np.asarray(gb)).all() and np.isfinite(np.asarray(gl)).all()
    np.testing.assert_array_equal(np.asarray(gb)[1], 0.0)
    np.testing.assert_array_equal(np.asarray(gl)[1], 0.0)
