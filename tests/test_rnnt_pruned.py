"""Pruned RNN-T loss (ops/rnnt_loss_pruned.py).

The load-bearing property is the UNPRUNED LIMIT: with s_range >= U+1 the
band covers the whole grid and the pruned loss must equal the full fused
loss bit-for-bit-ish (same lattice, same joint) — values AND gradients.
Narrow bands drop paths, so the pruned NLL upper-bounds the full NLL.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.ops.rnnt_loss import (
    rnnt_loss_fused, rnnt_loss_grid)
from transformer_transducer_tpu.ops.rnnt_loss_pruned import (
    banded_grid_logprobs, pruned_bounds, rnnt_loss_banded_grid,
    rnnt_loss_pruned, simple_grid_logprobs)


def _problem(seed=0, b=3, t=11, u=4, v=7, inner=6, d=5):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    dec = jnp.asarray(rng.randn(b, u + 1, d).astype(np.float32))
    jp = tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.5)
               for s in [(d, inner), (d, inner), (inner,), (inner, v), (v,)])
    labels = jnp.asarray(rng.randint(1, v, (b, u)), dtype=jnp.int32)
    t_len = jnp.asarray([t, t - 2, t - 5])
    u_len = jnp.asarray([u, u - 1, u - 2])
    return enc, dec, jp, labels, t_len, u_len


def test_banded_grid_dp_equals_full_dp():
    """With rs = 0 and s_range = U+1, the band DP is the full DP."""
    rng = np.random.RandomState(1)
    b, t, u1 = 3, 9, 5
    lp_b = jnp.asarray(rng.randn(b, t, u1).astype(np.float32))
    lp_l = jnp.asarray(rng.randn(b, t, u1).astype(np.float32))
    t_len = jnp.asarray([t, t - 1, t - 3])
    u_len = jnp.asarray([u1 - 1, u1 - 2, u1 - 3])
    # the full DP masks label columns >= u_len internally; mask explicitly
    # for the banded one (banded_grid_logprobs does it in the fused path)
    has_label = jnp.arange(u1)[None, None, :] < u_len[:, None, None]
    lp_l_m = jnp.where(has_label, lp_l, -1e30)
    rs = jnp.zeros((b, t), jnp.int32)
    full = rnnt_loss_grid(lp_b, lp_l, t_len, u_len)
    band = rnnt_loss_banded_grid(lp_b, lp_l_m, rs, t_len, u_len)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("activation", ["tanh", "relu"])
def test_unpruned_limit_matches_fused(activation):
    """s_range >= U+1 => loss and gradients equal rnnt_loss_fused."""
    enc, dec, jp, labels, t_len, u_len = _problem()
    u1 = dec.shape[1]

    def full(args):
        enc, dec, jp = args
        return rnnt_loss_fused(enc, dec, jp, labels, t_len, u_len,
                               chunk_size=4, activation=activation)

    def pruned(args):
        enc, dec, jp = args
        return rnnt_loss_pruned(enc, dec, jp, labels, t_len, u_len,
                                s_range=u1, chunk_size=4,
                                activation=activation)

    args = (enc, dec, jp)
    lf, gf = jax.value_and_grad(full)(args)
    lp, gp = jax.value_and_grad(pruned)(args)
    np.testing.assert_allclose(float(lp), float(lf), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_infeasible_corridor_truncates_with_live_grads():
    """u_len unreachable within the corridor (t_len*(s_range-1) too small)
    must yield a finite truncated-NLL with nonzero gradients through the
    real joint — not a silent zero-gradient no-op (the full path's
    over-length policy, rnnt_loss.py:158-166)."""
    enc, dec, jp, labels, t_len, u_len = _problem(seed=6, t=3, u=4)
    t_len = jnp.asarray([3, 2, 2])
    u_len = jnp.asarray([4, 4, 3])   # rows 2,3: 4 > (2-1)*(2-1)+1

    def loss(args):
        enc, jp = args
        return rnnt_loss_pruned(enc, dec, jp, labels, t_len, u_len,
                                s_range=2, chunk_size=4, simple_scale=0.0,
                                reduction="none")

    losses = loss((enc, jp))
    assert np.all(np.isfinite(np.asarray(losses)))
    assert np.all(np.asarray(losses) > 0)
    g = jax.grad(lambda a: jnp.sum(loss(a)))((enc, jp))
    norm = float(sum(jnp.sum(jnp.abs(x))
                     for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(norm) and norm > 0


@pytest.mark.skipif(__import__("os").environ.get("TTX_TEST_TPU") != "1",
                    reason="on-chip lattice check (TTX_TEST_TPU=1)")
def test_pruned_loss_compiled_on_tpu():
    """End-to-end pruned loss compiled on the chip: unpruned limit equals
    the fused loss, and the fwd+bwd are finite (exercises the Pallas
    lattice reuse inside simple_loss_and_occ, the band DP lowering and
    the logZ kernel together)."""
    enc, dec, jp, labels, t_len, u_len = _problem(seed=7, t=24, u=4)
    u1 = dec.shape[1]
    full = jax.jit(lambda e: rnnt_loss_fused(
        e, dec, jp, labels, t_len, u_len, chunk_size=8))
    wide = jax.jit(lambda e: rnnt_loss_pruned(
        e, dec, jp, labels, t_len, u_len, s_range=u1, chunk_size=8))
    np.testing.assert_allclose(float(wide(enc)), float(full(enc)),
                               rtol=2e-4)
    g = jax.jit(jax.grad(lambda e: rnnt_loss_pruned(
        e, dec, jp, labels, t_len, u_len, s_range=3, chunk_size=8,
        simple_scale=0.25)))(enc)
    assert np.all(np.isfinite(np.asarray(g)))


def test_pruned_upper_bounds_full():
    """Narrow bands drop paths: pruned per-seq NLL >= full NLL."""
    enc, dec, jp, labels, t_len, u_len = _problem(seed=2)
    full = rnnt_loss_fused(enc, dec, jp, labels, t_len, u_len,
                           chunk_size=4, reduction="none")
    for s_range in (2, 3):
        pr = rnnt_loss_pruned(enc, dec, jp, labels, t_len, u_len,
                              s_range=s_range, chunk_size=4,
                              reduction="none")
        assert np.all(np.asarray(pr) >= np.asarray(full) - 1e-4), \
            (s_range, pr, full)


def test_bounds_invariants():
    enc, dec, jp, labels, t_len, u_len = _problem(seed=3)
    sp_b, sp_l = simple_grid_logprobs(enc, dec, jp, labels)
    for s_range in (2, 3, 5):
        rs = np.asarray(pruned_bounds(sp_b, sp_l, t_len, u_len, s_range))
        assert rs.shape == (enc.shape[0], enc.shape[1])
        assert (rs[:, 0] == 0).all()
        gaps = np.diff(rs, axis=1)
        assert (gaps >= 0).all() and (gaps <= s_range - 1).all()
        u_hi = np.maximum(np.asarray(u_len) - (s_range - 1), 0)
        assert (rs <= u_hi[:, None]).all()
        # terminal coverage: (t_len-1, u_len) inside the final band
        for i in range(rs.shape[0]):
            tf = int(t_len[i]) - 1
            assert rs[i, tf] <= int(u_len[i]) <= rs[i, tf] + s_range - 1


def test_pruned_loss_trains():
    """A few SGD steps on the pruned loss must reduce it (gradients flow
    through the banded joint; the bounds are stop-gradient)."""
    enc, dec, jp, labels, t_len, u_len = _problem(seed=4)

    def loss(jp):
        return rnnt_loss_pruned(enc, dec, jp, labels, t_len, u_len,
                                s_range=3, chunk_size=4, simple_scale=0.25)

    g = jax.jit(jax.grad(loss))
    lf = jax.jit(loss)
    first = float(lf(jp))
    for _ in range(12):
        jp = jax.tree_util.tree_map(lambda p, gr: p - 0.05 * gr, jp, g(jp))
    assert float(lf(jp)) < first


def test_logz_kernel_interpret_matches_oracle():
    """Pallas additive-logZ kernel (interpret mode) vs the XLA scan."""
    from transformer_transducer_tpu.ops.pallas.logz_kernel import (
        _logz_pallas, additive_logz_xla)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 19, 37).astype(np.float32))
    l = jnp.asarray(rng.randn(2, 6, 37).astype(np.float32))
    ref = additive_logz_xla(a, l)
    got = _logz_pallas(a, l, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(__import__("os").environ.get("TTX_TEST_TPU") != "1",
                    reason="on-chip kernel check (TTX_TEST_TPU=1)")
def test_logz_kernel_compiled_on_tpu():
    from transformer_transducer_tpu.ops.pallas.logz_kernel import (
        _logz_pallas, additive_logz_xla)
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 300, 1000).astype(np.float32))
    l = jnp.asarray(rng.randn(2, 43, 1000).astype(np.float32))
    ref = additive_logz_xla(a, l)
    got = _logz_pallas(a, l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_additive_logz_grad_matches_autodiff():
    """The custom VJP (scan backward) vs autodiff through the oracle."""
    from transformer_transducer_tpu.ops.pallas.logz_kernel import (
        additive_logz, additive_logz_xla)
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 7, 13).astype(np.float32))
    l = jnp.asarray(rng.randn(2, 4, 13).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 7, 4).astype(np.float32))
    ga, gl = jax.grad(lambda a, l: jnp.sum(additive_logz(a, l) * w),
                      argnums=(0, 1))(a, l)
    ra, rl = jax.grad(lambda a, l: jnp.sum(additive_logz_xla(a, l) * w),
                      argnums=(0, 1))(a, l)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=1e-5, atol=1e-6)


def test_simple_loss_and_occ_consistent():
    """One-sweep loss+occ: loss == rnnt_loss_grid, occ == -grad, and the
    loss output's custom gradient == jax.grad of rnnt_loss_grid."""
    from transformer_transducer_tpu.ops.rnnt_loss_pruned import (
        simple_loss_and_occ)
    rng = np.random.RandomState(2)
    b, t, u1 = 3, 8, 5
    pb = jnp.asarray(rng.randn(b, t, u1).astype(np.float32))
    pl_ = jnp.asarray(rng.randn(b, t, u1).astype(np.float32))
    t_len = jnp.asarray([t, t - 1, t - 2])
    u_len = jnp.asarray([u1 - 1, u1 - 2, 1])
    losses, occ = simple_loss_and_occ(pb, pl_, t_len, u_len)
    ref = rnnt_loss_grid(pb, pl_, t_len, u_len)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref),
                               rtol=1e-5)
    gb, gl = jax.grad(lambda pb, pl_: jnp.sum(
        rnnt_loss_grid(pb, pl_, t_len, u_len)), argnums=(0, 1))(pb, pl_)
    np.testing.assert_allclose(np.asarray(occ), np.asarray(-(gb + gl)),
                               rtol=1e-5, atol=1e-6)
    w = jnp.asarray(rng.randn(b).astype(np.float32))
    g1 = jax.grad(lambda pb: jnp.sum(
        simple_loss_and_occ(pb, pl_, t_len, u_len)[0] * w))(pb)
    g2 = jax.grad(lambda pb: jnp.sum(
        rnnt_loss_grid(pb, pl_, t_len, u_len) * w))(pb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(__import__("os").environ.get("TTX_RUN_OVERFIT") != "1",
                    reason="long memorization run (TTX_RUN_OVERFIT=1)")
def test_pruned_overfit_tone_corpus(tmp_path):
    """Opt-in learning proof for the pruned loss at the narrowest useful
    band (s_range=2): the tone corpus must memorize to <15 % CER —
    evidence the band approximation trains, not just that gradients flow.
    (Measured 182 % -> 9.1 % in 80 tiny epochs; DESIGN.md §1a.)"""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_helpers import make_tone_corpus
    from transformer_transducer_tpu.training.trainer import Trainer
    from transformer_transducer_tpu.utils.config import Config

    root = str(tmp_path / "tones")
    vocab_path, csvs = make_tone_corpus(root, n_train=8, n_dev=4,
                                        n_classes=4)
    d = 32
    cfg = Config({
        "data": {"name": "tone", "vocab": vocab_path,
                 "left_context_width": 3, "right_context_width": 0,
                 "feature_dim": d // 4, "subsample": 3,
                 "max_input_length": 40, "max_target_length": 6,
                 "batch_size": 4, "shuffle": True,
                 "train": csvs["train"], "dev": csvs["train"],
                 "test": csvs["test"]},
        "model": {"type": "transducer",
                  "enc": {"max_input_length": 40, "n_head": 2, "d_model": d,
                          "d_head": d // 2, "d_inner": 64, "n_layer": 1,
                          "left_context": 10, "right_context": 2},
                  "dec": {"max_target_length": 6, "n_head": 2, "d_model": d,
                          "d_head": d // 2, "d_inner": 64, "n_layer": 1},
                  "joint": {"input_size": 2 * d, "inner_size": 32},
                  "vocab_size": 12, "dropout": 0.0},
        "training": {"eval_or_not": True, "seed": 1, "epochs": 120,
                     "specaug": False, "max_grad_norm": 200,
                     "visualization": False, "show_interval": 10000,
                     "save_model": "po", "steps_per_call": 2,
                     "loss_pruned_range": 2, "loss_simple_scale": 0.25},
        "optim": {"type": "adam", "lr": 2e-3, "decay_ratio": 1.0,
                  "weight_decay": 0, "begin_to_adjust_lr": 10000},
    })
    trainer = Trainer(cfg, exp_root=str(tmp_path / "egs"))
    train_loader, dev_loader = trainer.make_loaders()
    cer = 1e9
    for epoch in range(120):
        trainer.train_epoch(epoch, train_loader)
        if epoch % 20 == 19:
            cer = trainer.evaluate(epoch, dev_loader, compute_loss=False)
            if cer < 15.0:
                break
    assert cer < 15.0, f"pruned loss failed to memorize: CER {cer:.1f}%"


def test_trainer_with_pruned_loss(tmp_path):
    """End-to-end: training.loss_pruned_range selects the pruned loss in
    the sharded train step, and the loop still learns."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_helpers import make_corpus, tiny_train_config
    from transformer_transducer_tpu.training.trainer import Trainer

    root = str(tmp_path / "synth")
    vocab_path, csvs = make_corpus(root)
    cfg = tiny_train_config(root, vocab_path, csvs)
    cfg.override("training.loss_pruned_range", 3)
    trainer = Trainer(cfg, exp_root=str(tmp_path / "egs"))
    assert trainer.step_cfg.loss_pruned_range == 3
    train_loader, _ = trainer.make_loaders()
    losses = [trainer.train_epoch(e, train_loader) for e in range(2)]
    assert np.all(np.isfinite(losses))
    assert losses[1] < losses[0]


def test_espnet_family_pruned_loss():
    """The family-dispatching loss path (espnet param extraction, additive
    joint, relu/tanh) works under loss_pruned_range and matches the full
    loss in the unpruned limit."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_espnet_training import espnet_tiny_config
    from data_helpers import make_corpus
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_loss_fn)
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        vocab_path, csvs = make_corpus(root)
        cfg = espnet_tiny_config(root, vocab_path, csvs)
    model = build_espnet_transducer(cfg.model)
    rng = np.random.RandomState(0)
    b, t, u = 2, 18, 4
    x = jnp.asarray(rng.randn(b, t, 16).astype(np.float32))
    y = jnp.asarray(rng.randint(1, 11, (b, u)), dtype=jnp.int32)
    batch = {"inputs": x, "targets": y,
             "inputs_length": jnp.asarray([t, t - 3]),
             "targets_length": jnp.asarray([u, u - 1])}
    params = model.init(jax.random.PRNGKey(0), x[:1, :8],
                        jnp.asarray([8]), y[:1], jnp.asarray([u]))["params"]
    key = jax.random.PRNGKey(1)
    full = make_loss_fn(model, TrainStepConfig(specaug=False))
    # u+1 = 5 <= s_range covers the grid -> exact match
    pruned_wide = make_loss_fn(model, TrainStepConfig(
        specaug=False, loss_pruned_range=8, loss_simple_scale=0.0))
    np.testing.assert_allclose(float(pruned_wide(params, batch, key)),
                               float(full(params, batch, key)), rtol=1e-5)
    pruned = make_loss_fn(model, TrainStepConfig(
        specaug=False, loss_pruned_range=2))
    g = jax.grad(lambda p: pruned(p, batch, key))(params)
    norm = float(sum(jnp.sum(jnp.abs(x)) for x in
                     jax.tree_util.tree_leaves(g)))
    assert np.isfinite(norm) and norm > 0


def test_pruned_tp_loss_matches_replicated():
    """2-way tensor-parallel pruned loss == replicated (GSPMD numerics):
    the simple-joint matmuls, logZ sweep, gathers and band DP must all
    lower correctly with the joint kernels sharded on the model axis."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.ops.rnnt_loss import (
        joint_params_from_variables)
    from transformer_transducer_tpu.parallel import mesh as mesh_lib
    from transformer_transducer_tpu.parallel import sharding as sharding_lib

    model = Transducer(vocab_size=12, enc=(1, 24, 2, 16, 8, 32),
                       dec=(1, 9, 2, 16, 8, 32), joint_inner=16)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(4, 12, 16).astype(np.float32))
    y = jnp.asarray(rng.randint(1, 11, (4, 4)), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :8], y[:1])["params"]
    t_len = jnp.asarray([12, 10, 12, 9])
    u_len = jnp.asarray([4, 3, 4, 2])

    def loss(p):
        enc, dec = model.apply({"params": p}, x, y, method="encode_both")
        jp = joint_params_from_variables({"params": p})
        return rnnt_loss_pruned(enc, dec, jp, y, t_len, u_len,
                                s_range=3, chunk_size=4, simple_scale=0.25)

    ref = float(jax.jit(loss)(params))
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    with mesh:
        sharded = sharding_lib.shard_params(params, mesh)
        got = float(jax.jit(loss)(sharded))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_banded_grids_match_full_joint_on_band():
    """banded_grid_logprobs must agree with the fused full-grid log-probs
    at the banded cells."""
    from transformer_transducer_tpu.ops.rnnt_loss import fused_grid_logprobs
    enc, dec, jp, labels, t_len, u_len = _problem(seed=5)
    s_range = 3
    sp_b, sp_l = simple_grid_logprobs(enc, dec, jp, labels)
    rs = pruned_bounds(sp_b, sp_l, t_len, u_len, s_range)
    bb, bl = banded_grid_logprobs(enc, dec, jp, labels, rs, u_len, s_range,
                                  chunk_size=4)
    fb, fl = fused_grid_logprobs(enc, dec, jp, labels, chunk_size=4)
    rs_n = np.asarray(rs)
    for i in range(enc.shape[0]):
        for t in range(int(t_len[i])):
            for s in range(s_range):
                u = rs_n[i, t] + s
                np.testing.assert_allclose(
                    float(bb[i, t, s]), float(fb[i, t, u]), rtol=1e-5)
                if u < int(u_len[i]):
                    np.testing.assert_allclose(
                        float(bl[i, t, s]), float(fl[i, t, u]), rtol=1e-5)


# ---------------------------------------------------------------------------
# Band-DP Pallas kernels (ops/pallas/band_kernel.py)
# ---------------------------------------------------------------------------

def _band_problem(seed, b, t, u, s_range):
    """Random band grids + monotone rs honoring the bounds_from_occ
    invariants (steps in [0, s_range-1], rs[0] = 0, rs <= u_len-S+1)."""
    from transformer_transducer_tpu.ops.rnnt_loss_pruned import NEG
    r = np.random.RandomState(seed)
    lp_b = jnp.asarray(np.log(r.uniform(0.05, 1.0, (b, t, s_range))),
                       jnp.float32)
    lp_l = jnp.asarray(np.log(r.uniform(0.05, 1.0, (b, t, s_range))),
                       jnp.float32)
    t_len = jnp.asarray(r.randint(max(1, t // 2), t + 1, (b,)), jnp.int32)
    u_len = jnp.asarray(r.randint(1, u + 1, (b,)), jnp.int32)
    steps = r.randint(0, s_range, (b, t - 1))
    rs = np.concatenate([np.zeros((b, 1), np.int64),
                         np.cumsum(steps, axis=1)], axis=1)
    rs = np.minimum(rs, np.maximum(np.asarray(u_len)[:, None]
                                   - s_range + 1, 0))
    rs = jnp.asarray(rs, jnp.int32)
    uidx = np.asarray(rs)[:, :, None] + np.arange(s_range)[None, None, :]
    lp_l = jnp.where(jnp.asarray(uidx < np.asarray(u_len)[:, None, None]),
                     lp_l, NEG)
    return lp_b, lp_l, rs, t_len, u_len


@pytest.mark.parametrize("shape", [(2, 17, 9, 5), (3, 40, 20, 5),
                                   (1, 8, 3, 3), (4, 25, 12, 7),
                                   (2, 12, 40, 5)])
def test_band_dp_pallas_interpret_matches_oracle(shape):
    """Pallas band-DP sweeps (interpret mode) vs the XLA-scan oracle:
    losses AND analytic-VJP gradients."""
    from transformer_transducer_tpu.ops.rnnt_loss_pruned import (
        rnnt_loss_banded_pallas)
    lp_b, lp_l, rs, t_len, u_len = _band_problem(0, *shape)
    want = rnnt_loss_banded_grid(lp_b, lp_l, rs, t_len, u_len)
    got = rnnt_loss_banded_pallas(lp_b, lp_l, rs, t_len, u_len, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    go = jax.grad(lambda a, b: jnp.sum(rnnt_loss_banded_grid(
        a, b, rs, t_len, u_len)), argnums=(0, 1))(lp_b, lp_l)
    gp = jax.grad(lambda a, b: jnp.sum(rnnt_loss_banded_pallas(
        a, b, rs, t_len, u_len, True)), argnums=(0, 1))(lp_b, lp_l)
    for a, b in zip(go, gp):
        # 1e-4-ish abs slack: with TTX_TEST_TPU=1 these interpret-mode
        # arrays are computed by the TPU backend, whose transcendentals
        # differ from the CPU oracle's in the last bits
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-4)


def test_band_dp_pallas_zero_length_rows():
    """t_len = 0 rows yield loss 0 with zero gradients (oracle parity)."""
    from transformer_transducer_tpu.ops.rnnt_loss_pruned import (
        rnnt_loss_banded_pallas)
    lp_b, lp_l, rs, _, u_len = _band_problem(3, 2, 10, 5, 5)
    t_len = jnp.asarray([0, 7], jnp.int32)
    want = rnnt_loss_banded_grid(lp_b, lp_l, rs, t_len, u_len)
    got = rnnt_loss_banded_pallas(lp_b, lp_l, rs, t_len, u_len, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    g = jax.grad(lambda a: jnp.sum(rnnt_loss_banded_pallas(
        a, lp_l, rs, t_len, u_len, True)))(lp_b)
    assert np.all(np.asarray(g)[0] == 0.0)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.skipif(__import__("os").environ.get("TTX_TEST_TPU") != "1",
                    reason="on-chip kernel check (TTX_TEST_TPU=1)")
def test_band_dp_pallas_compiled_on_tpu():
    """Compiled band-DP sweeps on the chip vs the XLA oracle (fwd+grads)."""
    from transformer_transducer_tpu.ops.rnnt_loss_pruned import (
        rnnt_loss_banded_pallas)
    lp_b, lp_l, rs, t_len, u_len = _band_problem(1, 4, 150, 30, 5)
    want = jax.jit(lambda a, b: rnnt_loss_banded_grid(
        a, b, rs, t_len, u_len))(lp_b, lp_l)
    got = jax.jit(lambda a, b: rnnt_loss_banded_pallas(
        a, b, rs, t_len, u_len))(lp_b, lp_l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    go = jax.jit(jax.grad(lambda a, b: jnp.sum(rnnt_loss_banded_grid(
        a, b, rs, t_len, u_len)), argnums=(0, 1)))(lp_b, lp_l)
    gp = jax.jit(jax.grad(lambda a, b: jnp.sum(rnnt_loss_banded_pallas(
        a, b, rs, t_len, u_len)), argnums=(0, 1)))(lp_b, lp_l)
    for a, b in zip(go, gp):
        # analytic occupancies vs autodiff-through-scan differ by on-chip
        # transcendental rounding (~3e-4 abs max at these shapes)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
