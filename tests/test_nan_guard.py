"""Failure detection: nan_guard'd train steps skip non-finite updates.

Beyond-reference subsystem (the reference's loop applies whatever the
backward produced, ``train.py:31-65``).  Contract under test:

* a batch producing a non-finite loss leaves params AND optimizer state
  bit-identical (the skip happens inside the compiled program);
* a finite batch under the guard is bit-identical to the unguarded step;
* the trainer aborts after ``max_skipped_steps`` consecutive skips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.parallel import mesh as mesh_lib
from transformer_transducer_tpu.training import optim as optim_lib
from transformer_transducer_tpu.training.train_step import (
    TrainStepConfig, compile_train_scan, compile_train_step)
from transformer_transducer_tpu.utils.config import Config


def _setup(nan_guard=True):
    model = Transducer(vocab_size=20, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 6, 2, 8, 4, 16), joint_inner=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 12, 8))
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 1, 20)
    params = model.init(rng, x, y)["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "adam", "lr": 1e-3}), 200.0)
    opt_state = tx.init(params)
    mesh = mesh_lib.make_mesh(1, 1, devices=jax.devices()[:1])
    cfg = TrainStepConfig(specaug=False, nan_guard=nan_guard)
    step = compile_train_step(model, tx, mesh, params, opt_state, cfg,
                              donate=False)
    good = {"inputs": x, "targets": y,
            "inputs_length": jnp.array([12, 10]),
            "targets_length": jnp.array([4, 3])}
    bad = dict(good, inputs=x.at[0, 0, 0].set(jnp.inf))
    return model, tx, mesh, params, opt_state, cfg, step, good, bad


def _tree_equal(a, b):
    return all(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda u, v: bool(np.array_equal(np.asarray(u), np.asarray(v))),
        a, b)))


def test_bad_batch_is_skipped():
    _, _, _, params, opt_state, _, step, good, bad = _setup()
    p2, o2, m = step(params, opt_state, bad, jax.random.PRNGKey(2))
    assert int(m["skipped"]) == 1
    assert not np.isfinite(float(m["loss"]))
    assert _tree_equal(p2, params) and _tree_equal(o2, opt_state)
    # and the run continues: the next (good) step applies normally
    p3, o3, m3 = step(p2, o2, good, jax.random.PRNGKey(3))
    assert int(m3["skipped"]) == 0 and np.isfinite(float(m3["loss"]))
    assert not _tree_equal(p3, params)


def test_guarded_good_step_matches_unguarded():
    model, tx, mesh, params, opt_state, _, step, good, _ = _setup()
    unguarded = compile_train_step(
        model, tx, mesh, params, opt_state,
        TrainStepConfig(specaug=False, nan_guard=False), donate=False)
    pg, og, mg = step(params, opt_state, good, jax.random.PRNGKey(2))
    pu, ou, mu = unguarded(params, opt_state, good, jax.random.PRNGKey(2))
    assert int(mg["skipped"]) == 0
    assert float(mg["loss"]) == float(mu["loss"])
    assert _tree_equal(pg, pu) and _tree_equal(og, ou)


@pytest.mark.slow  # scan variant of bad_batch_is_skipped
def test_scan_skips_only_the_bad_step():
    model, tx, mesh, params, opt_state, cfg, step, good, bad = _setup()
    scan = compile_train_scan(model, tx, mesh, params, opt_state, cfg,
                              donate=False)
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                     bad, good)
    rng = jax.random.PRNGKey(7)
    p2, o2, ms = scan(params, opt_state, stacked, rng)
    assert np.asarray(ms["skipped"]).tolist() == [1, 0]
    # step 1 (bad) was a no-op, so the outcome equals the single good step
    # run with the scan's second per-step rng
    rngs = jax.random.split(rng, 2)
    p_ref, o_ref, _ = step(params, opt_state, good, rngs[1])
    assert _tree_equal(p2, p_ref) and _tree_equal(o2, o_ref)


def test_trainer_aborts_after_consecutive_skips():
    from transformer_transducer_tpu.training.trainer import Trainer
    t = Trainer.__new__(Trainer)   # bookkeeping only — no model needed
    t.max_skipped_steps = 3
    t._consecutive_skips = 0
    t.total_skips = 0
    t.global_step = 0

    class _Log:
        def warning(self, *a):
            pass
    t.logger = _Log()
    t._note_skips([1, 0, 1, 1])          # reset in the middle: no abort
    assert t._consecutive_skips == 2
    with pytest.raises(RuntimeError, match="diverged"):
        t._note_skips([1])
