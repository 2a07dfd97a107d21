"""Gradient accumulation (training.grad_accum_steps, optax.MultiSteps).

Contract: K accumulated half-batches produce the SAME update as one
unaccumulated step on the concatenated batch — the loss is a batch mean,
MultiSteps averages the accumulated grads, and grad-clip/LR apply at
update time to the averaged grads.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.parallel import mesh as mesh_lib
from transformer_transducer_tpu.training import optim as optim_lib
from transformer_transducer_tpu.training.train_step import (
    TrainStepConfig, compile_train_step)
from transformer_transducer_tpu.utils.config import Config
import pytest


@pytest.mark.slow  # multi-step equality smoke
def test_two_accumulated_halves_equal_one_full_step():
    model = Transducer(vocab_size=20, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 6, 2, 8, 4, 16), joint_inner=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 12, 8))
    y = jax.random.randint(jax.random.PRNGKey(1), (4, 4), 1, 20)
    t_len = jnp.array([12, 10, 12, 9])
    u_len = jnp.array([4, 3, 4, 2])
    params = model.init(rng, x, y)["params"]
    mesh = mesh_lib.make_mesh(1, 1, devices=jax.devices()[:1])
    cfg = TrainStepConfig(specaug=False)
    ocfg = Config({"type": "sgd", "lr": 0.1, "momentum": 0.9})

    full_tx = optim_lib.build_optimizer(ocfg, 200.0)
    full = compile_train_step(model, full_tx, mesh, params,
                              full_tx.init(params), cfg, donate=False)
    batch = {"inputs": x, "targets": y,
             "inputs_length": t_len, "targets_length": u_len}
    p_full, _, m_full = full(params, full_tx.init(params), batch,
                             jax.random.PRNGKey(2))

    acc_tx = optax.MultiSteps(optim_lib.build_optimizer(ocfg, 200.0),
                              every_k_schedule=2).gradient_transformation()
    acc_state = acc_tx.init(params)
    acc = compile_train_step(model, acc_tx, mesh, params, acc_state, cfg,
                             donate=False)
    halves = [jax.tree_util.tree_map(lambda a, s=s: a[s:s + 2], batch)
              for s in (0, 2)]
    p_acc, acc_state, m0 = acc(params, acc_state, halves[0],
                               jax.random.PRNGKey(2))
    # mini-step 1 of 2: no update applied yet
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(p_acc),
                               jax.tree_util.tree_leaves(params)))
    p_acc, acc_state, m1 = acc(p_acc, acc_state, halves[1],
                               jax.random.PRNGKey(2))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_acc, p_full)
    # the two half losses average to the full-batch loss
    np.testing.assert_allclose(
        (float(m0["loss"]) + float(m1["loss"])) / 2, float(m_full["loss"]),
        rtol=1e-5)


def test_lr_helpers_reach_through_multisteps():
    """Epoch LR decay must find the injected hyperparams inside the
    MultiSteps wrapper state (the Trainer's continue/decay path)."""
    ocfg = Config({"type": "adam", "lr": 1e-3})
    tx = optax.MultiSteps(optim_lib.build_optimizer(ocfg, 200.0),
                          every_k_schedule=2).gradient_transformation()
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert np.isclose(optim_lib.get_learning_rate(state), 1e-3)
    state = optim_lib.set_learning_rate(state, 5e-4)
    assert np.isclose(optim_lib.get_learning_rate(state), 5e-4)
