"""Pipeline-parallel encoder: stage/microbatch invariance + grad parity.

Runs on the conftest's 8 virtual CPU devices.  The property under test is
the one DESIGN.md demands of every parallel path: the sharded program is a
pure re-layout — any (n_stages, n_micro) must match the single-device
``model.encode`` (forward AND reverse mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import context_mask
from transformer_transducer_tpu.parallel.pipeline import (
    encode_pipelined, pipe_mesh)


def _model_and_data(n_layer=4, d_model=32, b=4, t=24, seed=0):
    model = Transducer(vocab_size=40, enc=(n_layer, 64, 4, d_model, 8, 64),
                       dec=(1, 8, 2, d_model, 8, 64), joint_inner=32)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, t, d_model))
    y = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, 6), 1, 40)
    variables = {"params": model.init(rng, x[:, :8], y[:, :3])["params"]}
    return model, variables, x


@pytest.mark.parametrize("n_stages,n_micro", [(1, 1), (2, 1), (2, 4),
                                              (4, 2), (4, 4), (8, 2)])
def test_pipeline_matches_single_device(n_stages, n_micro):
    model, variables, x = _model_and_data(n_layer=8, b=4)
    ref = model.apply(variables, x, method=model.encode)
    out = encode_pipelined(model, variables, x, pipe_mesh(n_stages),
                           n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_with_mask():
    model, variables, x = _model_and_data(n_layer=4, t=24)
    mask = context_mask(24, 4, 2)
    ref = model.apply(variables, x, mask, method=model.encode)
    out = encode_pipelined(model, variables, x, pipe_mesh(4), n_micro=2,
                           attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # backward correctness is pinned by the default-on pp train-step dp-parity (losses AND updated params)
def test_pipeline_backward_is_reverse_pipeline():
    """Autodiff through ppermute+scan = the reverse pipeline schedule;
    grads must match the unpipelined encoder's."""
    model, variables, x = _model_and_data(n_layer=4, b=4, t=16)

    def loss_ref(variables, x):
        h = model.apply(variables, x, method=model.encode)
        return jnp.sum(h ** 2)

    def loss_pp(variables, x):
        h = encode_pipelined(model, variables, x, pipe_mesh(4), n_micro=2)
        return jnp.sum(h ** 2)

    g_ref = jax.grad(loss_ref)(variables, x)
    g_pp = jax.grad(loss_pp)(variables, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        g_ref["params"]["encoder"], g_pp["params"]["encoder"])


def test_pipeline_rejects_bad_split():
    model, variables, x = _model_and_data(n_layer=4)
    with pytest.raises(ValueError, match="divide over"):
        encode_pipelined(model, variables, x, pipe_mesh(3), n_micro=1)
    with pytest.raises(ValueError, match="microbatches"):
        encode_pipelined(model, variables, x, pipe_mesh(2), n_micro=3)
