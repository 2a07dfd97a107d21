"""Incremental KV-cached label encoder == full causal-mask recompute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.decoding import label_cache as lc
from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import look_ahead_mask

# compiled TPU f32 matmuls round through bf16 MXU passes; the incremental and
# dense paths group operations differently, so compiled equality is approximate
TOL = (dict(rtol=2e-5, atol=2e-5) if jax.default_backend() != "tpu"
       else dict(rtol=3e-2, atol=2e-2))


def _model(n_dec_layers=2, seed=0):
    model = Transducer(vocab_size=12, enc=(1, 16, 2, 16, 8, 32),
                       dec=(n_dec_layers, 6, 2, 16, 8, 32), joint_inner=16)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4, 16)),
                           jnp.zeros((1, 2), jnp.int32))
    return model, variables


@pytest.mark.parametrize("n_layers", [1, 2])
def test_incremental_equals_full_recompute(n_layers):
    model, variables = _model(n_layers)
    params = variables["params"]
    rng = np.random.RandomState(0)
    b, cap = 3, 8   # cap > dec k_len (6): exercises the front-pad rule too
    seq = rng.randint(0, 12, size=(b, cap)).astype(np.int32)
    seq[:, 0] = 0   # blank seed

    cache = lc.init_cache(params, b, cap)
    for u in range(cap):
        out, cache = lc.step(params, jnp.asarray(seq[:, u]), cache,
                             jnp.ones((b,), bool))
        # full recompute over the first u+1 tokens with the causal mask
        buf = jnp.asarray(seq[:, :u + 1])
        full = model.apply(variables, buf, look_ahead_mask(u + 1),
                           method="predict")
        np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, -1]),
                                   err_msg=f"position {u}", **TOL)


def test_masked_rows_do_not_advance():
    model, variables = _model(1)
    params = variables["params"]
    b, cap = 2, 6
    cache = lc.init_cache(params, b, cap)
    out1, cache = lc.step(params, jnp.asarray([0, 0]), cache,
                          jnp.ones((b,), bool))
    # advance only row 0
    out2, cache = lc.step(params, jnp.asarray([3, 7]), cache,
                          jnp.asarray([True, False]))
    assert int(cache["idx"][0]) == 2 and int(cache["idx"][1]) == 1
    # row 1's cache is untouched: re-stepping it with its token must equal a
    # fresh 2-token recompute
    out3, cache = lc.step(params, jnp.asarray([5, 7]), cache,
                          jnp.asarray([False, True]))
    buf = jnp.asarray([[0, 7]])
    full = model.apply(variables, buf, look_ahead_mask(2), method="predict")
    np.testing.assert_allclose(np.asarray(out3[1]), np.asarray(full[0, -1]),
                               **TOL)


def test_greedy_cache_with_numpy_leaf_params(tmp_path):
    """Restored checkpoints hold numpy leaves; cached greedy must accept them
    (regression: TracerArrayConversionError on table[traced_idx])."""
    from transformer_transducer_tpu.decoding.greedy import greedy_decode
    from transformer_transducer_tpu.utils import checkpoint as ck
    model, variables = _model(2)
    path = ck.save_checkpoint(str(tmp_path / "ck"), variables["params"])
    params, _, _ = ck.load_checkpoint(path, variables["params"])
    assert isinstance(jax.tree_util.tree_leaves(params)[0], np.ndarray)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    enc = model.apply({"params": params}, x, None, method="encode")
    tokens, counts = greedy_decode(model, {"params": params}, enc,
                                   jnp.asarray([6, 4]), max_tokens=6)
    ref_tokens, ref_counts = greedy_decode(model, variables, enc,
                                           jnp.asarray([6, 4]), max_tokens=6)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
