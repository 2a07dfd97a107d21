import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.attention import (
    rel_shift, _slice_pos_table, RelLearnableSelfAttention, PositionwiseFF,
    TransformerXLLayer)
from transformer_transducer_tpu.ops.masks import (
    look_ahead_mask, context_mask, context_mask_np, padding_mask)


def _torch_style_rel_shift(x):
    """Literal numpy simulation of the reference pad/view trick
    (``tt/transformer.py:82-95``), operating on (q, k, B, H)."""
    q, k = x.shape[0], x.shape[1]
    zero = np.zeros((q, 1) + x.shape[2:], dtype=x.dtype)
    xp = np.concatenate([zero, x], axis=1)            # (q, k+1, ...)
    xp = xp.reshape((k + 1, q) + x.shape[2:])         # flat-order view
    return xp[1:].reshape(x.shape)


def test_rel_shift_matches_reference_trick():
    rng = np.random.RandomState(0)
    for q in [1, 3, 7, 16]:
        x = rng.randn(q, q, 2, 4).astype(np.float32)
        ref = _torch_style_rel_shift(x)
        # ours works on (..., q, k) — move batch/head dims to front
        ours = np.asarray(rel_shift(jnp.asarray(x.transpose(2, 3, 0, 1))))
        np.testing.assert_allclose(ours.transpose(2, 3, 0, 1), ref, rtol=1e-6)


def test_rel_shift_semantics_lower_triangle():
    # for j <= i the shift must realize BD[i, j] = x[i, k - 1 - (i - j)]
    q = 5
    x = np.arange(q * q, dtype=np.float32).reshape(1, q, q)
    shifted = np.asarray(rel_shift(jnp.asarray(x)))[0]
    for i in range(q):
        for j in range(i + 1):
            assert shifted[i, j] == x[0, i, q - 1 - (i - j)]


def test_pos_table_slice_and_frontpad():
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    out = _slice_pos_table(table, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[2:]))
    out2 = _slice_pos_table(table, 6)
    assert out2.shape == (6, 3)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(table[0]))
    np.testing.assert_array_equal(np.asarray(out2[1]), np.asarray(table[0]))
    np.testing.assert_array_equal(np.asarray(out2[2:]), np.asarray(table))


def test_masks():
    la = np.asarray(look_ahead_mask(4))
    assert la.dtype == bool and la[0, 1] and not la[1, 1] and not la[2, 1]
    cm = np.asarray(context_mask(8, left=2, right=1))
    assert not cm[3, 1] and cm[3, 0]          # left window = 2
    assert not cm[3, 4] and cm[3, 5]          # right window = 1
    np.testing.assert_array_equal(cm, context_mask_np(8, 2, 1))
    pm = np.asarray(padding_mask(jnp.asarray([2, 4]), 4))
    np.testing.assert_array_equal(pm, [[False, False, True, True],
                                       [False, False, False, False]])


def test_attention_masking_blocks_future():
    """With a causal mask, changing future inputs must not affect output."""
    layer = TransformerXLLayer(k_len=8, n_head=2, d_model=8, d_head=4,
                               d_inner=16, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    mask = look_ahead_mask(6)
    params = layer.init(rng, x, mask)
    y1 = layer.apply(params, x, mask)
    x2 = x.at[:, 4:].set(0.0)
    y2 = layer.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               rtol=2e-5, atol=2e-5)


def test_context_mask_limits_receptive_field():
    layer = TransformerXLLayer(k_len=16, n_head=2, d_model=8, d_head=4,
                               d_inner=16, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 8))
    mask = context_mask(12, left=2, right=1)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    y1 = layer.apply(params, x, mask)
    # perturb a frame 4 positions away: inside row 8's forbidden zone
    x2 = x.at[:, 3].set(0.0)
    y2 = layer.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(y1[:, 8]), np.asarray(y2[:, 8]),
                               rtol=2e-5, atol=2e-5)
    # but its neighbour (row 4, distance 1) must change
    assert not np.allclose(np.asarray(y1[:, 4]), np.asarray(y2[:, 4]))


def test_ff_shares_layernorm_params():
    ff = PositionwiseFF(d_model=8, d_inner=16)
    x = jnp.ones((1, 3, 8))
    params = ff.init(jax.random.PRNGKey(0), x)
    names = jax.tree_util.tree_map(lambda x: x.shape, params)["params"]
    assert "ln" in names and "ln_1" not in str(names)


def test_layer_shapes_and_determinism():
    layer = TransformerXLLayer(k_len=10, n_head=2, d_model=8, d_head=4,
                               d_inner=16, dropout=0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x, deterministic=True)
    assert y.shape == x.shape
    y_drop = layer.apply(params, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y), np.asarray(y_drop))
