"""Incremental KV-cached espnet text encoder == full banded recompute.

The cached analog of the reference's ``forward_one_step``
(``espnet2/asr/encoder/transformer_encoder.py:241-283``) — see
``decoding/espnet_label_cache.py`` for the exactness argument (causal band +
distance-only rel-pos scores).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.decoding import espnet_label_cache as elc
from transformer_transducer_tpu.models.espnet_variant import (
    build_espnet_transducer)
from transformer_transducer_tpu.utils.config import Config

TOL = (dict(rtol=2e-5, atol=2e-5) if jax.default_backend() != "tpu"
       else dict(rtol=3e-2, atol=2e-2))

VOCAB = 11


def _model(n_dec_layers=2, left=2, seed=0):
    cfg = Config({
        "enc": {"input_size": 16, "output_size": 16, "attention_heads": 2,
                "linear_units": 32, "num_blocks": 1, "dropout_rate": 0.0,
                "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
                "input_layer": None, "padding_idx": -1},
        "dec": {"input_size": VOCAB, "output_size": 16, "attention_heads": 2,
                "linear_units": 32, "num_blocks": n_dec_layers,
                "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
                "attention_dropout_rate": 0.0, "input_layer": "embed",
                "padding_idx": -1},
        "joint": {"vocab_size": VOCAB, "joint_space_size": 12,
                  "joint_activation_type": "tanh"},
        "mask": {"encoder_left_mask": 3, "encoder_right_mask": 1,
                 "decoder_left_mask": left},
    })
    model = build_espnet_transducer(cfg)
    rng = np.random.RandomState(seed)
    speech = jnp.asarray(rng.randn(1, 6, 16).astype(np.float32))
    text = jnp.asarray(rng.randint(1, 10, size=(1, 3)))
    variables = model.init(jax.random.PRNGKey(seed), speech,
                           jnp.asarray([6]), text, jnp.asarray([3]))
    return model, variables


@pytest.mark.parametrize("n_layers,left", [(1, 2), (2, 2), (2, 4)])
def test_incremental_equals_full_recompute(n_layers, left):
    model, variables = _model(n_layers, left)
    params = variables["params"]
    rng = np.random.RandomState(1)
    b, cap = 3, 9
    seq = rng.randint(0, VOCAB, size=(b, cap)).astype(np.int32)
    seq[:, 0] = model.sos   # sos seed (tt_espnet/model.py:86)

    cache = elc.init_cache(params, b, cap)
    for u in range(cap):
        out, cache = elc.step(params, jnp.asarray(seq[:, u]), cache,
                              jnp.ones((b,), bool), left=left)
        full = model.apply(variables, jnp.asarray(seq[:, :u + 1]),
                           method="predict")
        np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, -1]),
                                   err_msg=f"position {u}", **TOL)


def test_masked_rows_do_not_advance():
    model, variables = _model(1)
    params = variables["params"]
    b, cap = 2, 6
    sos = model.sos
    cache = elc.init_cache(params, b, cap)
    _, cache = elc.step(params, jnp.asarray([sos, sos]), cache,
                        jnp.ones((b,), bool))
    _, cache = elc.step(params, jnp.asarray([3, 7]), cache,
                        jnp.asarray([True, False]))
    assert int(cache["idx"][0]) == 2 and int(cache["idx"][1]) == 1
    out3, cache = elc.step(params, jnp.asarray([5, 7]), cache,
                           jnp.asarray([False, True]))
    full = model.apply(variables, jnp.asarray([[sos, 7]]), method="predict")
    np.testing.assert_allclose(np.asarray(out3[1]), np.asarray(full[0, -1]),
                               **TOL)


def test_cached_greedy_equals_uncached():
    """use_cache now defaults on for the espnet family; it must emit exactly
    what the full-recompute path emits."""
    from transformer_transducer_tpu.decoding.greedy import greedy_decode
    model, variables = _model(2)
    rng = np.random.RandomState(4)
    speech = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    enc = model.apply(variables, speech, method="encode")
    t_len = jnp.asarray([8, 6])
    kw = dict(max_tokens=6, seed_token=model.sos)
    tok_c, cnt_c = greedy_decode(model, variables, enc, t_len,
                                 use_cache=True, **kw)
    tok_u, cnt_u = greedy_decode(model, variables, enc, t_len,
                                 use_cache=False, **kw)
    np.testing.assert_array_equal(np.asarray(cnt_c), np.asarray(cnt_u))
    np.testing.assert_array_equal(np.asarray(tok_c), np.asarray(tok_u))
