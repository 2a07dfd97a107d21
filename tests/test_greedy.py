import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.decoding.greedy import (
    greedy_decode, tokens_to_lists, recognize, decode_reference_exact)
from transformer_transducer_tpu.ops.masks import look_ahead_mask


def _tiny_model(vocab=12, seed=0):
    model = Transducer(vocab_size=vocab, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 6, 2, 8, 4, 16), joint_inner=12)
    x = jnp.zeros((1, 4, 8))
    y = jnp.zeros((1, 2), dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), x, y)
    return model, variables


def _python_causal_greedy(model, variables, enc_b, t_len_b, max_tokens=7):
    """Dynamic-length oracle with the causal label mask (the jit path's
    semantics): recompute the label encoder on the true-length history."""
    tokens = [0]

    def dec_last():
        buf = jnp.asarray([tokens], dtype=jnp.int32)
        mask = look_ahead_mask(len(tokens))
        dec = model.apply(variables, buf, mask, method=Transducer.predict)
        return dec[0, -1]

    dec_state = dec_last()
    for t in range(t_len_b):
        logits = model.apply(variables, jnp.asarray(enc_b[t]), dec_state,
                             method=Transducer.joint_logits)
        pred = int(jnp.argmax(logits))
        if pred != 0 and len(tokens) < max_tokens:
            tokens.append(pred)
            dec_state = dec_last()
    return tokens[1:]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_matches_dynamic_causal_oracle(seed):
    if jax.default_backend() == "tpu":
        pytest.skip("random-model argmax ties flip under MXU f32 rounding; "
                    "the oracle equality is a logic test (CPU)")
    model, variables = _tiny_model(seed=seed)
    rng = np.random.RandomState(seed)
    b, t = 3, 10
    x = jnp.asarray(rng.randn(b, t, 8).astype(np.float32) * 2)
    t_len = jnp.asarray([t, t - 3, t - 6])
    enc = model.apply(variables, x, None, method=Transducer.encode)
    tokens, counts = greedy_decode(model, variables, enc, t_len, max_tokens=7)
    got = tokens_to_lists(np.asarray(tokens), np.asarray(counts))
    enc_np = np.asarray(enc)
    for i in range(b):
        ref = _python_causal_greedy(model, variables, enc_np[i],
                                    int(t_len[i]), max_tokens=7)
        assert got[i] == ref, f"batch {i}: {got[i]} != {ref}"


def test_recognize_end_to_end():
    model, variables = _tiny_model()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    res = recognize(model, variables, x, jnp.asarray([8, 5]), max_tokens=7)
    assert len(res) == 2
    for r in res:
        assert all(tok != 0 for tok in r)
        assert len(r) <= 6


def test_token_budget_respected():
    model, variables = _tiny_model(seed=5)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 12, 8).astype(np.float32) * 3)
    enc = model.apply(variables, x, None, method=Transducer.encode)
    tokens, counts = greedy_decode(model, variables, enc, jnp.asarray([12]),
                                   max_tokens=3)
    assert int(counts[0]) <= 3


def test_reference_exact_matches_torch_reference():
    torch = pytest.importorskip("torch")
    from reference_harness import load_reference_tt, tiny_model_config
    from transformer_transducer_tpu.utils import torch_convert as tc

    tt = load_reference_tt()
    cfg = tiny_model_config()
    torch.manual_seed(1)
    ref = tt.model.Transducer(cfg)
    ref.eval()
    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = tc.transducer_params(to_np(ref.encoder), to_np(ref.decoder),
                                     to_np(ref.joint))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = Transducer(vocab_size=cfg.vocab_size,
                       enc=(cfg.enc.n_layer, cfg.enc.max_input_length,
                            cfg.enc.n_head, cfg.enc.d_model, cfg.enc.d_head,
                            cfg.enc.d_inner),
                       dec=(cfg.dec.n_layer, cfg.dec.max_target_length,
                            cfg.dec.n_head, cfg.dec.d_model, cfg.dec.d_head,
                            cfg.dec.d_inner),
                       joint_inner=cfg.joint.inner_size, dropout=0.0)

    rng = np.random.RandomState(7)
    x = rng.randn(2, 10, cfg.enc.d_model).astype(np.float32) * 2
    with torch.no_grad():
        ref_res = ref.recognize(torch.from_numpy(x),
                                inputs_length=torch.tensor([10, 7]))
    enc = model.apply(variables, jnp.asarray(x), None, method=Transducer.encode)
    enc_np = np.asarray(enc)
    for i, t_len in enumerate([10, 7]):
        got = decode_reference_exact(model, variables, enc_np[i], t_len)
        assert got == ref_res[i], f"batch {i}: {got} != {ref_res[i]}"
