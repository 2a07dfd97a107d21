import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.decoding.beam import beam_search, recognize_beam
from transformer_transducer_tpu.decoding.greedy import (
    greedy_decode, tokens_to_lists)
from transformer_transducer_tpu.ops.masks import look_ahead_mask


def _tiny_model(vocab=12, seed=0):
    model = Transducer(vocab_size=vocab, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 8, 2, 8, 4, 16), joint_inner=12)
    x = jnp.zeros((1, 4, 8))
    y = jnp.zeros((1, 2), dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), x, y)
    return model, variables


def _python_beam(model, variables, enc_b, t_len_b, w=5, max_tokens=8):
    """Dynamic-shape oracle of the reference algorithm with causal-mask label
    encoding (the jit path's semantics)."""
    def dec_last(tokens):
        buf = jnp.asarray([tokens], dtype=jnp.int32)
        dec = model.apply(variables, buf, look_ahead_mask(len(tokens)),
                          method=Transducer.predict)
        return dec[0, -1]

    def logp(tokens, t):
        logits = model.apply(variables, jnp.asarray(enc_b[t]), dec_last(tokens),
                             method=Transducer.joint_logits)
        return np.array(jax.nn.log_softmax(logits))  # writable copy

    beams = [[0] for _ in range(w)]
    probs = np.zeros(w)
    first = True
    for t in range(t_len_b):
        best = int(probs.argmax())
        lp_best = logp(beams[best], t)
        if int(lp_best.argmax()) == 0:
            continue
        cand_tok = np.zeros((w, w), dtype=int)
        cand_val = np.zeros((w, w))
        for i in range(w):
            lp = logp(beams[i], t)
            lp[0] = -1e30
            order = np.argsort(-lp, kind="stable")[:w]
            cand_tok[i] = order
            cand_val[i] = lp[order]
        if first:
            new_beams = [beams[best] + [int(cand_tok[best, j])] for j in range(w)]
            new_probs = cand_val[best].copy()
            first = False
        else:
            flat = (probs[:, None] + cand_val).ravel()
            top = np.argsort(-flat, kind="stable")[:w]
            new_beams, new_probs = [], np.zeros(w)
            for j, f in enumerate(top):
                parent, k = divmod(f, w)
                tok = int(cand_tok[parent, k])
                nb = beams[parent] + [tok] if len(beams[parent]) < max_tokens else beams[parent]
                new_beams.append(nb)
                new_probs[j] = flat[f]
        beams, probs = new_beams, new_probs
    return beams[int(probs.argmax())][1:]


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_matches_python_oracle(seed):
    model, variables = _tiny_model(seed=seed)
    rng = np.random.RandomState(seed + 10)
    t = 7
    x = jnp.asarray(rng.randn(1, t, 8).astype(np.float32) * 2)
    enc = model.apply(variables, x, None, method=Transducer.encode)
    enc_np = np.asarray(enc)[0]
    got = beam_search(model, variables, enc_np, t, beam_width=5, max_tokens=8)
    ref = _python_beam(model, variables, enc_np, t, w=5, max_tokens=8)
    assert got == ref, f"{got} != {ref}"


def test_recognize_beam_end_to_end():
    model, variables = _tiny_model(seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 8).astype(np.float32))
    res = recognize_beam(model, variables, x, jnp.asarray([6, 4]),
                         max_tokens=8)
    assert len(res) == 2
    for r in res:
        assert all(tok != 0 for tok in r)


def test_beam_width_one_close_to_greedy():
    """width-1 beam = greedy decisions whenever the gate fires; token set
    should be a subsequence of greedy's (the gate skips some frames)."""
    model, variables = _tiny_model(seed=4)
    rng = np.random.RandomState(5)
    t = 8
    x = jnp.asarray(rng.randn(1, t, 8).astype(np.float32) * 2)
    enc = model.apply(variables, x, None, method=Transducer.encode)
    got = beam_search(model, variables, np.asarray(enc)[0], t, beam_width=1,
                      max_tokens=8)
    tokens, counts = greedy_decode(model, variables, enc, jnp.asarray([t]),
                                   max_tokens=8)
    greedy = tokens_to_lists(np.asarray(tokens), np.asarray(counts))[0]
    assert got == greedy, f"width-1 beam {got} != greedy {greedy}"


def test_reference_exact_beam_matches_torch():
    torch = pytest.importorskip("torch")
    from reference_harness import load_reference_tt, tiny_model_config
    from transformer_transducer_tpu.utils import torch_convert as tc
    from transformer_transducer_tpu.decoding.beam import (
        beam_search_reference_exact)

    tt = load_reference_tt()
    cfg = tiny_model_config()
    torch.manual_seed(4)
    ref = tt.model.Transducer(cfg)
    ref.eval()
    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, tc.transducer_params(
        to_np(ref.encoder), to_np(ref.decoder), to_np(ref.joint)))
    from transformer_transducer_tpu.models.transducer import Transducer
    model = Transducer(vocab_size=cfg.vocab_size,
                       enc=(cfg.enc.n_layer, cfg.enc.max_input_length,
                            cfg.enc.n_head, cfg.enc.d_model, cfg.enc.d_head,
                            cfg.enc.d_inner),
                       dec=(cfg.dec.n_layer, cfg.dec.max_target_length,
                            cfg.dec.n_head, cfg.dec.d_model, cfg.dec.d_head,
                            cfg.dec.d_inner),
                       joint_inner=cfg.joint.inner_size, dropout=0.0)

    rng = np.random.RandomState(21)
    x = rng.randn(1, 8, cfg.enc.d_model).astype(np.float32) * 2
    with torch.no_grad():
        ref_res = ref.recognize_beam_search(torch.from_numpy(x),
                                            torch.tensor([8]))
    enc = model.apply(variables, jnp.asarray(x), None, method="encode")
    got = beam_search_reference_exact(model, variables, np.asarray(enc)[0], 8)
    assert got == ref_res[0], f"{got} != {ref_res[0]}"


@pytest.mark.parametrize("seed", [0, 3])
def test_beam_cache_matches_recompute(seed):
    """use_cache=True (parent-gathered incremental KV label encoding) must
    reproduce the full-recompute path exactly — beams, counts AND scores."""
    from transformer_transducer_tpu.decoding.beam import beam_search_batched
    model, variables = _tiny_model(seed=seed)
    rng = np.random.RandomState(40 + seed)
    enc = jnp.asarray(rng.randn(3, 12, 8).astype(np.float32) * 2)
    t_len = jnp.asarray([12, 9, 5])
    b_c, c_c, p_c = beam_search_batched(model, variables, enc, t_len,
                                        beam_width=3, max_tokens=6,
                                        use_cache=True)
    b_r, c_r, p_r = beam_search_batched(model, variables, enc, t_len,
                                        beam_width=3, max_tokens=6,
                                        use_cache=False)
    np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_r))
    np.testing.assert_array_equal(np.asarray(b_c), np.asarray(b_r))
    # trajectories (beams/counts) are bit-equal on both backends; the scores
    # pick up the usual bf16-MXU grouping delta (~2e-3) on real TPU because
    # the incremental and dense label encodings order the matmuls differently
    tol = (dict(rtol=1e-5, atol=1e-5) if jax.default_backend() != "tpu"
           else dict(rtol=3e-3, atol=3e-3))
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_r), **tol)


def test_beam_rejects_unknown_layout():
    """An unrecognized joint layout must fail with a clear contract error,
    not an opaque KeyError deep in the loop."""
    from transformer_transducer_tpu.decoding.beam import beam_search_batched
    model, _ = _tiny_model(seed=0)
    fake_vars = {"params": {"joint": {"mystery": {}}, "decoder": {}}}
    with pytest.raises(ValueError, match="layout"):
        beam_search_batched(model, fake_vars, jnp.zeros((1, 4, 8)),
                            jnp.asarray([4]))


# ---------------------------------------------------------------------------
# Espnet-family beam (round 4, beyond-reference: the reference decodes its
# espnet variant greedily, tt_espnet/model.py:83-121)

def _tiny_espnet(vocab=12, d=16, seed=0):
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from test_incremental_streaming import _espnet_model
    return _espnet_model(vocab=vocab, d=d, seed=seed)


def _python_beam_espnet(model, variables, enc_b, t_len_b, w=5, max_tokens=8):
    """Same dynamic-shape oracle as ``_python_beam`` with the espnet label
    surface: sos seed, band-internal ``predict``."""
    sos = model.vocab_size - 1

    def dec_last(tokens):
        buf = jnp.asarray([tokens], dtype=jnp.int32)
        dec = model.apply(variables, buf, look_ahead_mask(len(tokens)),
                          method=type(model).predict)
        return dec[0, -1]

    def logp(tokens, t):
        logits = model.apply(variables, jnp.asarray(enc_b[t]),
                             dec_last(tokens),
                             method=type(model).joint_logits)
        return np.array(jax.nn.log_softmax(logits))

    beams = [[sos] for _ in range(w)]
    probs = np.zeros(w)
    first = True
    for t in range(t_len_b):
        best = int(probs.argmax())
        lp_best = logp(beams[best], t)
        if int(lp_best.argmax()) == 0:
            continue
        cand_tok = np.zeros((w, w), dtype=int)
        cand_val = np.zeros((w, w))
        for i in range(w):
            lp = logp(beams[i], t)
            lp[0] = -1e30
            order = np.argsort(-lp, kind="stable")[:w]
            cand_tok[i] = order
            cand_val[i] = lp[order]
        if first:
            new_beams = [beams[best] + [int(cand_tok[best, j])]
                         for j in range(w)]
            new_probs = cand_val[best].copy()
            first = False
        else:
            flat = (probs[:, None] + cand_val).ravel()
            top = np.argsort(-flat, kind="stable")[:w]
            new_beams, new_probs = [], np.zeros(w)
            for j, f in enumerate(top):
                parent, kk = divmod(f, w)
                tok = int(cand_tok[parent, kk])
                nb = beams[parent] + [tok] \
                    if len(beams[parent]) < max_tokens else beams[parent]
                new_beams.append(nb)
                new_probs[j] = flat[f]
        beams, probs = new_beams, new_probs
    return beams[int(probs.argmax())][1:]


@pytest.mark.parametrize("seed", [0, 1])
def test_espnet_beam_matches_python_oracle(seed):
    from transformer_transducer_tpu.decoding.beam import beam_search_batched
    model, variables = _tiny_espnet(seed=seed)
    rng = np.random.RandomState(seed + 10)
    t = 7
    x = jnp.asarray(rng.randn(1, t, 16).astype(np.float32) * 2)
    enc = np.asarray(model.apply(variables, x, None, method="encode"))[0]
    for use_cache in (False, True):
        beams, counts, _ = beam_search_batched(
            model, variables, jnp.asarray(enc[None]), jnp.asarray([t]),
            beam_width=5, max_tokens=8, use_cache=use_cache)
        n = int(np.asarray(counts)[0, 0])
        got = list(map(int, np.asarray(beams)[0, 0, 1:n]))
        ref = _python_beam_espnet(model, variables, enc, t, w=5,
                                  max_tokens=8)
        assert got == ref, f"cache={use_cache}: {got} != {ref}"


def test_espnet_beam_width_one_matches_greedy():
    from transformer_transducer_tpu.decoding.beam import beam_search_batched
    model, variables = _tiny_espnet(seed=4)
    rng = np.random.RandomState(5)
    t = 8
    x = jnp.asarray(rng.randn(1, t, 16).astype(np.float32) * 2)
    enc = model.apply(variables, x, None, method="encode")
    beams, counts, _ = beam_search_batched(
        model, variables, enc, jnp.asarray([t]), beam_width=1, max_tokens=8)
    n = int(np.asarray(counts)[0, 0])
    got = list(map(int, np.asarray(beams)[0, 0, 1:n]))
    tokens, cnts = greedy_decode(model, variables, enc, jnp.asarray([t]),
                                 max_tokens=8,
                                 seed_token=model.vocab_size - 1)
    greedy = tokens_to_lists(np.asarray(tokens), np.asarray(cnts))[0]
    assert got == greedy, f"width-1 espnet beam {got} != greedy {greedy}"
