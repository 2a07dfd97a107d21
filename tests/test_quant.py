"""Int8 quantized inference (ops/quant.py).

Beyond-reference capability (the reference deploys float TorchScript,
``assets/script.py:40-60``); tests cover the op-level error bound, the
param-tree conversion structure, and end-to-end greedy-decode agreement
with the float model for BOTH families, cached and uncached.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_transducer_tpu.decoding.greedy import greedy_decode, tokens_to_lists
from transformer_transducer_tpu.models.espnet_variant import EspnetTransducer
from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.quant import (
    QuantDense, apply_dense_params, quant_dense_apply, quantize_activation,
    quantize_params, quantize_variables, quantize_weight)

ENC = (2, 32, 2, 16, 8, 32)
DEC = (1, 8, 2, 16, 8, 32)
V = 11


def _native_pair():
    m = Transducer(vocab_size=V, enc=ENC, dec=DEC, joint_inner=24)
    mq = Transducer(vocab_size=V, enc=ENC, dec=DEC, joint_inner=24, quant=True)
    return m, mq


def _espnet_pair():
    def kw(blocks, input_layer, input_size, padding_idx):
        return (("output_size", 16), ("attention_heads", 2),
                ("linear_units", 32), ("num_blocks", blocks),
                ("dropout_rate", 0.0), ("positional_dropout_rate", 0.0),
                ("attention_dropout_rate", 0.0), ("input_layer", input_layer),
                ("input_size", input_size), ("padding_idx", padding_idx))
    mk = lambda q: EspnetTransducer(
        vocab_size=V, enc_kwargs=kw(2, None, None, None),
        dec_kwargs=kw(1, "embed", V, -1), joint_space_size=24, quant=q)
    return mk(False), mk(True)


def test_weight_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48))
    q = quantize_weight(w)
    assert q["kernel_q"].dtype == jnp.int8
    deq = q["kernel_q"].astype(jnp.float32) * q["scale"][None]
    # symmetric per-channel: |err| <= scale/2 per element
    assert np.all(np.abs(np.array(deq - w)) <= np.array(q["scale"])[None] * 0.5 + 1e-7)


def test_activation_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 64)) * 3.0
    x_q, s_a = quantize_activation(x)
    deq = x_q.astype(jnp.float32) * s_a
    assert np.all(np.abs(np.array(deq - x)) <= np.array(s_a) * 0.5 + 1e-7)


def test_quant_dense_matches_float_within_tolerance():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (16, 128))
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 96)) / np.sqrt(128)
    b = jax.random.normal(jax.random.PRNGKey(4), (96,)) * 0.1
    qw = quantize_weight(w)
    y_q = quant_dense_apply(x, qw["kernel_q"], qw["scale"], b)
    y_f = x @ w + b
    rel = np.linalg.norm(y_q - y_f) / np.linalg.norm(y_f)
    assert rel < 0.02, rel


def test_apply_dense_params_dispatches_both_layouts():
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 32))
    w = jax.random.normal(jax.random.PRNGKey(6), (32, 16))
    b = jnp.ones((16,))
    f = apply_dense_params(x, {"kernel": w, "bias": b})
    np.testing.assert_allclose(np.array(f), np.array(x @ w + b), rtol=1e-6)
    q = apply_dense_params(x, quantize_weight(w))
    rel = np.linalg.norm(q - x @ w) / np.linalg.norm(x @ w)
    assert rel < 0.02
    # module twin produces the same numbers from the same params
    qd = QuantDense(features=16, use_bias=False)
    qm = qd.apply({"params": quantize_weight(w)}, x)
    np.testing.assert_allclose(np.array(qm), np.array(q), rtol=1e-6)


@pytest.mark.parametrize("family", ["native", "espnet"])
def test_quantized_tree_structure_matches_quant_init(family):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 1, V)
    tl = jnp.asarray([12, 9])
    if family == "native":
        m, mq = _native_pair()
        v = m.init(jax.random.PRNGKey(0), x, y)
        vq0 = mq.init(jax.random.PRNGKey(0), x, y)
    else:
        m, mq = _espnet_pair()
        v = m.init(jax.random.PRNGKey(0), x, tl, y, jnp.asarray([5, 4]))
        vq0 = mq.init(jax.random.PRNGKey(0), x, tl, y, jnp.asarray([5, 4]))
    vq = quantize_variables(v)
    assert (jax.tree_util.tree_structure(vq)
            == jax.tree_util.tree_structure(vq0))
    # non-Dense leaves pass through untouched (embeddings, LN, pos tables)
    flat = jax.tree_util.tree_leaves_with_path(vq)
    assert any("embedding" in jax.tree_util.keystr(p) for p, _ in flat)


@pytest.mark.parametrize("family", ["native", "espnet"])
def test_quantized_logits_close_and_argmax_agrees(family):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 1, V)
    tl = jnp.asarray([12, 9])
    if family == "native":
        m, mq = _native_pair()
        v = m.init(jax.random.PRNGKey(0), x, y)
        lf = m.apply(v, x, y)
        lq = mq.apply(quantize_variables(v), x, y)
    else:
        m, mq = _espnet_pair()
        ul = jnp.asarray([5, 4])
        v = m.init(jax.random.PRNGKey(0), x, tl, y, ul)
        lf = m.apply(v, x, tl, y, ul)
        lq = mq.apply(quantize_variables(v), x, tl, y, ul)
    rel = np.linalg.norm(lq - lf) / np.linalg.norm(lf)
    assert rel < 0.05, rel
    agree = float((np.argmax(np.array(lq), -1) == np.argmax(np.array(lf), -1)).mean())
    assert agree > 0.95, agree


@pytest.mark.parametrize("family", ["native", "espnet"])
@pytest.mark.parametrize("use_cache", [True, False])
def test_quantized_greedy_decode_matches_float(family, use_cache):
    """W8A8 keeps enough precision that greedy token streams match the float
    model on a tiny random model (fixed seeds; CPU-deterministic)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 1, V)
    tl = jnp.asarray([12, 9])
    if family == "native":
        m, mq = _native_pair()
        v = m.init(jax.random.PRNGKey(0), x, y)
        vq = quantize_variables(v)
        ef = m.apply(v, x, method=m.encode)
        eq = mq.apply(vq, x, method=mq.encode)
    else:
        m, mq = _espnet_pair()
        v = m.init(jax.random.PRNGKey(0), x, tl, y, jnp.asarray([5, 4]))
        vq = quantize_variables(v)
        ef = m.apply(v, x, tl, method=m.encode)
        eq = mq.apply(vq, x, tl, method=mq.encode)
    tf, cf = greedy_decode(m, v, ef, tl, max_tokens=8, use_cache=use_cache)
    tq, cq = greedy_decode(mq, vq, eq, tl, max_tokens=8, use_cache=use_cache)
    assert tokens_to_lists(np.array(tf), np.array(cf)) \
        == tokens_to_lists(np.array(tq), np.array(cq))


def test_quantize_params_skips_conv_and_tables():
    """4-D conv kernels and raw param leaves must pass through unchanged."""
    tree = {
        "conv": {"kernel": jnp.ones((3, 3, 1, 8)), "bias": jnp.zeros((8,))},
        "dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))},
        "r_emb": jnp.ones((5, 2, 4)),
        "ln": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }
    out = quantize_params(tree)
    assert out["conv"]["kernel"].shape == (3, 3, 1, 8)
    assert out["conv"]["kernel"].dtype != jnp.int8
    assert set(out["dense"].keys()) == {"kernel_q", "scale", "bias"}
    assert out["r_emb"].shape == (5, 2, 4)
    assert set(out["ln"].keys()) == {"scale", "bias"}


def test_quantized_beam_search_runs_and_matches_float():
    """The split-joint beam path dequantizes int8 joints on the fly
    (ops.quant.dense_kernel) and the KV label cache dispatches per leaf."""
    from transformer_transducer_tpu.decoding.beam import beam_search_batched
    m, mq = _native_pair()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 1, V)
    tl = jnp.asarray([12, 9])
    v = m.init(jax.random.PRNGKey(0), x, y)
    vq = quantize_variables(v)
    ef = m.apply(v, x, method=m.encode)
    eq = mq.apply(vq, x, method=mq.encode)
    tf, cf, sf = beam_search_batched(m, v, ef, tl, max_tokens=8)
    tq, cq, sq = beam_search_batched(mq, vq, eq, tl, max_tokens=8)
    best_f = tokens_to_lists(np.array(tf[:, 0]), np.array(cf[:, 0]))
    best_q = tokens_to_lists(np.array(tq[:, 0]), np.array(cq[:, 0]))
    assert best_f == best_q


def test_quantized_streaming_session_matches_float_tokens():
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)
    model = Transducer(vocab_size=12, enc=(2, 64, 2, 16, 8, 32),
                       dec=(1, 41, 2, 16, 8, 32), joint_inner=16)
    x0 = jnp.zeros((1, 8, 16))
    y0 = jnp.zeros((1, 4), dtype=jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x0, y0)
    mq = model.clone(quant=True)
    vq = quantize_variables(v)
    rng = np.random.RandomState(0)
    wav = (rng.randn(16000) * 3000).astype(np.int16)

    def run(m, vv):
        cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                              feature_dim=4, stack_left=3)
        s = StreamingSession(m, vv, cfg)
        s.accept_waveform(wav)
        s.finalize()
        return list(s.result)

    assert run(model, v) == run(mq, vq)


@pytest.mark.slow  # int8 x incremental cross; both factors tested separately
def test_quantized_incremental_session_matches_quantized_window():
    """Round 4: the int8 refusal is lifted — the incremental layer steps
    route every projection through the same W8A8 dynamic per-row scheme as
    the window program's QuantDense (streaming/incremental.py::_dense), so
    int8 incremental must emit the int8 window path's exact token stream.
    Covers BOTH model families."""
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)
    rng = np.random.RandomState(0)
    wav = (np.sin(np.arange(24000) * 0.03) * 9000
           + rng.randn(24000) * 1500).astype(np.int16)

    def run(m, vv, seed_token, incremental):
        cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                              feature_dim=4, stack_left=3, blank_split=4,
                              win_audio=4800 + 480, audio_step=4800,
                              seed_token=seed_token)
        s = StreamingSession(m, vv, cfg, incremental=incremental)
        s.accept_waveform(wav)
        s.finalize()
        return list(s.result)

    # native family
    model = Transducer(vocab_size=12, enc=(2, 64, 2, 16, 8, 32),
                       dec=(1, 41, 2, 16, 8, 32), joint_inner=16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                   jnp.zeros((1, 4), jnp.int32))
    mq, vq = model.clone(quant=True), quantize_variables(v)
    ref = run(mq, vq, 0, incremental=False)
    assert ref, "degenerate test: int8 window session emitted nothing"
    assert run(mq, vq, 0, incremental=True) == ref

    # espnet family
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_incremental_streaming import _espnet_model
    em, ev = _espnet_model(seed=11)
    emq, evq = em.clone(quant=True), quantize_variables(ev)
    eref = run(emq, evq, 11, incremental=False)
    assert eref, "degenerate test: int8 espnet window session emitted nothing"
    assert run(emq, evq, 11, incremental=True) == eref


def test_quantize_checkpoint_tool_roundtrip(tmp_path):
    """Float ckpt -> tools/quantize_checkpoint.py -> load_family restores the
    int8 model directly (meta quant marker) with float-matching decodes."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import quantize_checkpoint

    from transformer_transducer_tpu.models.factory import load_family
    from transformer_transducer_tpu.utils import checkpoint as ckpt_lib
    from tests.data_helpers import tiny_train_config

    cfg = tiny_train_config(str(tmp_path), "unused", {
        "train": "x", "dev": "x", "test": "x"})
    d_in = cfg.model.enc.d_model
    m, v, _ = load_family(cfg, d_in)
    float_dir = str(tmp_path / "float_ckpt")
    ckpt_lib.save_checkpoint(float_dir, v["params"], epoch=3, step=77)
    int8_dir = str(tmp_path / "int8_ckpt")
    quantize_checkpoint.main([float_dir, int8_dir])

    mq, vq, _ = load_family(cfg, d_in, int8_dir)
    assert mq.quant
    # restored int8 tree must equal an in-memory quantization of the floats
    ref = quantize_variables(v)
    for a, b in zip(jax.tree_util.tree_leaves(vq),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # int8 kernels shrink the artifact (~4x at production d_model where
    # Dense kernels dominate; this toy model is mostly float pos tables /
    # embeddings / LN leaves, so just require a solid reduction)
    size = lambda d: sum(os.path.getsize(os.path.join(d, f))
                         for f in os.listdir(d) if f.endswith(".msgpack"))
    assert size(int8_dir) < 0.6 * size(float_dir)
