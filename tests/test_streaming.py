import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops import features_np as F
from transformer_transducer_tpu.ops.masks import context_mask
from transformer_transducer_tpu.streaming.session import (
    StreamingConfig, StreamingSession, chunked_encode)
from transformer_transducer_tpu.decoding.greedy import greedy_decode, tokens_to_lists


def _model(n_layer=2, d_model=16, vocab=12, seed=0):
    model = Transducer(vocab_size=vocab, enc=(n_layer, 64, 2, d_model, 8, 32),
                       dec=(1, 41, 2, d_model, 8, 32), joint_inner=16)
    x = jnp.zeros((1, 8, d_model))
    y = jnp.zeros((1, 4), dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), x, y)
    return model, variables


def test_chunked_encode_equals_full_banded():
    """Receptive-field halo windows must reproduce full-sequence banded
    encoding exactly (SURVEY hard-part #2)."""
    model, variables = _model()
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, stack_left=3)
    rng = np.random.RandomState(0)
    feats = rng.randn(37, 16).astype(np.float32)
    # the rel-pos table slice depends on klen, so both sides must evaluate at
    # the same padded length (see StreamingConfig.window_len)
    fixed = 64
    padded = np.zeros((fixed, 16), dtype=np.float32)
    padded[:37] = feats
    full_mask = context_mask(fixed, cfg.left_context, cfg.right_context)
    full = np.asarray(model.apply(variables, jnp.asarray(padded[None]),
                                  full_mask, method=Transducer.encode))[0, :37]
    chunked = chunked_encode(model, variables, feats, cfg, fixed_len=fixed)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, rtol=2e-4, atol=2e-5)


def test_window_padding_does_not_leak():
    """Bucket padding beyond the window must not change effective frames
    (the band mask bounds the receptive field)."""
    model, variables = _model(seed=3)
    rng = np.random.RandomState(1)
    feats = rng.randn(20, 16).astype(np.float32)
    mask32 = context_mask(32, 3, 2)
    zeros = np.zeros((1, 32, 16), dtype=np.float32)
    zeros[0, :20] = feats
    garbage = zeros.copy()
    garbage[0, 20:] = rng.randn(12, 16) * 5
    ref = np.asarray(model.apply(variables, jnp.asarray(zeros), mask32,
                                 method=Transducer.encode))[0]
    got = np.asarray(model.apply(variables, jnp.asarray(garbage), mask32,
                                 method=Transducer.encode))[0]
    # frames whose receptive field stays inside the real region (2 layers x
    # right 2 = 4 future frames) must be identical regardless of pad content
    np.testing.assert_allclose(got[:16], ref[:16], rtol=2e-4, atol=2e-5)


def test_feature_pipeline_matches_offline_with_aligned_hop():
    """With a hop that is a multiple of the frame hop and the subsample
    period, the session's smoothed feature stream equals offline features."""
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, win_audio=4800 + 480, audio_step=4800)
    model, variables = _model()
    session = StreamingSession(model, variables, cfg, keep_features=True)
    rng = np.random.RandomState(2)
    wav = (rng.randn(16000) * 3000).astype(np.int16)
    for i in range(0, len(wav), 1600):
        session.accept_waveform(wav[i:i + 1600])
    session.finalize()
    got = session.feature_log

    offline = F.subsample(F.stack_frames(
        F.logmel_masked(wav, 16000, 4), 3, 0), 3)
    n = got.shape[0]
    assert n > 0
    # windows re-extract features at shifted offsets: compare the stream's
    # frame count and values where the audio window alignment is exact
    np.testing.assert_allclose(got[:5], offline[:5], rtol=1e-4, atol=1e-4)


def test_session_end_to_end_runs_and_matches_offline_greedy():
    """Full pipeline on a synthetic wav: the streamed token sequence must
    match offline banded-encode + greedy decode (same model, same features)."""
    model, variables = _model(n_layer=2, seed=5)
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, stack_left=3, subsample=3,
                          win_audio=4800 + 480, audio_step=4800,
                          label_history=40, window_len=64)
    session = StreamingSession(model, variables, cfg, keep_features=True)
    rng = np.random.RandomState(4)
    # short utterance: keeps emissions under the offline 41-token budget and
    # the session's 40-token history cap so both paths see full history
    wav = (np.sin(np.arange(12000) * 0.03) * 9000
           + rng.randn(12000) * 1500).astype(np.int16)
    out = []
    for i in range(0, len(wav), 3000):
        out += session.accept_waveform(wav[i:i + 3000])
    out += session.finalize()
    assert out == session.result

    # offline: same feature stream -> full banded encode at the session's
    # fixed window length -> greedy (short outputs: 40-token cap not hit)
    feats = session.feature_log
    fixed = cfg.window_len
    assert feats.shape[0] <= fixed
    padded = np.zeros((1, fixed, feats.shape[1]), dtype=np.float32)
    padded[0, :feats.shape[0]] = feats
    mask = context_mask(fixed, cfg.left_context, cfg.right_context)
    enc = model.apply(variables, jnp.asarray(padded), mask,
                      method=Transducer.encode)
    tokens, counts = greedy_decode(model, variables, enc,
                                   jnp.asarray([feats.shape[0]]),
                                   max_tokens=41)
    offline = tokens_to_lists(np.asarray(tokens), np.asarray(counts))[0]
    assert out == offline, f"streamed {out} != offline {offline}"


def test_sentence_split_on_blank_run():
    model, variables = _model(seed=6)
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, blank_split=2,
                          win_audio=4800 + 480, audio_step=4800)
    session = StreamingSession(model, variables, cfg)
    rng = np.random.RandomState(7)
    wav = (rng.randn(30000) * 8000).astype(np.int16)
    session.accept_waveform(wav)
    session.finalize()
    # segments partition the result
    assert sum(session.segments, []) == session.result


def test_token_timestamps_are_frame_aligned():
    """Every emitted token carries the absolute subsampled-frame index it
    was decoded at (beyond-reference serving metadata): one per token,
    strictly increasing (the greedy programs emit at most one token per
    frame, session.py::_make_frame_decoder), inside the consumed frame
    range, and identical between the window and incremental paths."""
    model, variables = _model(n_layer=2, seed=11)

    def mkcfg():
        return StreamingConfig(left_context=3, right_context=2, n_layer=2,
                               feature_dim=4, stack_left=3,
                               win_audio=4800 + 480, audio_step=4800,
                               blank_split=4)

    rng = np.random.RandomState(9)
    wav = (rng.randn(30000) * 3000).astype(np.int16)

    def run(incremental):
        s = StreamingSession(model, variables, mkcfg(),
                             incremental=incremental)
        for i in range(0, len(wav), 4000):
            s.accept_waveform(wav[i:i + 4000])
        s.finalize()
        return s

    ref = run(False)
    assert ref.result, "degenerate test: nothing emitted"
    assert len(ref.timestamps) == len(ref.result)
    assert all(b > a for a, b in zip(ref.timestamps, ref.timestamps[1:]))
    total = ref._sub_base + ref.subsampled.shape[0]
    assert 0 <= ref.timestamps[0] and ref.timestamps[-1] < total
    # per-token confidences: one per token, valid log-probs
    assert len(ref.confidences) == len(ref.result)
    assert all(c <= 0.0 for c in ref.confidences)

    inc = run(True)
    assert inc.result == ref.result
    assert inc.timestamps == ref.timestamps
    # same tokens at the same frames -> same joint rows up to the
    # incremental encoder's f32 reassociation
    np.testing.assert_allclose(inc.confidences, ref.confidences,
                               rtol=1e-4, atol=1e-5)


def test_trapezoid_session_runs_and_covers_all_frames():
    from transformer_transducer_tpu.streaming.session import (
        TrapezoidStreamingSession)
    model, variables = _model(n_layer=2, seed=8)
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, win_audio=4800 + 480,
                          audio_step=4800)
    session = TrapezoidStreamingSession(model, variables, cfg, pred_frame=6)
    assert session.min_win == 6 + 4 and session.max_win == 6 + 6 + 4
    rng = np.random.RandomState(9)
    wav = (rng.randn(20000) * 6000).astype(np.int16)
    out = []
    for i in range(0, len(wav), 2500):
        out += session.accept_waveform(wav[i:i + 2500])
    out += session.finalize()
    assert out == session.result
    assert len(session.timestamps) == len(session.result)
    assert all(b > a for a, b in
               zip(session.timestamps, session.timestamps[1:]))
    # steady-state window must have reached max_win (growth finished)
    assert session.win_len == session.max_win
    # every subsampled frame was consumed exactly once (positions are
    # absolute; the retained buffer is the trimmed tail)
    total = session._sub_base + session.subsampled.shape[0]
    consumed = session.win_feature_position + session.win_len - session.min_win
    assert session.win_feature_position == total or consumed >= total


def test_espnet_session_matches_offline_greedy():
    """ESPnet-family streaming == offline greedy (its rel-pos encoding is
    shift-invariant, so no window pinning is even needed)."""
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    from transformer_transducer_tpu.utils.config import Config
    vocab = 12
    cfg_m = Config({
        "enc": {"input_size": 16, "output_size": 16, "attention_heads": 2,
                "linear_units": 32, "num_blocks": 2, "dropout_rate": 0.0,
                "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
                "input_layer": None, "padding_idx": -1},
        "dec": {"input_size": vocab, "output_size": 16, "attention_heads": 2,
                "linear_units": 32, "num_blocks": 1, "dropout_rate": 0.0,
                "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
                "input_layer": "embed", "padding_idx": -1},
        "joint": {"vocab_size": vocab, "encoder_output_size": 16,
                  "decoder_output_size": 16, "joint_space_size": 16,
                  "joint_activation_type": "tanh"},
        "mask": {"encoder_left_mask": 3, "encoder_right_mask": 2,
                 "decoder_left_mask": 2},
    })
    model = build_espnet_transducer(cfg_m)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                           jnp.asarray([8]), jnp.zeros((1, 4), jnp.int32),
                           jnp.asarray([4]))
    scfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                           feature_dim=4, win_audio=4800 + 480,
                           audio_step=4800, window_len=64,
                           seed_token=vocab - 1)
    session = StreamingSession(model, variables, scfg, keep_features=True)
    assert session._is_espnet()
    rng = np.random.RandomState(11)
    wav = (np.sin(np.arange(12000) * 0.04) * 9000
           + rng.randn(12000) * 1500).astype(np.int16)
    out = []
    for i in range(0, len(wav), 3000):
        out += session.accept_waveform(wav[i:i + 3000])
    out += session.finalize()

    feats = session.feature_log
    enc = model.apply(variables, jnp.asarray(feats[None]), None,
                      method="encode")
    tokens, counts = greedy_decode(model, variables, enc,
                                   jnp.asarray([feats.shape[0]]),
                                   max_tokens=41, seed_token=vocab - 1)
    offline = tokens_to_lists(np.asarray(tokens), np.asarray(counts))[0]
    assert out == offline, f"streamed {out} != offline {offline}"


def test_jitted_programs_do_not_bake_params_as_constants():
    """Regression: the session's jitted programs must take the model
    parameters as ARGUMENTS.  A closure over the variables serializes every
    parameter into the lowered program as a literal constant (~500 MB of
    StableHLO for the 18-layer flagship), which overflows remote-compile
    request limits.  Guard: the lowered text must stay far smaller than the
    parameter bytes."""
    model, variables = _model(d_model=64)
    cfg = StreamingConfig(left_context=3, right_context=1, n_layer=2,
                          feature_dim=16)
    session = StreamingSession(model, variables, cfg)
    k = 1
    length = cfg.window_len
    args = (session.variables, jnp.zeros((k, length, 64)),
            jnp.zeros((k,), jnp.int32), jnp.ones((k,), jnp.int32),
            session._buf, session._count,
            session._predict_last(session.variables, session._buf,
                                  session._count),
            session._blank_run, session._emitted_any)
    text = session._window_decode.lower(*args).as_text()
    param_bytes = sum(np.asarray(x).nbytes
                      for x in jax.tree_util.tree_leaves(variables))
    # baked f32 constants render as >= 8 bytes/element of program text;
    # an argument-passing program stays well under half the param bytes
    assert len(text) < max(param_bytes // 2, 100_000), (
        f"lowered program is {len(text)} bytes for {param_bytes} param "
        "bytes — parameters are being baked in as constants")


def test_long_stream_host_buffers_stay_bounded():
    """Regression: a long-lived session must hold O(halo) host state, not
    O(audio history) — buffers are trimmed as consumed while positions stay
    absolute, and the output equals an un-trimmed run (same decode state)."""
    cfg = StreamingConfig(left_context=3, right_context=2, n_layer=2,
                          feature_dim=4, win_audio=4800 + 480,
                          audio_step=4800, window_len=64)
    model, variables = _model()
    session = StreamingSession(model, variables, cfg)
    rng = np.random.RandomState(9)
    seconds = 40
    bound_audio = cfg.win_audio + 16000   # one window + one accept chunk
    bound_frames = cfg.window_len * 4
    for i in range(seconds):
        wav = (rng.randn(16000) * 3000).astype(np.int16)
        session.accept_waveform(wav)
        assert len(session.audio) <= bound_audio, len(session.audio)
        assert session.subsampled.shape[0] <= bound_frames
        assert session.log_mel.shape[0] <= cfg.stack_left
    session.finalize()
    # positions are still absolute over the whole stream
    assert session.win_audio_position > 16000 * (seconds - 2)
    assert session._sub_base + session.subsampled.shape[0] \
        == session.win_feature_position
