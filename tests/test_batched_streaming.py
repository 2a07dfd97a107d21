import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.streaming.session import (
    StreamingConfig, StreamingSession)
from transformer_transducer_tpu.streaming.batched import BatchedStreamingSession


def _model(seed=0):
    model = Transducer(vocab_size=12, enc=(2, 64, 2, 16, 8, 32),
                       dec=(1, 41, 2, 16, 8, 32), joint_inner=16)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8, 16)),
                           jnp.zeros((1, 4), jnp.int32))
    return model, variables


def _cfg():
    return StreamingConfig(left_context=3, right_context=2, n_layer=2,
                           feature_dim=4, win_audio=4800 + 480,
                           audio_step=4800, window_len=64)


def _wav(seed, n=14000):
    rng = np.random.RandomState(seed)
    return (np.sin(np.arange(n) * (0.02 + 0.01 * seed)) * 9000
            + rng.randn(n) * 1500).astype(np.int16)


def test_batched_matches_solo_sessions():
    model, variables = _model()
    wavs = [_wav(s, 12000 + 1500 * s) for s in range(3)]

    solo_results, solo_stamps = [], []
    for wav in wavs:
        s = StreamingSession(model, variables, _cfg())
        for i in range(0, len(wav), 2500):
            s.accept_waveform(wav[i:i + 2500])
        s.finalize()
        solo_results.append(s.result)
        solo_stamps.append(s.timestamps)

    batched = BatchedStreamingSession(model, variables, _cfg(), n_streams=3)
    for i, wav in enumerate(wavs):
        batched.accept_waveform(i, wav)
        batched.finalize(i)
    results = batched.run_to_completion()
    assert results == solo_results, f"{results} != {solo_results}"
    # per-token frame timestamps also match the solo sessions
    assert [st.timestamps for st in batched.streams] == solo_stamps
    # confidences are valid log-probs, one per token
    for st in batched.streams:
        assert len(st.confidences) == len(st.result)
        assert all(c <= 0.0 for c in st.confidences)


def test_batched_incremental_feeding():
    model, variables = _model(seed=3)
    batched = BatchedStreamingSession(model, variables, _cfg(), n_streams=2)
    wavs = [_wav(7), _wav(8)]
    emitted = [[], []]
    for pos in range(0, 14000, 3000):
        for i in range(2):
            batched.accept_waveform(i, wavs[i][pos:pos + 3000])
        for i, new in enumerate(batched.process()):
            emitted[i].extend(new)
    for i in range(2):
        batched.finalize(i)
    results = batched.run_to_completion()
    for i in range(2):
        assert results[i][:len(emitted[i])] == emitted[i]
        assert results[i] == batched.streams[i].result
    # segments partition results
    for st in batched.streams:
        assert sum(st.segments, []) == st.result


def test_stacked_drain_matches_round_by_round():
    """run_to_completion (R rounds scanned in one device program) equals
    repeated process() calls (one device call per round) exactly."""
    model, variables = _model(seed=5)
    wavs = [_wav(11, 13000), _wav(12, 16000), _wav(13, 9000)]

    def feed(session):
        for i, wav in enumerate(wavs):
            session.accept_waveform(i, wav)
            session.finalize(i)

    by_round = BatchedStreamingSession(model, variables, _cfg(), n_streams=3)
    feed(by_round)
    while any(by_round.process()):
        pass
    stacked = BatchedStreamingSession(model, variables, _cfg(), n_streams=3)
    feed(stacked)
    results = stacked.run_to_completion()
    assert results == [st.result for st in by_round.streams]
    assert [st.segments for st in stacked.streams] == \
        [st.segments for st in by_round.streams]


def test_batched_espnet_streams_match_solo_sessions():
    """Regression: the batched session must support the espnet family like
    the solo session does (banded-inside encode, sos seed) — each stream's
    output equals a solo espnet StreamingSession fed the same audio."""
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

    def scfg():
        return StreamingConfig(left_context=3, right_context=2, n_layer=2,
                               feature_dim=4, win_audio=4800 + 480,
                               audio_step=4800, window_len=64,
                               seed_token=vocab - 1)

    rng = np.random.RandomState(21)
    wavs = [(np.sin(np.arange(9000) * (0.03 + 0.01 * i)) * 9000
             + rng.randn(9000) * 1500).astype(np.int16) for i in range(2)]

    batched = BatchedStreamingSession(model, variables, scfg(), 2)
    for i, w in enumerate(wavs):
        batched.accept_waveform(i, w)
        batched.finalize(i)
    results = batched.run_to_completion()

    for i, w in enumerate(wavs):
        solo = StreamingSession(model, variables, scfg())
        solo.accept_waveform(w)
        solo.finalize()
        assert results[i] == solo.result, (
            f"stream {i}: batched {results[i]} != solo {solo.result}")


# ---------------------------------------------------------------------------
# Continuous batching (per-slot turnover; streaming/batched.py::serve_files)
# ---------------------------------------------------------------------------

def _solo_results(model, variables, wavs, cfg_fn=_cfg):
    outs = []
    for wav in wavs:
        s = StreamingSession(model, variables, cfg_fn())
        s.accept_waveform(wav)
        s.finalize()
        outs.append((s.result, s.timestamps))
    return outs


def test_continuous_slot_reuse():
    """5 mixed-length utterances through 2 slots with per-slot turnover:
    every utterance's tokens AND timestamps equal its solo session —
    i.e. resetting a drained slot mid-flight never disturbs the stream
    still decoding next to it."""
    model, variables = _model(seed=7)
    wavs = [_wav(s, 9000 + 2600 * (s % 3)) for s in range(5)]
    solo = _solo_results(model, variables, wavs)

    batched = BatchedStreamingSession(model, variables, _cfg(), n_streams=2)
    results = batched.serve_files(wavs)
    for k in range(len(wavs)):
        assert results[k] == solo[k][0], (
            f"utt {k}: continuous {results[k]} != solo {solo[k][0]}")
        assert batched.last_meta[k]["timestamps"] == solo[k][1]


def test_continuous_slot_reuse_incremental():
    """Continuous batching composes with the cached-encoder rounds: the
    per-slot cache reset restores a fresh encoder state for the admitted
    stream while surviving streams' caches are untouched."""
    model, variables = _model(seed=9)
    wavs = [_wav(10 + s, 8000 + 3100 * (s % 2)) for s in range(4)]
    solo = _solo_results(model, variables, wavs)

    batched = BatchedStreamingSession(model, variables, _cfg(), n_streams=2,
                                      incremental=True)
    results = batched.serve_files(wavs)
    for k in range(len(wavs)):
        assert results[k] == solo[k][0], (
            f"utt {k}: continuous-incremental {results[k]} != solo "
            f"{solo[k][0]}")
