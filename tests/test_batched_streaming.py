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

    solo_results = []
    for wav in wavs:
        s = StreamingSession(model, variables, _cfg())
        for i in range(0, len(wav), 2500):
            s.accept_waveform(wav[i:i + 2500])
        s.finalize()
        solo_results.append(s.result)

    batched = BatchedStreamingSession(model, variables, _cfg(), n_streams=3)
    for i, wav in enumerate(wavs):
        batched.accept_waveform(i, wav)
        batched.finalize(i)
    results = batched.run_to_completion()
    assert results == solo_results, f"{results} != {solo_results}"


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
