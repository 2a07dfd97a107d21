import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.vad import LtsdVad, LtsdConfig
from transformer_transducer_tpu.runtime.export import (
    export_transducer, load_exported, model_dim)


def test_vad_detects_speech_in_noise():
    rng = np.random.RandomState(0)
    sr = 16000
    noise = (rng.randn(sr) * 60).astype(np.int16)
    speech = (np.sin(np.arange(sr) * 0.08) * 12000).astype(np.int16)
    signal = np.concatenate([noise[:sr // 2], speech, noise[:sr // 2]])
    vad = LtsdVad(LtsdConfig(order=3))
    decisions, spans = vad.detect(signal, noise=noise)
    assert len(spans) >= 1
    # detected region overlaps the true speech span
    s, e = spans[0][0], spans[-1][1]
    assert s < sr // 2 + sr and e > sr // 2
    out = vad.extract_speech(signal, noise=noise)
    assert out.dtype == signal.dtype and 0 < len(out) <= len(signal)


def test_vad_all_noise_finds_little():
    rng = np.random.RandomState(1)
    noise = (rng.randn(16000) * 50).astype(np.int16)
    vad = LtsdVad(LtsdConfig(order=3))
    decisions, _ = vad.detect(noise, noise=noise)
    assert decisions.mean() < 0.3


def test_export_roundtrip(tmp_path):
    model = Transducer(vocab_size=12, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 8, 2, 8, 4, 16), joint_inner=12)
    x = jnp.zeros((1, 4, 8))
    y = jnp.zeros((1, 2), dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, y)
    assert model_dim(model, variables) == 8

    paths = export_transducer(model, variables, str(tmp_path), max_frames=16,
                              max_tokens=8, d_in=8, left_context=3,
                              right_context=1)
    assert set(paths) == {"encoder", "encoder_streaming", "decoder", "joint"}

    # reload + run: encoder output must match the live model
    enc_fn = load_exported(paths["encoder"])
    xin = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    got = np.asarray(enc_fn(xin))
    ref = np.asarray(model.apply(variables, xin, None, method="encode"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    joint_fn = load_exported(paths["joint"])
    e = jax.random.normal(jax.random.PRNGKey(2), (1, 8))
    d = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
    got = np.asarray(joint_fn(e, d))
    ref = np.asarray(model.apply(variables, e, d, method="joint_logits"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
