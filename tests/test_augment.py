"""Waveform augmentation chain + variants (reference ``augment/``) and the
partial-checkpoint sub-variants (reference ``tt/utils.py:94-118``)."""

import numpy as np

from transformer_transducer_tpu.ops import augment as aug


def _wav(n=16000, seed=0, amp=3000):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * amp).astype(np.int16)


def test_noise_variants_preserve_dtype_and_shape():
    rng = np.random.default_rng(0)
    x = _wav()
    for fn in (aug.gaussian_white_noise, aug.uniform_white_noise):
        y = fn(rng, x)
        assert y.dtype == np.int16 and y.shape == x.shape
        assert not np.array_equal(y, x)
    noise = _wav(4000, seed=1, amp=500)
    y = aug.natural_noise(rng, x, noise)
    assert y.dtype == np.int16 and y.shape == x.shape


def test_speed_variants_change_length_as_rated():
    x = _wav()
    # linear-interp resample: new length = old / rate
    rng = np.random.default_rng(1)
    y = aug.speed_perturb(rng, x, min_rate=1.25, max_rate=1.25)
    assert abs(len(y) - len(x) / 1.25) <= 1

    # phase-vocoder stretch (speed_librosa analog): ~old/rate, pitch kept
    rng = np.random.default_rng(2)
    y = aug.speed_perturb_stft(rng, x, min_rate=1.25, max_rate=1.25)
    assert abs(len(y) - len(x) / 1.25) < 1024
    assert y.dtype == x.dtype

    # chunk-drop speedup (working speed_pydub analog): strictly shorter
    rng = np.random.default_rng(3)
    y = aug.speed_perturb_chunked(rng, x, min_rate=1.2, max_rate=1.2)
    assert abs(len(y) - len(x) / 1.2) < len(x) * 0.06


def test_stft_stretch_preserves_pitch():
    """A pure tone stretched by the phase vocoder keeps its frequency
    (plain resampling would shift it by the rate)."""
    sr, f0 = 16000, 440.0
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * f0 * t) * 8000).astype(np.int16)
    rng = np.random.default_rng(0)
    y = aug.speed_perturb_stft(rng, x, min_rate=1.2, max_rate=1.2)
    spec = np.abs(np.fft.rfft(y[2048:2048 + 8192].astype(np.float64)))
    peak_hz = np.argmax(spec) * sr / 8192
    assert abs(peak_hz - f0) < 10.0, peak_hz


def test_time_shift_variants():
    x = np.arange(100, dtype=np.int16)
    rng = np.random.default_rng(4)
    y = aug.time_shift(rng, x, max_ratio=0.05)
    np.testing.assert_array_equal(np.sort(y), np.sort(x))  # circular: a perm
    y = aug.time_shift_fixed(x, ratio=0.05)                # left roll by 5
    np.testing.assert_array_equal(y[:95], x[5:])
    np.testing.assert_array_equal(y[95:], x[:5])


def test_chain_is_deterministic_per_generator():
    x = _wav()
    a = aug.audio_augment(np.random.default_rng(7), x)
    b = aug.audio_augment(np.random.default_rng(7), x)
    np.testing.assert_array_equal(a, b)


def test_partial_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from transformer_transducer_tpu.utils import checkpoint as ck
    params = {"encoder": {"w": jnp.arange(4.0)},
              "decoder": {"w": jnp.arange(3.0)},
              "joint": {"w": jnp.arange(2.0)}}
    path = ck.save_partial_checkpoint(str(tmp_path / "lm"), params,
                                      ["decoder", "joint"], epoch=3, step=70)
    import os
    assert not os.path.exists(os.path.join(path, "encoder.msgpack"))
    got = ck.load_component(path, "decoder", params["decoder"])
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(params["decoder"]["w"]))
    import json
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta == {"epoch": 3, "step": 70, "components": ["decoder", "joint"]}
