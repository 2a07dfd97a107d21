import numpy as np
import pytest

import jax.numpy as jnp

from transformer_transducer_tpu.ops import features as fj
from transformer_transducer_tpu.ops import features_np as fnp


def _wave(n=16000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 2000).astype(np.int16)


def test_mel_filterbank_shape_and_partition():
    fb = fnp.mel_filterbank()
    assert fb.shape == (128, 257)
    # every filter is non-negative and has support
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()


def test_hann_window_periodic():
    w = fnp.hann_window(512)
    assert w[0] == 0.0
    assert abs(w[256] - 1.0) < 1e-12
    # periodic (fftbins=True): w[n] != w[N-n] symmetry point at N/2
    assert abs(w[1] - w[511]) < 1e-12


def test_frame_count_matches_centered_stft():
    wave = _wave(15999)
    spec = fnp.melspectrogram(wave)
    assert spec.shape == (100, 128)  # 1 + 15999 // 160


def test_log_variants_differ():
    wave = _wave()
    a = fnp.logmel_masked(wave)
    b = fnp.logmel_eps(wave)
    # masked uses ln, eps-variant uses log10
    assert not np.allclose(a, b)
    assert np.allclose(a, b * np.log(10.0), atol=1e-3)


def test_stack_frames_layout():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    s = fnp.stack_frames(x, left=3, right=0)
    assert s.shape == (4, 12)
    # row t holds [x[t-3], x[t-2], x[t-1], x[t]] with zero padding
    np.testing.assert_array_equal(s[0], np.concatenate([np.zeros(9), x[0]]))
    np.testing.assert_array_equal(s[3], np.concatenate([x[0], x[1], x[2], x[3]]))
    s2 = fnp.stack_frames(x, left=1, right=1)
    np.testing.assert_array_equal(s2[1], np.concatenate([x[0], x[1], x[2]]))
    np.testing.assert_array_equal(s2[3], np.concatenate([x[2], x[3], np.zeros(3)]))


def test_subsample():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    np.testing.assert_array_equal(fnp.subsample(x, 3).ravel(), [0, 3, 6, 9])


def test_jax_matches_numpy_frontend():
    wave = _wave(8000)
    ref = fnp.logmel_eps(wave)
    got = np.asarray(fj.logmel_eps(jnp.asarray(wave)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    ref2 = fnp.extract(wave)
    got2 = np.asarray(fj.extract(jnp.asarray(wave)))
    np.testing.assert_allclose(got2, ref2, rtol=2e-3, atol=2e-3)


def test_jax_masked_variant_matches():
    wave = _wave(4000, seed=3)
    ref = fnp.logmel_masked(wave)
    got = np.asarray(fj.logmel_masked(jnp.asarray(wave)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_stack_frames_short_sequence_matches_numpy():
    """Regression: the JAX stack_frames crashed (wrapped negative slices)
    when t <= left; the numpy twin zero-pads.  They must agree."""
    import jax.numpy as jnp
    from transformer_transducer_tpu.ops import features as FJ
    from transformer_transducer_tpu.ops import features_np as FN
    rng = np.random.RandomState(0)
    for t in (1, 2, 3, 4, 7):
        x = rng.randn(t, 4).astype(np.float32)
        got = np.asarray(FJ.stack_frames(jnp.asarray(x), 3, 0))
        want = FN.stack_frames(x, 3, 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
