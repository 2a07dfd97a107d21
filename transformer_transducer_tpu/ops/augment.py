"""Waveform augmentation (CPU-side, numpy) — the data-pipeline chain.

Parity surface: the reference applies a probability-gated chain to raw int16
samples (reference: ``augment/audio_augment.py:15-23``): gaussian white noise
(p=0.4), dB-FS volume gain (p=0.4), linear-interp speed 0.9-1.1x (p=0.4),
±5% circular time shift (p=0.1).  Pitch shift and natural-noise overlay exist
in the reference but are not wired into its chain; we expose them too.

All functions take an explicit ``numpy.random.Generator`` — no global RNG.
"""

from __future__ import annotations

import numpy as np


def gaussian_white_noise(rng: np.random.Generator, samples: np.ndarray,
                         min_db: int = 10, max_db: int = 200) -> np.ndarray:
    """Additive N(0, db) noise (reference ``noise_augment.py:57-77``)."""
    dtype = samples.dtype
    db = rng.integers(min_db, max_db)
    noise = db * rng.standard_normal(len(samples))
    return (samples + noise).astype(dtype)


def uniform_white_noise(rng: np.random.Generator, samples: np.ndarray,
                        min_db: int = 10, max_db: int = 200) -> np.ndarray:
    dtype = samples.dtype
    db = rng.integers(min_db, max_db)
    noise = rng.uniform(-db, db, size=len(samples))
    return (samples + noise).astype(dtype)


def natural_noise(rng: np.random.Generator, samples: np.ndarray,
                  noise_wave: np.ndarray, max_db: float = 0.5) -> np.ndarray:
    """Overlay a random slice of a natural-noise recording
    (reference ``noise_augment.py:15-40``)."""
    dtype = samples.dtype
    db = rng.uniform(0.1, max_db)
    tiled = noise_wave
    while len(tiled) <= len(samples):
        tiled = np.concatenate([tiled, tiled])
    start = rng.integers(0, len(tiled) - len(samples))
    return (samples + db * tiled[start:start + len(samples)]).astype(dtype)


def volume_gain(rng: np.random.Generator, samples: np.ndarray,
                min_gain_dbfs: float = -15.0, max_gain_dbfs: float = 15.0) -> np.ndarray:
    """Random dB-FS gain (reference ``volume_augment.py:13-27``)."""
    dtype = samples.dtype
    gain = rng.uniform(min_gain_dbfs, max_gain_dbfs)
    return (samples * (10.0 ** (gain / 20.0))).astype(dtype)


def speed_perturb(rng: np.random.Generator, samples: np.ndarray,
                  min_rate: float = 0.9, max_rate: float = 1.1) -> np.ndarray:
    """Linear-interpolation resampling (reference ``speed_augment.py:14-31``)."""
    dtype = samples.dtype
    rate = rng.uniform(min_rate, max_rate)
    old_n = len(samples)
    new_n = int(old_n / rate)
    old_idx = np.arange(old_n)
    new_idx = np.linspace(0, old_n - 1, new_n)
    return np.interp(new_idx, old_idx, samples.astype(np.float64)).astype(dtype)


def time_shift(rng: np.random.Generator, samples: np.ndarray,
               max_ratio: float = 0.05) -> np.ndarray:
    """Circular roll by up to ±max_ratio of the length
    (reference ``time_shift_augment.py:41-55``)."""
    frac = rng.uniform(-max_ratio, max_ratio)
    return np.roll(samples, int(len(samples) * frac))


def pitch_shift_fft(rng: np.random.Generator, samples: np.ndarray,
                    sr: int = 16000, max_semitones: float = 2.0) -> np.ndarray:
    """Simple FFT-bin-shift pitch perturbation (reference exposes librosa/cv
    pitch shift, unwired: ``pitch_augment.py:14-40``)."""
    dtype = samples.dtype
    steps = rng.uniform(-max_semitones, max_semitones)
    factor = 2.0 ** (steps / 12.0)
    spec = np.fft.rfft(samples.astype(np.float64))
    n = len(spec)
    idx = (np.arange(n) / factor).astype(np.int64)
    shifted = np.where(idx < n, spec[np.minimum(idx, n - 1)], 0)
    return np.fft.irfft(shifted, n=len(samples)).astype(dtype)


def audio_augment(rng: np.random.Generator, samples: np.ndarray) -> np.ndarray:
    """The reference's probability-gated chain (``audio_augment.py:15-23``)."""
    if rng.random() < 0.4:
        samples = gaussian_white_noise(rng, samples, min_db=1, max_db=10)
    if rng.random() < 0.4:
        samples = volume_gain(rng, samples)
    if rng.random() < 0.4:
        samples = speed_perturb(rng, samples)
    if rng.random() < 0.1:
        samples = time_shift(rng, samples)
    return samples
