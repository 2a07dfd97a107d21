"""JAX log-mel frontend (jit-able, TPU-friendly).

Numerically equivalent to :mod:`transformer_transducer_tpu.ops.features_np`
(the numpy twin used by the CPU data pipeline); that module documents the
parity surface against the reference (``tt/utils.py:180-212``).

Design notes (TPU-first):

* Framing is a gather with a static index matrix; under ``jit`` the whole
  wav->log-mel->stack->subsample chain compiles to one fused XLA program.
* The mel projection is a single matmul (frames × (1+n_fft/2)) @ (bins ×
  n_mels) — MXU work; the FFT uses XLA's native rfft.
* Everything is static-shape: callers pad waveforms to buckets and pass the
  true sample count separately (frame counts are pure functions of it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.ops import features_np as fnp

SAMPLE_RATE = fnp.SAMPLE_RATE
N_FFT = fnp.N_FFT
HOP_LENGTH = fnp.HOP_LENGTH
N_MELS = fnp.N_MELS


@functools.lru_cache(maxsize=None)
def _mel_matrix(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    return fnp.mel_filterbank(sr, n_fft, n_mels).T.copy()  # (bins, n_mels)


@functools.lru_cache(maxsize=None)
def _window(n_fft: int) -> np.ndarray:
    return fnp.hann_window(n_fft).astype(np.float32)


def num_frames(num_samples: int, n_fft: int = N_FFT, hop: int = HOP_LENGTH) -> int:
    """Frame count of a centered STFT over ``num_samples`` samples."""
    return 1 + num_samples // hop


def melspectrogram(wave: jax.Array, sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                   hop: int = HOP_LENGTH, n_mels: int = N_MELS) -> jax.Array:
    """Power mel spectrogram of a 1-D waveform, shape ``(frames, n_mels)``."""
    wave = wave.astype(jnp.float32)
    padded = jnp.pad(wave, n_fft // 2, mode="reflect")
    n = 1 + (padded.shape[0] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    frames = padded[idx] * jnp.asarray(_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    pspec = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return pspec @ jnp.asarray(_mel_matrix(sr, n_fft, n_mels))


def logmel_masked(wave: jax.Array, sr: int = SAMPLE_RATE, n_mels: int = N_MELS) -> jax.Array:
    """Natural-log mel, non-positive bins -> 0 (streaming-app variant)."""
    mel = melspectrogram(wave, sr, n_mels=n_mels)
    return jnp.where(mel > 0, jnp.log(jnp.maximum(mel, jnp.finfo(jnp.float32).tiny)), 0.0)


def logmel_eps(wave: jax.Array, sr: int = SAMPLE_RATE, n_mels: int = N_MELS) -> jax.Array:
    """log10 mel with zeros floored to eps (training variant)."""
    mel = melspectrogram(wave, sr, n_mels=n_mels)
    eps = jnp.float32(np.finfo(np.float64).eps)
    return jnp.log10(jnp.where(mel == 0, eps, mel))


def stack_frames(features: jax.Array, left: int = 3, right: int = 0) -> jax.Array:
    """Chronological frame stacking with zero edges (see numpy twin).

    Row ``i`` of piece ``offset`` is ``features[i + offset]`` when in range,
    else zero — including sequences SHORTER than the stack width, where the
    naive ``features[:t + offset]`` negative slice would wrap and produce
    wrong-length pieces."""
    t = features.shape[0]
    pieces = []
    for offset in range(-left, right + 1):
        lo, hi = max(-offset, 0), min(t - offset, t)   # valid dest rows
        if hi <= lo:
            shifted = jnp.zeros_like(features)
        else:
            shifted = jnp.pad(features[lo + offset:hi + offset],
                              ((lo, t - hi), (0, 0)))
        pieces.append(shifted)
    return jnp.concatenate(pieces, axis=1)


def subsample(features: jax.Array, factor: int = 3) -> jax.Array:
    return features[::factor]


def extract(wave: jax.Array, sr: int = SAMPLE_RATE, n_mels: int = N_MELS,
            left: int = 3, right: int = 0, factor: int = 3,
            log_variant: str = "eps") -> jax.Array:
    """wav -> log-mel -> stack -> subsample, fully jit-able."""
    logmel = logmel_eps(wave, sr, n_mels) if log_variant == "eps" else logmel_masked(wave, sr, n_mels)
    return subsample(stack_frames(logmel, left, right), factor)
