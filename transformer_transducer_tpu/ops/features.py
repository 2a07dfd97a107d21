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
                   hop: int = HOP_LENGTH, n_mels: int = N_MELS,
                   center: bool = True) -> jax.Array:
    """Power mel spectrogram of a 1-D waveform, shape ``(frames, n_mels)``.

    ``center=False`` skips the reflect padding — for waveforms the HOST
    already edge-reflected (the on-device-features data path,
    ``data/dataset.py``), where a device-side reflect over the zero tail
    would differ from the host pipeline's reflect over the true signal."""
    wave = wave.astype(jnp.float32)
    padded = jnp.pad(wave, n_fft // 2, mode="reflect") if center else wave
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


# ---------------------------------------------------------------------------
# On-device featurization of a padded waveform batch (data.on_device_features)

def raw_frame_count(n_samples, hop: int = HOP_LENGTH):
    """Frames of the centered STFT over ``n_samples`` true samples — the
    same count the host pipeline produces (``features_np.frame_signal``
    with ``center=True``).  Works on ints and traced arrays."""
    return 1 + n_samples // hop


def padded_wave_samples(max_frames: int, factor: int = 3,
                        hop: int = HOP_LENGTH, n_fft: int = N_FFT) -> tuple:
    """(true-sample capacity, total padded length) of the raw-waveform
    batch layout for a ``max_frames``-row feature budget: the host clips
    the wave to ``cap`` samples, edge-reflects ``n_fft//2`` on each side,
    and zero-pads to ``total`` (see ``data/dataset.py`` raw mode)."""
    raw_frames = (max_frames - 1) * factor + 1
    cap = (raw_frames - 1) * hop
    return cap, cap + n_fft

def extract_batch_padded(waves: jax.Array, n_samples: jax.Array,
                         max_frames: int, sr: int = SAMPLE_RATE,
                         n_mels: int = N_MELS, left: int = 3, right: int = 0,
                         factor: int = 3, log_variant: str = "eps"):
    """Featurize a HOST-PREPADDED waveform batch on device:
    ``(B, total)`` waves (layout from :func:`padded_wave_samples`:
    ``n_fft//2`` host-reflected edge samples around ``<= cap`` true samples,
    zero tail) -> ``(B, max_frames, n_mels*(left+1+right))`` features plus
    feature lengths ``(B,)`` — bit-compatible (up to FFT backend rounding)
    with the host pipeline ``features_np.extract`` + zero-pad convention of
    ``data/dataset.py:96-117``: log-mel rows past the true frame count are
    zeroed BEFORE stacking (the host stack's zero-edge rule) and feature
    rows past ``t_len`` after subsampling (the host pad rows).

    This is the TPU-native data path: the host ships int16 samples (~2x
    smaller than bf16 features) and does no DSP; STFT/mel/log run on
    device where they are noise next to the encoder (see DESIGN.md §5a).
    """
    b, total = waves.shape
    raw_frames = (max_frames - 1) * factor + 1
    expect = (raw_frames - 1) * HOP_LENGTH + N_FFT
    if total != expect:
        raise ValueError(f"padded wave length {total} != {expect} expected "
                         f"for max_frames={max_frames} (see "
                         f"padded_wave_samples)")
    frames_true = jnp.minimum(raw_frame_count(n_samples), raw_frames)
    t_len = jnp.minimum((frames_true + factor - 1) // factor, max_frames)

    def melspec_log(wave):
        mel = melspectrogram(wave, sr, n_mels=n_mels, center=False)
        if log_variant == "eps":
            eps = jnp.float32(np.finfo(np.float64).eps)
            return jnp.log10(jnp.where(mel == 0, eps, mel))
        return jnp.where(mel > 0,
                         jnp.log(jnp.maximum(mel, jnp.finfo(jnp.float32).tiny)),
                         0.0)

    def one(wave, n_true_frames, tl):
        row = jnp.arange(raw_frames)
        logmel = jnp.where((row < n_true_frames)[:, None],
                           melspec_log(wave), 0.0)
        feats = subsample(stack_frames(logmel, left, right), factor)
        return jnp.where((jnp.arange(max_frames) < tl)[:, None], feats, 0.0)

    feats = jax.vmap(one)(waves, frames_true, t_len)
    return feats, t_len
