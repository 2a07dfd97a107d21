"""CPU (numpy) log-mel frontend — the data-pipeline twin of ``ops.features``.

Parity surface: the reference extracts features with
``librosa.feature.melspectrogram(wave, sr, n_fft=512, hop_length=160,
n_mels=128)`` followed by one of two log variants (reference:
``tt/utils.py:180-205``):

* ``get_feature``  — ``np.ma.log``: natural log, non-positive bins -> 0
  (used by the streaming apps);
* ``get_feature2`` — floor zeros to float eps then ``log10``
  (used by training, ``tt/dataset.py:95``).

``librosa`` is not available in this image, so the full mel pipeline
(hann STFT with centered reflect padding, power spectrum, Slaney-normalized
mel filterbank) is implemented from the published definitions.  Frame stacking
and subsampling mirror ``tt/utils.py:120-150``.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 512
HOP_LENGTH = 160
N_MELS = 128


def hann_window(n_fft: int = N_FFT) -> np.ndarray:
    """Periodic ("fftbins") Hann window, matching scipy/librosa's default."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float64)


def hz_to_mel(freq: np.ndarray, htk: bool = False) -> np.ndarray:
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_filterbank(sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   fmin: float = 0.0, fmax: float | None = None,
                   htk: bool = False, norm: str | None = "slaney") -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_mels, 1 + n_fft // 2)``."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(wave: np.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH,
                 center: bool = True) -> np.ndarray:
    """Overlapping frames of ``wave``; reflect-padded when ``center``."""
    wave = np.asarray(wave, dtype=np.float32)
    if center:
        wave = np.pad(wave, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(wave) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return wave[idx]


_HANN32_CACHE: dict = {}


def power_spectrogram(wave: np.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH,
                      center: bool = True) -> np.ndarray:
    # float32 throughout: matches librosa's dtype-follows-input behavior on
    # the reference's float32 waves (``tt/utils.py:180-205``) and is ~2x
    # faster on the host data path (pocketfft f32); within 2e-4 of the f64
    # pipeline on log features (parity-tested vs the jit twin and the C++
    # featurizer).
    frames = frame_signal(wave, n_fft, hop, center)
    if n_fft not in _HANN32_CACHE:
        _HANN32_CACHE[n_fft] = hann_window(n_fft).astype(np.float32)
    spec = np.fft.rfft(frames * _HANN32_CACHE[n_fft][None, :], axis=-1)
    return (spec.real ** 2 + spec.imag ** 2)


_MEL_CACHE: dict = {}


def _cached_mel(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    key = (sr, n_fft, n_mels)
    if key not in _MEL_CACHE:
        _MEL_CACHE[key] = mel_filterbank(sr, n_fft, n_mels)
    return _MEL_CACHE[key]


def melspectrogram(wave: np.ndarray, sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                   hop: int = HOP_LENGTH, n_mels: int = N_MELS) -> np.ndarray:
    """Power mel spectrogram, shape ``(frames, n_mels)``."""
    pspec = power_spectrogram(wave, n_fft, hop)
    return (pspec @ _cached_mel(sr, n_fft, n_mels).T).astype(np.float32)


def _native_logmel(wave: np.ndarray, sr: int, n_mels: int, variant: str):
    """C++ frame-parallel featurizer (csrc ``ttx_logmel``) when enabled via
    ``TTX_NATIVE_FEATURES=1`` and the wav is int16 (the pipeline input
    dtype).  Numerically equivalent to the numpy path within fp tolerance
    (parity-tested); returns None to fall back.

    Off by default deliberately: the win is GIL-free OpenMP frame
    parallelism inside loader threads, which needs a multi-core host —
    on a single-core box numpy's SIMD pocketfft/BLAS path is ~3x faster
    (measured), so only enable this where cores outnumber loader threads."""
    import os
    if os.environ.get("TTX_NATIVE_FEATURES") != "1":
        return None
    if not isinstance(wave, np.ndarray) or wave.dtype != np.int16:
        return None
    from transformer_transducer_tpu.runtime.native import library_or_none
    lib = library_or_none()
    if lib is None:
        return None
    return lib.logmel(wave, _cached_mel(sr, N_FFT, n_mels), N_FFT,
                      HOP_LENGTH, variant)


def logmel_masked(wave: np.ndarray, sr: int = SAMPLE_RATE, n_mels: int = N_MELS) -> np.ndarray:
    """Natural-log mel with non-positive bins set to 0.

    Twin of the reference ``get_feature`` (``tt/utils.py:180-191``).
    """
    native = _native_logmel(wave, sr, n_mels, "masked")
    if native is not None:
        return native
    mel = melspectrogram(wave.astype(np.float32), sr, n_mels=n_mels)
    out = np.zeros_like(mel)
    positive = mel > 0
    out[positive] = np.log(mel[positive])
    return out


def logmel_eps(wave: np.ndarray, sr: int = SAMPLE_RATE, n_mels: int = N_MELS) -> np.ndarray:
    """log10 mel with zeros floored to float eps.

    Twin of the reference ``get_feature2`` (``tt/utils.py:194-205``).
    """
    native = _native_logmel(wave, sr, n_mels, "eps")
    if native is not None:
        return native
    mel = melspectrogram(wave.astype(np.float32), sr, n_mels=n_mels)
    mel = np.where(mel == 0, np.finfo(np.float64).eps, mel)
    return np.log10(mel).astype(np.float32)


def stack_frames(features: np.ndarray, left: int = 3, right: int = 0) -> np.ndarray:
    """Concatenate each frame with ``left`` past and ``right`` future frames.

    Layout is chronological — ``[x[t-left], ..., x[t-1], x[t], x[t+1], ...]``
    with zeros past the sequence edges, matching ``tt/utils.py:120-142``.
    """
    t, d = features.shape
    pieces = []
    for offset in range(-left, right + 1):
        # valid destination rows [lo, hi) take source rows [lo+offset,
        # hi+offset); everything else is zero -- including sequences
        # SHORTER than the stack width, where the naive ``[:t + offset]``
        # negative slice wraps and produces wrong-length pieces (same fix
        # as the jnp twin in ops/features.py)
        shifted = np.zeros_like(features)
        lo, hi = max(-offset, 0), min(t - offset, t)
        if hi > lo:
            shifted[lo:hi] = features[lo + offset:hi + offset]
        pieces.append(shifted)
    return np.concatenate(pieces, axis=1).astype(np.float32)


def subsample(features: np.ndarray, factor: int = 3) -> np.ndarray:
    """Keep every ``factor``-th frame (``tt/utils.py:145-150``)."""
    return features[::factor]


def extract(wave: np.ndarray, sr: int = SAMPLE_RATE, n_mels: int = N_MELS,
            left: int = 3, right: int = 0, factor: int = 3,
            log_variant: str = "eps") -> np.ndarray:
    """wav -> log-mel -> stack -> subsample; the full training frontend.

    ``log_variant='eps'`` matches the training dataset path
    (``tt/dataset.py:95``); ``'masked'`` matches the streaming apps.
    """
    logmel = logmel_eps(wave, sr, n_mels) if log_variant == "eps" else logmel_masked(wave, sr, n_mels)
    return subsample(stack_frames(logmel, left, right), factor)
