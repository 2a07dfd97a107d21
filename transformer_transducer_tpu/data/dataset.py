"""CSV-driven audio dataset with on-the-fly feature extraction.

Parity surface: reference ``AudioDataset`` (``tt/dataset.py:72-120``):
CSV rows of ``file_path,label`` -> wav read -> log10-eps mel
(``get_feature2``) -> frame stack (left, right) -> subsample -> pad to fixed
``max_input_length``/``max_target_length``; labels char-encoded with
``<unk>`` fallback; target padding value = ``ignore_id`` (0 when unset, which
is what the shipped configs rely on); optional per-speaker kaldi CMVN
(``tt/dataset.py:26-34,61-69``); optional waveform augmentation (wired but
disabled in the reference, ``tt/dataset.py:92``).

Static shapes are a feature here, not a limitation: the reference pads to the
same fixed lengths and then crops to the batch max at train time
(``train.py:32-35``) — on TPU we keep the fixed pad (one compiled program)
and let t_len/u_len carry the truth.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Optional, Tuple

import numpy as np

from transformer_transducer_tpu.data.wav import read_wave
from transformer_transducer_tpu.ops import features_np as F
from transformer_transducer_tpu.ops.augment import audio_augment
from transformer_transducer_tpu.utils.config import (
    stack_context, subsample_factor)
from transformer_transducer_tpu.utils.vocab import Vocabulary


def read_manifest(path: str) -> List[Tuple[str, str]]:
    """CSV with a ``file_path,label`` header (as produced by the reference's
    corpus prep ``data/data_process.py:738-783`` and ours in ``data/prep.py``)."""
    rows = []
    with open(path, "r", encoding="utf-8") as fh:
        reader = csv.reader(fh)
        header = next(reader, None)
        if header and header[0] != "file_path":  # headerless file: keep row
            rows.append((header[0], header[1]))
        for row in reader:
            if row:
                rows.append((row[0], row[1]))
    return rows


class CMVN:
    """Per-speaker cepstral mean/variance normalization from kaldi-format
    stats (reference ``tt/dataset.py:26-34,61-69``)."""

    def __init__(self, utt2spk: Dict[str, str], stats: Dict[str, np.ndarray]):
        self.utt2spk = utt2spk
        self.stats = stats

    def __call__(self, utt_id: str, mat: np.ndarray) -> np.ndarray:
        st = self.stats[self.utt2spk[utt_id]]
        count = st[0, -1]
        mean = st[0, :-1] / count
        var = st[1, :-1] / count - mean ** 2
        return (mat - mean) / np.sqrt(var)


class AudioDataset:
    """``on_device_features`` (config ``data.on_device_features``) flips the
    item contract from features to RAW WAVEFORMS: the host does file I/O +
    (optional) waveform augment + edge-reflect + zero-pad only, and the
    train/eval programs run the log-mel/stack/subsample frontend ON DEVICE
    (``ops.features.extract_batch_padded`` — bit-compatible with the host
    pipeline up to FFT rounding).  Items become ``(wave_padded,
    n_true_samples, targets, u_len)`` — ``inputs_length`` carries SAMPLE
    counts, converted to feature lengths inside the device program.  The
    TPU-native data path: int16 samples ship ~2x smaller than bf16
    features and the host's per-core featurization ceiling disappears
    (DESIGN.md §5a).  CMVN is host-side feature math and is rejected here.
    """

    def __init__(self, data_cfg, split: str, vocab: Vocabulary,
                 augment: bool = False, seed: int = 0,
                 cmvn: Optional[CMVN] = None,
                 on_device_features: bool = False):
        self.cfg = data_cfg
        self.vocab = vocab
        self.rows = read_manifest(data_cfg[split])
        self.feature_dim = data_cfg.feature_dim or 128
        self.left, self.right = stack_context(data_cfg)
        self.subsample = subsample_factor(data_cfg)
        self.max_input_length = data_cfg.max_input_length
        self.max_target_length = data_cfg.max_target_length
        self.ignore_id = data_cfg.ignore_id or 0
        self.augment = augment
        # numpy Generators are NOT thread-safe and __getitem__ runs from the
        # DataLoader's worker pool: derive an independent, deterministic
        # child generator per (utterance, epoch) instead of sharing one
        # bit-generator across threads (DataLoader publishes loader_epoch)
        self._seed = seed
        self.loader_epoch = 0
        self.cmvn = cmvn
        # data.short_first: train on short utterances first (curriculum).
        # The reference declares the flag but its implementation is a
        # commented-out TODO (``tt/dataset.py:78-82``); here it works:
        # rows sorted by label length ascending.  Pair with shuffle=False
        # (a shuffling loader destroys the ordering).
        if data_cfg.short_first and split == "train":
            self.rows.sort(key=lambda r: len(r[1]))
        self.on_device_features = on_device_features
        if on_device_features:
            if cmvn is not None:
                raise NotImplementedError(
                    "data.on_device_features does not compose with CMVN "
                    "(host-side per-speaker feature stats); disable one")
            from transformer_transducer_tpu.ops.features import (
                padded_wave_samples)
            self._wave_cap, self._wave_total = padded_wave_samples(
                self.max_input_length, self.subsample)

    def __len__(self) -> int:
        return len(self.rows)

    def _read(self, index: int):
        path, label = self.rows[index]
        targets = np.asarray(self.vocab.encode(label), dtype=np.int64)
        wave, rate = read_wave(path)
        if self.augment:
            rng = np.random.default_rng(
                np.random.SeedSequence([self._seed, index,
                                        self.loader_epoch]))
            wave = audio_augment(rng, wave)
        return wave, rate, targets

    def _pad_targets(self, targets: np.ndarray):
        u_len = min(len(targets), self.max_target_length)
        tgt_pad = np.full((self.max_target_length,), self.ignore_id, np.int64)
        tgt_pad[:u_len] = targets[:u_len]
        return tgt_pad, np.int64(u_len)

    def _raw_item(self, index: int):
        """on_device_features item: (padded wave, true SAMPLE count,
        targets, u_len).  Layout (ops.features.extract_batch_padded):
        [n_fft/2 reflected head | <=cap true samples | n_fft/2 reflected
        tail | zeros] — the host reflect over the TRUE signal reproduces
        the centered-STFT boundary of the host pipeline exactly; the zero
        tail never reaches a valid frame's window.  (For OVER-length
        utterances the audio is clipped at ``cap`` before the tail
        reflect, so the final feature row can differ from the host path,
        which clips feature rows instead — both discard the same audio.)"""
        wave, _, targets = self._read(index)
        half = F.N_FFT // 2
        wave = np.asarray(wave)
        if wave.dtype != np.int16:     # augmented waves: ship f32, not f64
            wave = wave.astype(np.float32)
        n = min(len(wave), self._wave_cap)
        wave = wave[:n]
        if n < half + 1:   # degenerate sub-window utterance: zero-extend
            wave = np.pad(wave, (0, half + 1 - n))
        out = np.zeros((self._wave_total,), wave.dtype)
        head = wave[1:half + 1][::-1]
        tail = wave[-half - 1:-1][::-1]
        out[:half] = head
        out[half:half + len(wave)] = wave
        out[half + len(wave):half + len(wave) + half] = tail
        tgt_pad, u_len = self._pad_targets(targets)
        return out, np.int64(n), tgt_pad, u_len

    def __getitem__(self, index: int):
        if self.on_device_features:
            return self._raw_item(index)
        wave, rate, targets = self._read(index)
        path = self.rows[index][0]
        feats = F.logmel_eps(wave, rate, self.feature_dim)
        if self.cmvn is not None:
            feats = self.cmvn(path, feats)
        feats = F.subsample(F.stack_frames(feats, self.left, self.right),
                            self.subsample)

        t_len = min(feats.shape[0], self.max_input_length)
        u_len = min(len(targets), self.max_target_length)
        feats_pad = np.zeros((self.max_input_length, feats.shape[1]), np.float32)
        feats_pad[:t_len] = feats[:t_len]
        tgt_pad = np.full((self.max_target_length,), self.ignore_id, np.int64)
        tgt_pad[:u_len] = targets[:u_len]
        return feats_pad, np.int64(t_len), tgt_pad, np.int64(u_len)
