"""Synthetic corpus builder for end-to-end tests (no real audio in image)."""

import csv
import os

import numpy as np

from transformer_transducer_tpu.data.wav import write_wave
from transformer_transducer_tpu.utils.vocab import Vocabulary


SYMS = list("abcdefghij")


def make_corpus(root: str, n_train=8, n_dev=4, seed=0, sr=16000,
                min_len=3200, max_len=9600):
    """Writes wavs + train/dev/test CSVs + vocab; returns (vocab_path, csvs)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    vocab = Vocabulary.from_symbols(SYMS + ["<unk>"])
    vocab_path = os.path.join(root, "vocab.txt")
    vocab.save(vocab_path)

    def write_split(name, n):
        rows = []
        for i in range(n):
            length = rng.randint(min_len, max_len)
            wav = (rng.randn(length) * 3000).astype(np.int16)
            path = os.path.join(root, "wav", f"{name}_{i}.wav")
            write_wave(path, wav, sr)
            label = "".join(rng.choice(SYMS, size=rng.randint(2, 6)))
            rows.append((path, label))
        csv_path = os.path.join(root, f"{name}.csv")
        with open(csv_path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["file_path", "label"])
            w.writerows(rows)
        return csv_path

    return vocab_path, {s: write_split(s, n)
                        for s, n in [("train", n_train), ("dev", n_dev),
                                     ("test", n_dev)]}


def make_tone_corpus(root: str, n_train=16, n_dev=8, seed=0, sr=16000,
                     tone_len=3200, n_classes=6):
    """Learnable corpus: each label symbol is a sine tone at a distinct
    frequency, so the audio->label mapping can actually be learned (not
    merely memorized) — the basis of the overfit/learning-proof test.
    Defaults (6 classes, 520 Hz spacing, 0.2 s tones) are tuned so a tiny
    d_model=64 transducer reaches <5 % CER on CPU in a few hundred epochs."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    vocab = Vocabulary.from_symbols(SYMS + ["<unk>"])
    vocab_path = os.path.join(root, "vocab.txt")
    vocab.save(vocab_path)
    use = SYMS[:n_classes]
    freqs = {s: 300.0 + 520.0 * i for i, s in enumerate(use)}

    def tone(sym):
        t = np.arange(tone_len) / sr
        return np.sin(2 * np.pi * freqs[sym] * t) * 8000.0

    def write_split(name, n):
        rows = []
        for i in range(n):
            label = "".join(rng.choice(use, size=rng.randint(2, 5)))
            wav = np.concatenate([tone(s) for s in label])
            wav += rng.randn(len(wav)) * 100.0  # mild noise floor
            path = os.path.join(root, "wav", f"{name}_{i}.wav")
            write_wave(path, wav.astype(np.int16), sr)
            rows.append((path, label))
        csv_path = os.path.join(root, f"{name}.csv")
        with open(csv_path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["file_path", "label"])
            w.writerows(rows)
        return csv_path

    return vocab_path, {s: write_split(s, n)
                        for s, n in [("train", n_train), ("dev", n_dev),
                                     ("test", n_dev)]}


def tiny_train_config(root: str, vocab_path: str, csvs: dict,
                      n_enc=1, n_dec=1, d_model=16, vocab_size=12):
    from transformer_transducer_tpu.utils.config import Config
    return Config({
        "data": {
            "name": "synth", "vocab": vocab_path,
            "left_context_width": 3, "right_context_width": 0,
            # no input projection: stacked feature dim (4x) must == d_model
            "feature_dim": d_model // 4, "subsample": 3,
            "max_input_length": 24, "max_target_length": 6,
            "batch_size": 4, "shuffle": True,
            "train": csvs["train"], "dev": csvs["dev"], "test": csvs["test"],
        },
        "model": {
            "type": "transducer",
            "enc": {"max_input_length": 24, "n_head": 2, "d_model": d_model,
                    "d_head": d_model // 2, "d_inner": 32, "n_layer": n_enc,
                    "left_context": 4, "right_context": 2},
            "dec": {"max_target_length": 6, "n_head": 2, "d_model": d_model,
                    "d_head": d_model // 2, "d_inner": 32, "n_layer": n_dec},
            "joint": {"input_size": 2 * d_model, "inner_size": 24},
            "vocab_size": vocab_size,
            "dropout": 0.0,
        },
        "training": {
            "eval_or_not": True, "seed": 1, "epochs": 2,
            "max_grad_norm": 200, "visualization": False,
            "show_interval": 2, "save_model": "tiny",
        },
        "optim": {"type": "sgd", "lr": 0.01, "momentum": 0.9,
                  "decay_ratio": 0.5, "weight_decay": 0,
                  "begin_to_adjust_lr": 0},
    })
