"""On-chip learning demo at production geometry (the CER-parity proxy).

The reference's only accuracy artifact is its 28-epoch AISHELL-1 curve
reaching dev CER 11.40 % (``/root/reference/assets/information.py:10-16``).
This image has no AISHELL data and zero egress, so real-corpus parity is
environment-blocked; this tool produces the strongest evidence obtainable
here: the REAL production CLI (``train.py`` -> ``Trainer.fit``: bf16,
scanned multi-update steps, nan-guard, per-epoch checkpoint + greedy-decode
eval) trains the aishell-geometry model (d_model 512, 4-layer encoder,
joint 1024 — ``configs/aishell.yaml`` with only the vocab head resized) on
a synthetic-but-LEARNABLE corpus and drives CER on a HELD-OUT dev set to
~0 on the actual TPU.  Unlike ``tests/test_overfit.py`` (dev-on-train
memorization, tiny d_model=64 model, CPU), this is generalization at
production width in the chip's native numerics.

Corpus: each label symbol is a sine tone at a distinct frequency (the
``tests/data_helpers.make_tone_corpus`` recipe, scaled up: 10 classes,
held-out dev), so audio -> label is a real mapping the model must learn.

Usage::

    python tools/tone_demo.py --out artifacts/tpu_tone_demo [--epochs 60]

Writes <out>/metrics.jsonl (per-epoch loss + dev CER), train.log, the
resolved config, and a summary.json with the final/best dev CER.
"""

import argparse
import csv
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from transformer_transducer_tpu.data.wav import write_wave  # noqa: E402
from transformer_transducer_tpu.utils.config import Config, dump_config  # noqa: E402
from transformer_transducer_tpu.utils.vocab import Vocabulary  # noqa: E402

SYMS = list("abcdefghij")  # 10 tone classes
SR = 16000
TONE_LEN = 3200  # 0.2 s per symbol


def _write_corpus(root, n_train=1024, n_dev=64, seed=0):
    """Held-out tone corpus: train and dev are disjoint random sequences
    drawn from the same 10-tone language (2-6 symbols per utterance)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    vocab = Vocabulary.from_symbols(SYMS + ["<unk>"])
    vocab_path = os.path.join(root, "vocab.txt")
    vocab.save(vocab_path)
    freqs = {s: 300.0 + 420.0 * i for i, s in enumerate(SYMS)}

    def tone(sym):
        t = np.arange(TONE_LEN) / SR
        return np.sin(2 * np.pi * freqs[sym] * t) * 8000.0

    def split(name, n):
        rows = []
        for i in range(n):
            label = "".join(rng.choice(SYMS, size=rng.randint(2, 7)))
            wav = np.concatenate([tone(s) for s in label])
            wav += rng.randn(len(wav)) * 100.0
            path = os.path.join(root, "wav", f"{name}_{i}.wav")
            write_wave(path, wav.astype(np.int16), SR)
            rows.append((path, label))
        p = os.path.join(root, f"{name}.csv")
        with open(p, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["file_path", "label"])
            w.writerows(rows)
        return p

    return vocab_path, {s: split(s, n) for s, n in
                        [("train", n_train), ("dev", n_dev), ("test", n_dev)]}


def _config(vocab_path, csvs, geometry="aishell"):
    """configs/aishell.yaml geometry with the vocab head resized to the
    tone alphabet and lengths fit to the corpus (<=6 tones = ~44 stacked
    frames); optimizer is the warmup-hold-decay adam recipe the learning
    tests pin (tests/test_overfit.py::_shared_blocks).  geometry="small"
    is the d64 control (the tests' proven learning geometry)."""
    if geometry == "small":
        d, n_head, d_inner, n_layer, joint = 64, 2, 128, 2, 64
        dropout, lr = 0.0, 2e-3
    else:
        d, n_head, d_inner, n_layer, joint = 512, 8, 1024, 4, 1024
        # 2e-3 (the d64 recipe) bounces at d512 — grad-norm oscillation,
        # loss pinned at the blank-collapse point (~U*ln V); 1e-3 descends
        dropout, lr = 0.0, 1e-3
    return Config({
        "data": {
            "name": "tone_demo", "vocab": vocab_path,
            "left_context_width": 3, "right_context_width": 0,
            "feature_dim": d // 4, "subsample": 3,  # stacked 4x = d_model
            "max_input_length": 48, "max_target_length": 8,
            "batch_size": 16, "shuffle": True,
            "train": csvs["train"], "dev": csvs["dev"], "test": csvs["test"],
        },
        "model": {
            "type": "transducer",
            "enc": {"max_input_length": 48, "n_head": n_head, "d_model": d,
                    "d_head": d // n_head, "d_inner": d_inner,
                    "n_layer": n_layer,
                    "left_context": 10, "right_context": 2},
            "dec": {"max_target_length": 8, "n_head": n_head, "d_model": d,
                    "d_head": d // n_head, "d_inner": d_inner, "n_layer": 1},
            "joint": {"input_size": 2 * d, "inner_size": joint},
            "vocab_size": 12, "dropout": dropout,
        },
        "training": {
            "exp_name": "tone_demo", "eval_or_not": True, "seed": 1,
            "epochs": 60, "specaug": False,
            # adam at d512 post-LN: loose clipping (the reference's 200)
            # admits the grad spikes that blew up run 3 at epoch ~19
            # (loss 0.99 -> 11.4, permanent blank collapse); 5.0 damps them
            "max_grad_norm": 5.0,
            "visualization": True, "show_interval": 16,
            "save_model": "aishell_geo",
        },
        # hot phase short: run 3 diverged at step ~1230 of a 3000-step
        # hold — descend fast for ~400 steps, then anneal to 1e-4 where
        # post-LN d512 is unconditionally stable
        "optim": {"type": "adam", "lr": lr, "schedule": "step_decay",
                  "warmup_steps": 200, "hold_steps": 400,
                  "final_step": 1500, "init_lr": 1e-4, "min_lr": 1e-4,
                  "decay_ratio": 1.0, "weight_decay": 0,
                  "begin_to_adjust_lr": 10_000},
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/tpu_tone_demo")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--geometry", default="aishell",
                    choices=["aishell", "small"])
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    vocab_path, csvs = _write_corpus(os.path.join(out, "corpus"))
    cfg = _config(vocab_path, csvs, geometry=args.geometry)
    cfg_path = os.path.join(out, "config.yaml")
    dump_config(cfg, cfg_path)

    # the REAL CLI, production flags: bf16 compute, scanned multi-update
    # steps, in-program nan-guard
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "train.py"), "--config", cfg_path,
         "--bf16", "--nan-guard", "--steps-per-call",
         str(args.steps_per_call), "--epochs", str(args.epochs)],
        cwd=out)
    if rc != 0:
        sys.exit(rc)

    exp = os.path.join(out, "egs", "tone_demo", "aishell_geo")
    cers, losses = [], []
    with open(os.path.join(exp, "metrics.jsonl")) as fh:
        for line in fh:
            row = json.loads(line)
            if row.get("tag") == "cer":
                cers.append((row["step"], row["value"]))
            elif row.get("tag") == "train_loss":
                losses.append((row["step"], row["value"]))
    summary = {
        "geometry": ("configs/aishell.yaml (d_model 512, 4-layer enc, "
                     "joint 1024), vocab head 12"
                     if args.geometry == "aishell"
                     else "small control (d_model 64, 2-layer enc)"),
        "corpus": "10-class held-out tone corpus, 1024 train / 64 dev "
                  "(256 train stalls in the label-LM-memorization shortcut "
                  "— the decoder memorizes that few random sequences "
                  "faster than the audio pathway learns; at 1024 the "
                  "acoustic solution wins)",
        "flags": f"--bf16 --nan-guard --steps-per-call {args.steps_per_call}",
        "first_train_loss": losses[0][1] if losses else None,
        "last_train_loss": losses[-1][1] if losses else None,
        "dev_cer_curve": cers,
        "final_dev_cer": cers[-1][1] if cers else None,
        "best_dev_cer": min(v for _, v in cers) if cers else None,
    }
    with open(os.path.join(out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    shutil.copy(os.path.join(exp, "metrics.jsonl"),
                os.path.join(out, "metrics.jsonl"))
    shutil.copy(os.path.join(exp, "train.log"),
                os.path.join(out, "train.log"))
    shutil.rmtree(os.path.join(out, "corpus", "wav"), ignore_errors=True)
    print(json.dumps({"final_dev_cer": summary["final_dev_cer"],
                      "best_dev_cer": summary["best_dev_cer"]}))


if __name__ == "__main__":
    main()
