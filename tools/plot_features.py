#!/usr/bin/env python3
"""Render a feature matrix (mel spectrogram) as an image.

Parity surface: the reference's ``tensor_to_img`` (``tt/utils.py:332-336``)
``imshow``-s a feature tensor transposed for eyeballing; here the plot is
written to a PNG (headless Agg backend — no display on a TPU host) and the
input can be either a wav file (features computed through the same
``ops.features_np`` pipeline the dataset uses) or a kaldi matrix/ark entry
(``path`` or ``path:offset``).

    python tools/plot_features.py utt.wav --out utt.png
    python tools/plot_features.py feats.ark:12 --out utt.png
    python tools/plot_features.py utt.wav --stack 3 --subsample 3
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_features(path: str, feature_dim: int = 128, stack: int = 0,
                  subsample: int = 1) -> np.ndarray:
    """(T, D) float32 features from a wav file or a kaldi matrix path."""
    base = path.rsplit(":", 1)[0]
    if base.lower().endswith(".wav"):
        from transformer_transducer_tpu.data.wav import read_wave
        from transformer_transducer_tpu.ops import features_np as F
        wave, rate = read_wave(base)
        feats = F.logmel_masked(wave, rate, feature_dim)
        if stack:
            feats = F.stack_frames(feats, stack, 0)
        if subsample > 1:
            feats = F.subsample(feats, subsample)
        return feats
    from transformer_transducer_tpu.data import kaldiio
    return kaldiio.read_mat(path)


def save_image(feats: np.ndarray, out: str, title: str = "") -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(max(4, feats.shape[0] / 50), 4))
    # features transposed like the reference (time on x, mel bin on y)
    im = ax.imshow(feats.T, origin="lower", aspect="auto",
                   interpolation="nearest")
    ax.set_xlabel("frame")
    ax.set_ylabel("feature bin")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax, fraction=0.03)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", help="wav file or kaldi matrix (path[:offset])")
    ap.add_argument("--out", default=None, help="output PNG (default: "
                    "<input>.png)")
    ap.add_argument("--feature-dim", type=int, default=128)
    ap.add_argument("--stack", type=int, default=0,
                    help="left history frames to stack (0 = raw log-mel)")
    ap.add_argument("--subsample", type=int, default=1)
    args = ap.parse_args(argv)

    feats = load_features(args.path, args.feature_dim, args.stack,
                          args.subsample)
    out = args.out or (os.path.splitext(args.path.rsplit(":", 1)[0])[0]
                       + ".png")
    save_image(feats, out, title=os.path.basename(args.path))
    print(f"{feats.shape[0]}x{feats.shape[1]} features -> {out}")
    return out


if __name__ == "__main__":
    main()
