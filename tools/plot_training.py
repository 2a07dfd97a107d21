#!/usr/bin/env python3
"""Plot training curves from an experiment's metrics.jsonl.

Parity surface: the reference records its 28-epoch loss/CER curves in
hardcoded arrays + a matplotlib plot (``assets/information.py:10-30``); here
the curves come from the JSONL metrics the trainer writes.

    python tools/plot_training.py egs/aishell/4e_1d_1024 [--out curves.png]
    python tools/plot_training.py <exp_dir> --print   # text summary only
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_metrics(exp_dir):
    series = defaultdict(list)
    path = os.path.join(exp_dir, "metrics.jsonl")
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            series[rec["tag"]].append((rec["step"], rec["value"]))
    return series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--print", dest="print_only", action="store_true")
    args = ap.parse_args()

    series = load_metrics(args.exp_dir)
    if not series:
        print("no metrics recorded yet (metrics.jsonl is empty)")
        return
    for tag, pts in sorted(series.items()):
        vals = [v for _, v in pts]
        print(f"{tag}: {len(pts)} points, first {vals[0]:.4f}, "
              f"last {vals[-1]:.4f}, min {min(vals):.4f}")
    if args.print_only:
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(series), figsize=(5 * len(series), 4))
    if len(series) == 1:
        axes = [axes]
    for ax, (tag, pts) in zip(axes, sorted(series.items())):
        xs, ys = zip(*pts)
        ax.plot(xs, ys)
        ax.set_title(tag)
        ax.set_xlabel("step")
        ax.grid(True, alpha=0.3)
    out = args.out or os.path.join(args.exp_dir, "curves.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
