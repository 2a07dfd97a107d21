"""Average the n best epoch checkpoints of an experiment directory.

Parity envelope: the reference vendors ESPnet2's n-best model averaging
(``espnet2/main_funcs/average_nbest_models.py:15-90`` — pick the best epochs
by a reporter criterion, average their state dicts element-wise) but never
wires it up.  This is the working analog for this repo's split-checkpoint
layout (``utils/checkpoint.py``): epochs are ranked by a scalar from the
trainer's ``metrics.jsonl`` (``cer`` or ``eval_loss``, lower is better), the
per-component msgpack trees are averaged leaf-wise in float64, and the result
is written as a normal checkpoint directory loadable by every app/CLI.

Usage:
    python tools/average_checkpoints.py EXP_DIR [--nbest 5]
        [--criterion cer|eval_loss] [--out DIR]
    python tools/average_checkpoints.py --checkpoints ep_3 ep_7 [--out DIR]

n=1 degenerates to a copy of the best checkpoint (the reference symlinks;
a copy keeps the output self-contained).  Integer leaves (none exist in
current models, but converted torch checkpoints may carry counters) follow
the ESPnet rule: summed in int64 and floor-divided by n at the end
(``average_nbest_models.py:82-100``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformer_transducer_tpu.utils.checkpoint import COMPONENTS


def rank_epochs(exp_dir: str, criterion: str) -> List[Tuple[int, float]]:
    """(epoch, value) sorted ascending by the criterion (lower is better).

    The last record per epoch wins, matching how a resumed run rewrites a
    re-evaluated epoch.
    """
    path = os.path.join(exp_dir, "metrics.jsonl")
    if not os.path.exists(path):
        raise SystemExit(
            f"{path} not found — the trainer writes it when "
            "training.visualization is on; otherwise pass --checkpoints")
    per_epoch: Dict[int, float] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("tag") == criterion:
                per_epoch[int(rec["step"])] = float(rec["value"])
    if not per_epoch:
        raise SystemExit(
            f"no '{criterion}' records in {path} — train with eval enabled "
            "or pass --checkpoints explicitly")
    return sorted(per_epoch.items(), key=lambda kv: kv[1])


def _tree_map2(fn, a, b):
    if isinstance(a, dict):
        if set(a) != set(b):
            raise SystemExit(f"checkpoint structure mismatch: {sorted(a)} vs "
                             f"{sorted(b)}")
        return {k: _tree_map2(fn, a[k], b[k]) for k in a}
    return fn(a, b)


def _tree_map(fn, a):
    if isinstance(a, dict):
        return {k: _tree_map(fn, v) for k, v in a.items()}
    return fn(a)


def average_checkpoints(paths: Sequence[str], out: str) -> str:
    """Leaf-wise average of the split component msgpacks; returns ``out``."""
    import flax.serialization

    os.makedirs(out, exist_ok=True)
    n = len(paths)
    for comp in COMPONENTS:
        acc = None
        for p in paths:
            with open(os.path.join(p, f"{comp}.msgpack"), "rb") as fh:
                tree = flax.serialization.msgpack_restore(fh.read())
            # accumulate in f64 (i64 for integer leaves, ESPnet rule)
            widened = _tree_map(
                lambda x: np.asarray(x).astype(
                    np.int64 if np.issubdtype(np.asarray(x).dtype, np.integer)
                    else np.float64), tree)
            acc = widened if acc is None else _tree_map2(np.add, acc, widened)
        # divide and restore the original dtypes (read once more for dtype)
        with open(os.path.join(paths[0], f"{comp}.msgpack"), "rb") as fh:
            proto = flax.serialization.msgpack_restore(fh.read())
        avg = _tree_map2(
            lambda s, ref: (s // n if np.issubdtype(np.asarray(ref).dtype,
                                                    np.integer)
                            else s / n).astype(np.asarray(ref).dtype), acc,
            proto)
        with open(os.path.join(out, f"{comp}.msgpack"), "wb") as fh:
            fh.write(flax.serialization.msgpack_serialize(avg))
    meta = {"epoch": -1, "step": -1, "averaged_from": [os.path.basename(p)
                                                      for p in paths]}
    with open(os.path.join(out, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return out


def main(argv: Optional[Sequence[str]] = None) -> str:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("exp_dir", nargs="?", help="experiment directory with "
                    "metrics.jsonl and epoch_* checkpoints")
    ap.add_argument("--nbest", type=int, default=5)
    ap.add_argument("--criterion", default="cer", choices=["cer", "eval_loss"])
    ap.add_argument("--checkpoints", nargs="+", default=None,
                    help="explicit checkpoint dirs (skips metric ranking)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.checkpoints:
        paths = list(args.checkpoints)
        out = args.out or os.path.join(
            os.path.dirname(paths[0]) or ".", f"ave_{len(paths)}ckpt")
    else:
        if not args.exp_dir:
            ap.error("need an exp_dir or --checkpoints")
        ranked = rank_epochs(args.exp_dir, args.criterion)
        chosen = ranked[:max(1, args.nbest)]
        paths = [os.path.join(args.exp_dir, f"epoch_{e}") for e, _ in chosen]
        missing = [p for p in paths if not os.path.isdir(p)]
        if missing:
            raise SystemExit(f"missing checkpoint dirs: {missing}")
        out = args.out or os.path.join(
            args.exp_dir, f"ave_{len(paths)}best_{args.criterion}")
        print(f"averaging {len(paths)} best by {args.criterion}: "
              + ", ".join(f"epoch_{e}={v:.4f}" for e, v in chosen))
    average_checkpoints(paths, out)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
