#!/usr/bin/env python3
"""Training entry point.

CLI parity with the reference (``train.py:144-148``):
    python train.py -config configs/joint_streaming.yaml -log train.log -mode retrain|continue
plus TPU extensions: --bf16, --n_model (tensor-parallel axis), --augment,
--set a.b.c=value config overrides.
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-config", "--config", type=str,
                        default="configs/joint_streaming.yaml")
    parser.add_argument("-log", "--log", type=str, default="train.log")
    parser.add_argument("-mode", "--mode", type=str, default="retrain",
                        choices=["retrain", "continue"])
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (params stay f32)")
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel mesh axis size")
    parser.add_argument("--n_data", type=int, default=None,
                        help="data-parallel mesh axis size (default: all devices)")
    parser.add_argument("--n_pipe", type=int, default=None,
                        help="pipeline-parallel stages: the encoder's layer "
                        "stack splits over a 'pipe' mesh axis (GPipe "
                        "microbatch schedule inside the train step; encoder "
                        "params+optimizer moments live pipe-sharded). Same "
                        "as --set parallel.n_pipe=N")
    parser.add_argument("--pipe-micro", type=int, default=None,
                        help="microbatches for --n_pipe (default 2*n_pipe); "
                        "same as --set parallel.pipe_micro=M")
    parser.add_argument("--n_seq", type=int, default=None,
                        help="sequence-parallel shards for --banded "
                        "training: the encoder time axis splits over a "
                        "'seq' mesh axis with per-layer halo exchange "
                        "(trains the pinned-window banded function the "
                        "streaming session decodes with). Same as --set "
                        "parallel.n_seq=N")
    parser.add_argument("--zero", action="store_true", default=None,
                        help="ZeRO-1: shard optimizer moments over the "
                        "data axis (params/grads stay replicated) — "
                        "~1/n_data moment memory per device. Same as "
                        "--set parallel.zero=true")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder layers in backward")
    parser.add_argument("--flash", action="store_true",
                        help="flash Pallas kernel for unmasked encoder attention")
    parser.add_argument("--banded", action="store_true",
                        help="train the encoder under the streaming band "
                        "(enc.left_context/right_context) via the Pallas "
                        "banded kernel (fwd+bwd)")
    parser.add_argument("--augment", action="store_true",
                        help="enable waveform augmentation chain")
    parser.add_argument("--pruned-range", type=int, default=None,
                        metavar="N", help="pruned transducer loss with a "
                        "width-N label band (~(U+1)/N less joint work; "
                        "same as --set training.loss_pruned_range=N)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler (TensorBoard/xprof) "
                        "trace of the first trained epoch to DIR")
    parser.add_argument("--steps-per-call", type=int, default=None,
                        help="scan K optimizer updates inside one device "
                        "program (amortizes per-call dispatch latency; "
                        "same as --set training.steps_per_call=K)")
    parser.add_argument("--nan-guard", action="store_true",
                        help="skip optimizer updates whose loss/grad-norm "
                        "is non-finite (inside the compiled step); abort "
                        "after training.max_skipped_steps consecutive skips "
                        "(same as --set training.nan_guard=true)")
    parser.add_argument("--save-steps", type=int, default=None,
                        metavar="N", help="preemption-safe mid-epoch "
                        "checkpoint every N optimizer updates (same as "
                        "--set training.save_every_steps=N); -mode continue "
                        "resumes exactly, mid-epoch")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", help="config override (dotted key)")
    args = parser.parse_args()

    from transformer_transducer_tpu.utils.config import apply_overrides, load_config
    from transformer_transducer_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    if args.steps_per_call:
        cfg.override("training.steps_per_call", args.steps_per_call)
    if args.save_steps:
        cfg.override("training.save_every_steps", args.save_steps)
    if args.pruned_range:
        cfg.override("training.loss_pruned_range", args.pruned_range)
    if args.nan_guard:
        cfg.override("training.nan_guard", True)

    trainer = Trainer(cfg, mode=args.mode, log_file=args.log,
                      compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                      n_data=args.n_data, n_model=args.n_model,
                      remat=args.remat, flash=args.flash, banded=args.banded,
                      n_pipe=args.n_pipe, pipe_micro=args.pipe_micro,
                      n_seq=args.n_seq, zero=args.zero)
    trainer.logger.info("JAX backend: %s, devices: %s", jax.default_backend(),
                        jax.devices())
    trainer.fit(epochs=args.epochs, augment=args.augment,
                profile_dir=args.profile)


if __name__ == "__main__":
    main()
