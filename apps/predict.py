#!/usr/bin/env python3
"""Offline single-wav recognition (reference: ``audio/predict.py``).

Loads a config + split checkpoint, extracts features, builds the banded
streaming mask over the full utterance, decodes (greedy or width-5 beam) and
reports CER against an optional reference transcript.

    python apps/predict.py --config configs/joint_streaming.yaml \
        --checkpoint egs/joint/streaming_18_2_2048/epoch_19 \
        --wav path/to/audio.wav [--truth "真实文本"] [--beam]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--truth", default=None)
    ap.add_argument("--beam", action="store_true", help="width-5 beam search")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving (post-training quantization)")
    ap.add_argument("--full-context", action="store_true",
                    help="no banded mask (offline model)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE", help="config override (dotted key)")
    args = ap.parse_args()

    import jax
    from transformer_transducer_tpu.utils.config import (
        apply_overrides, load_config, stack_context, subsample_factor)
    from transformer_transducer_tpu.utils.vocab import Vocabulary
    from transformer_transducer_tpu.utils.metrics import batch_cer
    from transformer_transducer_tpu.models.factory import load_family
    from transformer_transducer_tpu.ops import features_np as F
    from transformer_transducer_tpu.ops.masks import context_mask
    from transformer_transducer_tpu.data.wav import read_wave
    from transformer_transducer_tpu.decoding.greedy import greedy_decode, tokens_to_lists

    cfg = load_config(args.config)
    apply_overrides(cfg, getattr(args, "overrides", []))
    vocab = Vocabulary.from_file(cfg.data.vocab)
    left_ctx, right_ctx = stack_context(cfg.data)
    d_in = (cfg.data.feature_dim or 128) * (1 + left_ctx + right_ctx)
    model, variables, is_espnet = load_family(cfg, d_in, args.checkpoint,
                                              int8=args.int8)

    wave, rate = read_wave(args.wav)
    feats = F.subsample(F.stack_frames(
        F.logmel_masked(wave, rate, cfg.data.feature_dim or 128),
        left_ctx, right_ctx),
        subsample_factor(cfg.data))
    t = feats.shape[0]
    if is_espnet:
        # the espnet encoder bands internally (model.mask); second arg is
        # the pad-mask lengths, and the label history seeds with sos
        enc = model.apply(variables, jnp.asarray(feats[None]),
                          jnp.asarray([t]), method="encode")
        t = int(model.encoded_lengths(jnp.asarray([t]), feats.shape[0])[0])
        seed = model.vocab_size - 1
    else:
        mask = None if args.full_context else context_mask(
            t, cfg.model.enc.left_context or 10,
            cfg.model.enc.right_context or 2)
        enc = model.apply(variables, jnp.asarray(feats[None]), mask,
                          method="encode")
        seed = 0
    if args.beam:
        from transformer_transducer_tpu.decoding.beam import beam_search
        pred = beam_search(model, variables, np.asarray(enc)[0], t,
                           beam_width=5,
                           max_tokens=cfg.data.max_target_length + 1)
    else:
        tokens, counts = greedy_decode(model, variables, enc, jnp.asarray([t]),
                                       max_tokens=cfg.data.max_target_length + 1,
                                       seed_token=seed)
        pred = tokens_to_lists(np.asarray(tokens), np.asarray(counts))[0]

    text = "".join(vocab.decode(pred))
    print("识别结果 / prediction:", text)
    if args.truth:
        dist, total = batch_cer([list(text)], [list(args.truth)])
        print(f"truth: {args.truth}")
        print(f"CER: {100.0 * dist / max(total, 1):.2f}%")


if __name__ == "__main__":
    main()
