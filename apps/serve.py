#!/usr/bin/env python3
"""Batch-serving CLI: decode many wav files as concurrent streams.

Beyond-reference surface (the reference serves one microphone stream,
``audio/streamRec*.py``): N files ride one ``BatchedStreamingSession`` —
each serving round runs ALL streams' encoder windows + greedy scans in one
fused device program, and the drain scans up to 16 rounds per device call.
Per-stream output is identical to a solo :class:`StreamingSession` fed the
same audio (property-tested in ``tests/test_batched_streaming.py``).

    python apps/serve.py --config configs/joint_streaming.yaml \
        --checkpoint egs/.../epoch_N --wavs a.wav b.wav c.wav \
        [--streams 8] [--rtf]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wavs", nargs="+", required=True)
    ap.add_argument("--streams", type=int, default=None,
                    help="concurrent streams per device round "
                    "(default: min(len(wavs), 8))")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving (post-training quantization)")
    ap.add_argument("--incremental", action="store_true",
                    help="cached-encoder rounds (native family): O(new "
                         "frames) encoder work + short greedy scans")
    ap.add_argument("--continuous", action="store_true",
                    help="continuous batching: admit the next queued file "
                         "into a slot the moment its stream drains "
                         "(per-slot turnover, no head-of-line blocking) "
                         "instead of gang-scheduling fixed groups; emits a "
                         "final JSON summary with slot utilization and "
                         "per-utterance latency percentiles")
    ap.add_argument("--rtf", action="store_true",
                    help="report aggregate x-realtime")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line per file: text, tokens, "
                         "per-token emission times (s) and softmax "
                         "confidences, sentence segments")
    ap.add_argument("--latency", action="store_true",
                    help="drain round-by-round (one fused process() per "
                         "round instead of the 16-round stacked drain) and "
                         "emit a final JSON summary line with per-round "
                         "latency p50/p95/p99 and per-file first-token "
                         "latency — the serving-SLO numbers")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE", help="config override (dotted key)")
    args = ap.parse_args()

    import jax
    from transformer_transducer_tpu.utils.config import (
        apply_overrides, load_config, stack_context)
    from transformer_transducer_tpu.utils.vocab import Vocabulary
    from transformer_transducer_tpu.models.factory import load_family
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig
    from transformer_transducer_tpu.data.wav import read_wave

    cfg = load_config(args.config)
    apply_overrides(cfg, args.overrides)
    vocab = Vocabulary.from_file(cfg.data.vocab)
    d_in = (cfg.data.feature_dim or 128) * (
        1 + sum(stack_context(cfg.data)))
    model, variables, _ = load_family(cfg, d_in, args.checkpoint,
                                      int8=getattr(args, "int8", False))

    n_streams = args.streams or min(len(args.wavs), 8)
    scfg = StreamingConfig.from_config(cfg)
    session = BatchedStreamingSession(
        model, variables, scfg, n_streams,
        incremental=getattr(args, "incremental", False))

    results = {}
    total_audio_s = 0.0
    round_lats = []          # --latency: per-process()-round wall times, ms
    first_token_ms = {}      # --latency: path -> first-token latency, ms
    t0 = time.perf_counter()

    if args.continuous:
        # continuous batching (streaming/batched.py::serve_files): per-slot
        # turnover via stream_done/reset_streams — a drained slot re-admits
        # the next queued file while long utterances keep decoding
        period = scfg.subsample * 0.01
        waves = []
        for path in args.wavs:
            wave, rate = read_wave(path)
            total_audio_s += len(wave) / rate
            waves.append(wave)
        tokens_all = session.serve_files(waves)
        wall = time.perf_counter() - t0
        for k, path in enumerate(args.wavs):
            text = "".join(vocab.decode(tokens_all[k]))
            if args.json:
                meta = session.last_meta[k]
                results[path] = {
                    "text": text,
                    "tokens": tokens_all[k],
                    "times_s": [round(f * period, 3)
                                for f in meta["timestamps"]],
                    "confidences": [round(float(np.exp(c)), 6)
                                    for c in meta["confidences"]],
                    "segments": ["".join(vocab.decode(seg))
                                 for seg in meta["segments"]],
                }
            else:
                results[path] = {"text": text}
        for path in args.wavs:
            if args.json:
                print(json.dumps({"file": path, **results[path]},
                                 ensure_ascii=False))
            else:
                print(f"{path}\t{results[path]['text']}")
        lats = np.asarray(session.last_stats["utt_latency_s"], np.float64)
        print(json.dumps({"summary": {
            "mode": "continuous",
            "slots": n_streams,
            "files": len(args.wavs),
            "rounds": session.last_stats["rounds"],
            "slot_utilization": round(
                session.last_stats["slot_utilization"], 4),
            "aggregate_x_realtime": round(total_audio_s / wall, 2),
            "utt_latency_s": {
                "mean": round(float(lats.mean()), 3),
                "p50": round(float(np.percentile(lats, 50)), 3),
                "p95": round(float(np.percentile(lats, 95)), 3),
                "p99": round(float(np.percentile(lats, 99)), 3)},
        }}, ensure_ascii=False))
        if args.rtf:
            print(f"# aggregate: {total_audio_s:.1f}s audio in {wall:.2f}s "
                  f"= {total_audio_s / wall:.1f}x realtime "
                  f"({n_streams} slots, continuous)", file=sys.stderr)
        return

    # fill slots with up to n_streams files at a time
    for base in range(0, len(args.wavs), n_streams):
        group = args.wavs[base:base + n_streams]
        if base > 0:
            session.reset()
        for slot, path in enumerate(group):
            wave, rate = read_wave(path)
            total_audio_s += len(wave) / rate
            session.accept_waveform(slot, wave)
            session.finalize(slot)
        for slot in range(len(group), n_streams):
            session.finalize(slot)   # empty slots ride along as no-ops
        if args.latency:
            # round-by-round drain: each process() call is one fused
            # serving round — its wall time is the live-mode SLO unit
            t_grp = time.perf_counter()
            while True:
                t_r = time.perf_counter()
                new = session.process()
                lat = (time.perf_counter() - t_r) * 1e3
                now_ms = (time.perf_counter() - t_grp) * 1e3
                for slot, path in enumerate(group):
                    if path not in first_token_ms \
                            and session.streams[slot].result:
                        first_token_ms[path] = round(now_ms, 2)
                if not any(new):
                    break            # the final empty gather is not a round
                round_lats.append(lat)
            tokens = [list(st.result) for st in session.streams]
        else:
            tokens = session.run_to_completion()
        period = scfg.subsample * 0.01   # subsampled-frame period, seconds
        for slot, path in enumerate(group):
            text = "".join(vocab.decode(tokens[slot]))
            if not args.json:
                results[path] = {"text": text}
                continue
            st = session.streams[slot]
            results[path] = {
                "text": text,
                "tokens": tokens[slot],
                "times_s": [round(f * period, 3) for f in st.timestamps],
                "confidences": [round(float(np.exp(c)), 6)
                                for c in st.confidences],
                "segments": ["".join(vocab.decode(seg))
                             for seg in st.segments if seg],
            }
    wall = time.perf_counter() - t0

    for path in args.wavs:
        if args.json:
            print(json.dumps({"file": path, **results[path]},
                             ensure_ascii=False))
        else:
            print(f"{path}\t{results[path]['text']}")
    if args.rtf:
        print(f"# aggregate: {total_audio_s:.1f}s audio in {wall:.2f}s "
              f"= {total_audio_s / wall:.1f}x realtime "
              f"({n_streams} streams/round)", file=sys.stderr)
    if args.latency and round_lats:
        lats = np.asarray(round_lats, np.float64)
        print(json.dumps({"summary": {
            "streams_per_round": n_streams,
            "rounds": len(round_lats),
            "aggregate_x_realtime": round(total_audio_s / wall, 2),
            "round_latency_ms": {
                "mean": round(float(lats.mean()), 2),
                "p50": round(float(np.percentile(lats, 50)), 2),
                "p95": round(float(np.percentile(lats, 95)), 2),
                "p99": round(float(np.percentile(lats, 99)), 2)},
            "first_token_ms": first_token_ms,
        }}, ensure_ascii=False))


if __name__ == "__main__":
    main()
