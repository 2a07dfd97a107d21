#!/usr/bin/env python3
"""Streaming recognition demo (reference: ``audio/streamRec_unlimit_dynamic_
window.py`` + ``test.py``).

The testable surface is a file-streaming simulator: the wav is fed to the
session in real-time-sized chunks and partial results print as they decode.
With ``--mic`` (requires pyaudio, absent in this image) it reads the
microphone instead; ``--gui`` opens the Tk window when a display exists.

    python apps/stream_demo.py --config configs/joint_streaming.yaml \
        --checkpoint <ckpt_dir> --wav audio.wav [--chunk-ms 100] [--rtf]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def build_session(args):
    import jax
    from transformer_transducer_tpu.utils.config import (
        apply_overrides, load_config, stack_context)
    from transformer_transducer_tpu.utils.vocab import Vocabulary
    from transformer_transducer_tpu.models.factory import load_family
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)

    cfg = load_config(args.config)
    apply_overrides(cfg, getattr(args, "overrides", []))
    vocab = Vocabulary.from_file(cfg.data.vocab)
    d_in = (cfg.data.feature_dim or 128) * (1 + sum(stack_context(cfg.data)))
    model, variables, _ = load_family(cfg, d_in, args.checkpoint,
                                      int8=getattr(args, "int8", False))
    scfg = StreamingConfig.from_config(cfg)

    def on_token(tok, _is_split):
        print(vocab.index2word.get(tok, "?"), end="", flush=True)

    session = StreamingSession(model, variables, scfg, on_token=on_token,
                               incremental=getattr(args, "incremental",
                                                   False))
    return session, vocab


def stream_file(session, path, chunk_ms=100, realtime=False, report_rtf=False):
    from transformer_transducer_tpu.data.wav import read_wave
    wave, rate = read_wave(path)
    chunk = int(rate * chunk_ms / 1000)
    t0 = time.perf_counter()
    compute = 0.0
    for i in range(0, len(wave), chunk):
        c0 = time.perf_counter()
        session.accept_waveform(wave[i:i + chunk])
        compute += time.perf_counter() - c0
        if realtime:
            time.sleep(max(0.0, chunk_ms / 1000 - (time.perf_counter() - c0)))
    c0 = time.perf_counter()
    session.finalize()
    compute += time.perf_counter() - c0
    print()
    if report_rtf:
        audio_s = len(wave) / rate
        print(f"audio {audio_s:.2f}s, compute {compute:.2f}s, "
              f"RTF {compute / audio_s:.4f} ({audio_s / compute:.1f}x realtime)")
    return session.result


def stream_mic(session, seconds=15, rate=16000):  # pragma: no cover
    try:
        import pyaudio
    except ImportError:
        sys.exit("pyaudio is not installed; use --wav file streaming instead")
    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=1, rate=rate,
                     frames_per_buffer=1024, input=True)
    print("recording... speak now")
    end = time.time() + seconds
    while time.time() < end:
        data = np.frombuffer(stream.read(1024), dtype=np.int16)
        session.accept_waveform(data)
    stream.stop_stream()
    stream.close()
    pa.terminate()
    session.finalize()
    print()
    return session.result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--wav", default=None)
    ap.add_argument("--mic", action="store_true")
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--chunk-ms", type=int, default=100)
    ap.add_argument("--realtime", action="store_true",
                    help="pace file chunks at real time")
    ap.add_argument("--rtf", action="store_true", help="report RTF")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 serving (post-training quantization)")
    ap.add_argument("--incremental", action="store_true",
                    help="cached-encoder session (native family): O(new "
                         "frames) work per step instead of halo re-encode")
    ap.add_argument("--timestamps", action="store_true",
                    help="print each token's emission time in seconds and "
                         "its softmax confidence (beyond-reference serving "
                         "metadata)")
    ap.add_argument("--gui", action="store_true",
                    help="Tk window (requires a display)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE", help="config override (dotted key)")
    args = ap.parse_args()

    session, vocab = build_session(args)
    if args.gui:
        from gui import StreamGui
        gui = StreamGui(session, vocab)
        if args.mic:
            gui.set_mic_source()
        elif args.wav:
            gui.set_wav_source(args.wav, args.chunk_ms)
        else:
            sys.exit("need --wav or --mic")
        gui.run()
        return
    if args.mic:
        result = stream_mic(session, args.seconds)
    elif args.wav:
        result = stream_file(session, args.wav, args.chunk_ms, args.realtime,
                             args.rtf)
    else:
        sys.exit("need --wav or --mic")
    print("final:", "".join(vocab.decode(result)))
    print("segments:", [len(s) for s in session.segments])
    if args.timestamps:
        # subsampled-frame period = subsample x 10 ms mel hop
        period = session.cfg.subsample * 0.01
        for tok, frame, conf in zip(result, session.timestamps,
                                    session.confidences):
            word = vocab.index2word.get(tok, "?")
            print(f"  {frame * period:7.2f}s  p={np.exp(conf):.3f}  {word}")


if __name__ == "__main__":
    main()
