#!/usr/bin/env python3
"""Quantize a float split checkpoint to int8 for serving.

    python tools/quantize_checkpoint.py ckpt_dir out_dir

Writes the same split layout (``encoder/decoder/joint.msgpack`` + meta)
with every Dense kernel stored as int8 + per-channel f32 scales
(``ops/quant.py`` W8A8 scheme) — ~4x smaller than the float f32
checkpoint.  Load it with a ``quant=True`` model
(``models.factory.to_quant`` builds one from the float config), e.g.
``apps/predict.py --int8`` / ``apps/serve.py --int8`` quantize on the fly
from a float checkpoint; this tool bakes the result to disk so deployment
ships only the int8 artifact.  ``meta.json`` gains ``{"quant": "int8"}``.

Beyond-reference: the reference exports float TorchScript for Android
(``assets/script.py:40-60``) with no quantization story.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("out_dir")
    args = ap.parse_args(argv)

    import flax.serialization
    from transformer_transducer_tpu.ops.quant import quantize_params
    from transformer_transducer_tpu.utils import checkpoint as ckpt_lib

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.ckpt_dir, "meta.json")) as fh:
        meta = json.load(fh)
    components = meta.get("components", list(ckpt_lib.COMPONENTS))
    total_in = total_out = 0
    for comp in components:
        src = os.path.join(args.ckpt_dir, f"{comp}.msgpack")
        with open(src, "rb") as fh:
            # template-free read: msgpack restores a plain nested dict
            tree = flax.serialization.msgpack_restore(fh.read())
        blob = flax.serialization.msgpack_serialize(quantize_params(tree))
        with open(os.path.join(args.out_dir, f"{comp}.msgpack"), "wb") as fh:
            fh.write(blob)
        total_in += os.path.getsize(src)
        total_out += len(blob)
    meta["quant"] = "int8"
    with open(os.path.join(args.out_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    print(f"quantized {components} -> {args.out_dir} "
          f"({total_in / 1e6:.1f} MB -> {total_out / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
