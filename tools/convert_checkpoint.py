#!/usr/bin/env python3
"""Convert a reference PyTorch ``.chkpt`` to this framework's split format.

    python tools/convert_checkpoint.py ref.chkpt out_dir [--espnet]

The reference checkpoint layout is ``{encoder, decoder, joint, optimizer,
epoch, step}`` (``tt/utils.py:80-91``); the optimizer state is not portable
and is dropped (resume restarts optimizer moments).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("chkpt")
    ap.add_argument("out_dir")
    ap.add_argument("--espnet", action="store_true",
                    help="source is the tt_espnet model family")
    args = ap.parse_args(argv)

    import torch
    from transformer_transducer_tpu.utils import torch_convert as tc
    from transformer_transducer_tpu.utils import checkpoint as ckpt_lib

    ck = torch.load(args.chkpt, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    if args.espnet:
        variables = tc.espnet_transducer_params(
            to_np(ck["encoder"]), to_np(ck["decoder"]), to_np(ck["joint"]))
    else:
        variables = tc.transducer_params(
            to_np(ck["encoder"]), to_np(ck["decoder"]), to_np(ck["joint"]))
    ckpt_lib.save_checkpoint(args.out_dir, variables["params"],
                             epoch=int(ck.get("epoch", 0)),
                             step=int(ck.get("step", 0)))
    print(f"converted {args.chkpt} -> {args.out_dir} "
          f"(epoch {ck.get('epoch', 0)}, step {ck.get('step', 0)})")


if __name__ == "__main__":
    main()
