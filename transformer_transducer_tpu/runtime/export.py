"""Model export for deployment — StableHLO serialization of the three
inference components.

Parity surface: the reference TorchScript-traces encoder / decoder / joint
separately for Android (``assets/script.py:40-60``; the no-if-else tracing
constraint is noted at ``tt/transformer.py:127,151``).  The TPU-native
equivalent is ``jax.export``: each component is lowered to portable
StableHLO with fixed shapes and can be reloaded and invoked from any
jax-capable runtime (or compiled AOT elsewhere) without the Python model
code.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.ops.masks import context_mask, look_ahead_mask


def export_transducer(model, variables, out_dir: str,
                      max_frames: int = 410, max_tokens: int = 43,
                      d_in: int = 512,
                      left_context: Optional[int] = None,
                      right_context: Optional[int] = None) -> Dict[str, str]:
    """Serialize encoder/decoder/joint to ``<out_dir>/{name}.stablehlo``.

    Shapes are fixed (batch 1), mirroring the reference's traced export.  The
    encoder is exported twice: full-context and (when a band is given)
    streaming-masked.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def save(name, fn, *args):
        exported = jax.export.export(jax.jit(fn))(*args)
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as fh:
            fh.write(exported.serialize())
        paths[name] = path
        return exported

    x = jnp.zeros((1, max_frames, d_in), jnp.float32)
    save("encoder", lambda x: model.apply(variables, x, None, method="encode"), x)
    if left_context is not None and right_context is not None:
        mask = context_mask(max_frames, left_context, right_context)
        save("encoder_streaming",
             lambda x: model.apply(variables, x, mask, method="encode"), x)

    toks = jnp.zeros((1, max_tokens), jnp.int32)
    lmask = look_ahead_mask(max_tokens)
    save("decoder",
         lambda t: model.apply(variables, t, lmask, method="predict"), toks)

    d_model = model_dim(model, variables)
    enc_t = jnp.zeros((1, d_model), jnp.float32)
    dec_t = jnp.zeros((1, d_model), jnp.float32)
    save("joint",
         lambda e, d: model.apply(variables, e, d, method="joint_logits"),
         enc_t, dec_t)
    return paths


def model_dim(model, variables) -> int:
    """Encoder output dim, from the joint input kernel."""
    params = variables["params"]
    joint = params["joint"]

    def in_dim(p):
        return p["kernel_q" if "kernel_q" in p else "kernel"].shape[0]
    if "forward_layer" in joint:          # native concat joint
        return in_dim(joint["forward_layer"]) // 2
    return in_dim(joint["lin_enc"])


def load_exported(path: str):
    """Deserialize a ``.stablehlo`` artifact; returns a callable."""
    with open(path, "rb") as fh:
        exported = jax.export.deserialize(fh.read())
    return exported.call
