"""Family-dispatching model construction for the CLI apps.

The two model families share the CLI surface (configs select the family:
an espnet-schema config carries a ``model.mask`` block, reference
``config/espnet_aishell.yaml`` vs ``config/joint_*.yaml``).  This is the one
place the apps decide which family a config means — the same marker
``streaming.StreamingConfig.from_config`` uses.
"""

from __future__ import annotations


def build_family(cfg, d_in: int):
    """(model, init_variables, is_espnet) from a full config.

    ``d_in``: stacked feature dimension (``feature_dim * (1 + left + right)``
    via ``utils.config.stack_context``); init shapes only — checkpoints
    restore over these variables.
    """
    import jax
    import jax.numpy as jnp

    # jit the inits: an EAGER init is hundreds of per-op dispatches (plus,
    # cold, per-op server compiles) through a remote-relay TPU backend —
    # measured ~87 s eager vs ~9 s jitted for the 4-layer aishell model and
    # minutes vs ~18 s at flagship size (CLAUDE.md env gotchas)
    if cfg.model.mask is not None:   # espnet-schema marker
        from transformer_transducer_tpu.models.espnet_variant import (
            build_espnet_transducer)
        model = build_espnet_transducer(cfg.model)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, d_in)),
            jnp.asarray([8]), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
        return model, variables, True
    from transformer_transducer_tpu.models.transducer import build_transducer
    model = build_transducer(cfg.model)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8, d_in)),
                                    jnp.zeros((1, 4), jnp.int32))
    return model, variables, False


def load_family(cfg, d_in: int, ckpt_dir=None, int8: bool = False):
    """``build_family`` + optional checkpoint restore + optional int8.

    Handles both checkpoint layouts: a float checkpoint restores over the
    float template (then quantizes if ``int8``); an int8-baked checkpoint
    (``meta.json`` ``quant: "int8"``, written by
    ``tools/quantize_checkpoint.py``) restores over the quantized template
    directly.  Returns ``(model, variables, is_espnet)``.
    """
    import json
    import os

    model, variables, is_espnet = build_family(cfg, d_in)
    if ckpt_dir is None:
        return (to_quant(model, variables) + (is_espnet,) if int8
                else (model, variables, is_espnet))
    from transformer_transducer_tpu.utils import checkpoint as ckpt_lib
    with open(os.path.join(ckpt_dir, "meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("quant") == "int8":
        model, variables = to_quant(model, variables)
        params, _, _ = ckpt_lib.load_checkpoint(ckpt_dir, variables["params"])
        return model, {"params": params}, is_espnet
    params, _, _ = ckpt_lib.load_checkpoint(ckpt_dir, variables["params"])
    variables = {"params": params}
    if int8:
        model, variables = to_quant(model, variables)
    return model, variables, is_espnet


def to_quant(model, variables):
    """(model, float variables) -> the int8 serving twin.

    Post-training W8A8 quantization (ops/quant.py): the returned model has
    ``quant=True`` and the returned variables carry int8 kernels +
    per-channel scales.  Inference-only — training always runs float.
    """
    from transformer_transducer_tpu.ops.quant import quantize_variables
    return model.clone(quant=True), quantize_variables(variables)
