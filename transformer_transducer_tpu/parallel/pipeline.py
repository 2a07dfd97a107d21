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


def encode_pipelined_stacked(layer_mod: TransformerXLLayer, stacked,
                             x: jax.Array, mesh: Mesh, n_micro: int,
                             attn_mask: Optional[jax.Array] = None,
                             band: Optional[tuple] = None,
                             deterministic: bool = True,
                             dropout_rng: Optional[jax.Array] = None,
                             axis: str = PIPE_AXIS,
                             data_axis: Optional[str] = None) -> jax.Array:
    """Pipelined encoder forward from a stacked (n_layer, ...) param tree.

    The core the trainer jits (``training.train_step`` with
    ``parallel.n_pipe > 1``): ``stacked`` enters sharded ``P(axis)`` on its
    layer dim (no resharding when the caller's params already live that
    way); with ``data_axis`` the microbatch batch dim also shards over the
    mesh's data axis.  Differentiable w.r.t. ``stacked`` and ``x``;
    ``deterministic=False`` + ``dropout_rng`` enables training-mode dropout
    (independent mask per stage/tick/layer).

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
    has_mask = attn_mask is not None
    has_rng = dropout_rng is not None

    def fn(stage_params, micro_inputs, mask, rng):
        # stage_params: this device's (per_stage, ...) slice of the stack;
        # micro_inputs: (n_micro, bm_local, t, d) — local batch rows
        stage = jax.lax.axis_index(axis)
        per_stage = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
        bm_l = micro_inputs.shape[1]
        if has_rng:
            rng = jax.random.fold_in(rng, stage)
            if data_axis is not None and n_data > 1:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def run_stage(h, tk):
            def layer_step(hh, xs):
                p, li = xs
                if deterministic:
                    out = layer_mod.apply({"params": p}, hh, mask, True, band)
                else:
                    key = jax.random.fold_in(jax.random.fold_in(rng, tk), li)
                    out = layer_mod.apply({"params": p}, hh, mask, False,
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
        operands.append(attn_mask)
        in_specs.append(P())
    if has_rng:
        operands.append(dropout_rng)
        in_specs.append(P())

    def wrapper(*ops):
        i = 2
        mask = ops[i] if has_mask else None
        i += int(has_mask)
        rng = ops[i] if has_rng else None
        return fn(ops[0], ops[1], mask, rng)

    run = shard_map_compat(wrapper, mesh=mesh, in_specs=tuple(in_specs),
                           out_specs=out_spec)
    out = run(*operands)
    return out[-1].reshape(b, t, d)


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
