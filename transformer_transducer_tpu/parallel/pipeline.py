"""Pipeline parallelism for the audio encoder (GPipe-style microbatching).

Beyond-reference TPU scaling capability, completing the parallelism grid
(dp: ``parallel/mesh.py`` + ``training/train_step.py``; tp:
``parallel/sharding.py``; sp: ``parallel/sequence.py``; pp: this module —
ep is N/A, the architecture has no experts).  The reference's only active
parallelism is single-process ``torch.nn.DataParallel``
(``/root/reference/train.py:216-218``); everything here is new capability.

The encoder is N identical rel-attention layers (``tt/encoder.py:32-50``),
so it splits into ``n_stages`` contiguous stages of ``N / n_stages`` layers.
Each device holds ONE stage's parameters (the stacked layer tree is sharded
on the ``pipe`` mesh axis — at 18 layers x d_model 512 this is what makes
models larger than one chip's HBM trainable).  The batch splits into
``n_micro`` microbatches that flow through the ring: every tick each stage
runs its layers on its current microbatch and ``ppermute``s the activation
to the next stage over ICI.  Total ticks = ``n_micro + n_stages - 1``;
bubble fraction = ``(n_stages - 1) / ticks``, so feed ``n_micro >>
n_stages`` to amortize it.

The whole schedule is ONE jitted SPMD program (``shard_map`` over a
``('pipe',)`` mesh, ``lax.scan`` over ticks) and is DIFFERENTIABLE: jax
reverse-mode through ``ppermute`` is the inverse permutation, so the
backward pass is automatically the reverse pipeline (grads flow
last-stage -> first-stage with the same microbatch schedule).  Stage
invariance is property-tested: any (n_stages, n_micro) bit-matches the
single-device encode, and grads match autodiff through the unpipelined
encoder.
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


def encode_pipelined(model, variables, x: jax.Array, mesh: Mesh,
                     n_micro: int, attn_mask: Optional[jax.Array] = None,
                     axis: str = PIPE_AXIS) -> jax.Array:
    """Pipelined audio-encoder forward: (B, T, D) -> (B, T, D).

    ``model.enc[0]`` layers split over ``mesh[axis]`` stages; the batch
    splits into ``n_micro`` microbatches (``B % n_micro == 0``).  The result
    is invariant in (n_stages, n_micro) and equals ``model.encode(x,
    attn_mask)``.  Differentiable w.r.t. ``variables`` and ``x``.

    Layout notes: microbatch inputs enter replicated (only stage 0 reads
    them) and the output leaves on the last stage — at pod scale wrap this
    in an outer dp mesh axis so each pipeline feeds from its own batch
    shard.  The ppermute ring moves one (B/n_micro, T, D) activation per
    tick per stage over ICI.
    """
    e = model.enc
    n_layer = e[0]
    n_stages = mesh.shape[axis]
    if n_layer % n_stages:
        raise ValueError(f"n_layer={n_layer} must divide over "
                         f"{n_stages} pipeline stages")
    b, t, d = x.shape
    if b % n_micro:
        raise ValueError(f"B={b} must divide into {n_micro} microbatches")
    per_stage = n_layer // n_stages
    bm = b // n_micro
    n_tick = n_micro + n_stages - 1

    layer_mod = TransformerXLLayer(
        k_len=e[1], n_head=e[2], d_model=e[3], d_head=e[4], d_inner=e[5],
        dropout=0.0, compute_dtype=model.compute_dtype)
    params = variables["params"] if "params" in variables else variables
    stacked = stack_encoder_layers(params["encoder"], n_layer)
    micro = x.reshape(n_micro, bm, t, d)
    ring = [(j, (j + 1) % n_stages) for j in range(n_stages)]

    def fn(stage_params, micro_inputs, mask):
        # stage_params: this device's (per_stage, ...) slice of the stack
        stage = jax.lax.axis_index(axis)

        def run_stage(h):
            def layer_step(hh, p):
                return layer_mod.apply({"params": p}, hh, mask, True), None
            out, _ = jax.lax.scan(layer_step, h, stage_params)
            return out

        def tick(carry, tk):
            state, buf = carry
            # stage 0 ingests microbatch `tk` (clipped reads past the end
            # are dead work — their outputs fall outside the valid window)
            inp = jax.lax.dynamic_index_in_dim(
                micro_inputs, jnp.clip(tk, 0, n_micro - 1), 0, keepdims=False)
            h = jnp.where(stage == 0, inp, state)
            y = run_stage(h)
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

        state0 = jnp.zeros((bm, t, d), x.dtype)
        buf0 = jnp.zeros((n_micro, bm, t, d), x.dtype)
        (_, buf), _ = jax.lax.scan(tick, (state0, buf0),
                                   jnp.arange(n_tick))
        # out_spec P(axis): only the last stage's buffer is the answer;
        # callers slice [-1].  (Avoids an O(output) psum collective.)
        return buf[None]

    if attn_mask is None:
        # in_specs can't describe a None leaf — bind it statically
        run = shard_map_compat(lambda sp, mi: fn(sp, mi, None), mesh=mesh,
                        in_specs=(P(axis), P()),
                        out_specs=P(axis))
        out = run(stacked, micro)
    else:
        run = shard_map_compat(fn, mesh=mesh,
                        in_specs=(P(axis), P(), P()),
                        out_specs=P(axis))
        out = run(stacked, micro, attn_mask)
    return out[-1].reshape(b, t, d)
