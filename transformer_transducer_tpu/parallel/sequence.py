"""Sequence parallelism for banded encoding (shard_map + ppermute halos).

Beyond-reference TPU scaling capability: the streaming band limits every
encoder layer's receptive field to ``[i - left, i + right]`` frames
(reference ``tt/utils.py:242-251``), so the TIME axis of long audio shards
across devices with only ``left + right`` frames of neighbor exchange per
layer — two ``jax.lax.ppermute`` halo transfers riding ICI, no all-gather,
no O(T) replication.  This is the long-audio analog of the streaming
session's chunking (``streaming/session.py``), run as ONE SPMD program.

Semantics follow the framework's pinned-window rule (DESIGN.md §2): the
rel-position tables are sliced by sequence length, so every shard's window
is padded to one fixed ``window_len`` — the SAME rule that makes chunked
streaming decode exact.  Frames past either sequence boundary are
zero-valued rows visible through the band mask, exactly like the zero
padding the streaming session's final window sees.  Consequently the
result is INVARIANT in the number of shards (property-tested: 1, 2, 4, 8
shards bit-match a single-device layer-by-layer oracle) provided each
shard covers its own halo (``T/n >= max(left, right)``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from transformer_transducer_tpu.parallel.mesh import shard_map_compat

from transformer_transducer_tpu.models.attention import TransformerXLLayer
from transformer_transducer_tpu.ops.masks import context_mask

SEQ_AXIS = "seq"


def seq_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    """A 1-axis ('seq',) mesh over ``n`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n or len(devices)
    if n > len(devices):
        raise ValueError(f"seq_mesh: requested {n} devices but only "
                         f"{len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (SEQ_AXIS,))


def pinned_window_len(left: int, shard: int, right: int) -> int:
    """Default window pin: the shard plus halos, rounded up to a
    lane-friendly multiple of 64 (same rule as StreamingConfig)."""
    return -(-(left + shard + right) // 64) * 64


def encode_banded_sp(model, variables, x: jax.Array, mesh: Mesh,
                     left: int, right: int,
                     window_len: Optional[int] = None,
                     axis: str = SEQ_AXIS,
                     data_axis: Optional[str] = None,
                     deterministic: bool = True,
                     dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Banded encode of ``x`` (B, T, D) with T sharded over ``mesh[axis]``.

    Per layer, each shard ppermutes its last ``left`` frames to the right
    neighbor and first ``right`` frames to the left neighbor, places
    [left-halo | local | right-halo] into a ``window_len`` buffer (the
    first/last shard drop the halo that would wrap around the sequence),
    runs the layer under ``context_mask(window_len, left, right)`` and
    keeps the local frames.

    Composition with data parallelism (``parallel.n_seq`` in the trainer):
    pass ``data_axis`` and the batch dim additionally shards over the
    mesh's data axis.  Training mode: ``deterministic=False`` plus a
    ``dropout_rng`` applies per-(layer, shard) folded dropout keys —
    different masks than the unpipelined encoder (any iid masks are
    equally valid), so parity tests run with dropout 0.

    Returns the (B, T, D) encoding, logically sharded on T.
    """
    e = model.enc
    n_layer = e[0]
    n = mesh.shape[axis]
    b, t, d = x.shape
    if t % n:
        raise ValueError(f"T={t} must divide over {n} shards")
    shard = t // n
    if shard < max(left, right):
        raise ValueError(f"shard {shard} must cover the halo "
                         f"(left {left} / right {right})")
    w = window_len or pinned_window_len(left, shard, right)
    if w < left + shard + right:
        raise ValueError(f"window_len {w} < left+shard+right "
                         f"{left + shard + right}")
    if not deterministic and dropout_rng is None:
        raise ValueError("deterministic=False requires a dropout_rng")
    mask = context_mask(w, left, right)
    layer_mod = TransformerXLLayer(
        k_len=e[1], n_head=e[2], d_model=e[3], d_head=e[4], d_inner=e[5],
        dropout=model.dropout if not deterministic else 0.0,
        compute_dtype=model.compute_dtype)
    params = variables["params"] if "params" in variables else variables
    enc_params = params["encoder"]
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    has_rng = dropout_rng is not None

    send_right = [(j, (j + 1) % n) for j in range(n)]
    send_left = [(j, (j - 1) % n) for j in range(n)]

    def fn(enc_params, xs, rng):
        idx = jax.lax.axis_index(axis)
        bl = xs.shape[0]   # local batch rows (sharded when data_axis set)
        if has_rng:
            rng = jax.random.fold_in(rng, idx)
            if data_axis is not None and n_data > 1:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        # first shard: local frames sit at window position 0 (no left
        # halo); interior shards at position `left`
        off = jnp.where(idx == 0, 0, left)
        h = xs
        for i in range(n_layer):
            # NB: slice with `shard - left`, not `-left` — a negative-zero
            # slice (`h[:, -0:]`) would grab the WHOLE shard when left == 0
            if n > 1 and left > 0:
                lh = jax.lax.ppermute(h[:, shard - left:], axis, send_right)
            else:
                lh = jnp.zeros((bl, left, d), h.dtype)
            if n > 1 and right > 0:
                rh = jax.lax.ppermute(h[:, :right], axis, send_left)
            else:
                rh = jnp.zeros((bl, right, d), h.dtype)
            # the last shard's right halo wrapped around from shard 0:
            # past-the-end frames are zero rows (streaming tail convention)
            rh = jnp.where(idx == n - 1, 0.0, rh)
            body = jnp.concatenate([lh, h, rh], axis=1)
            # shift out the (wrapped, unused) left halo on shard 0, then
            # pad to the pinned window length
            body = jnp.pad(body, ((0, 0), (0, left + (w - (left + shard + right))), (0, 0)))
            window = jax.lax.dynamic_slice_in_dim(body, left - off, w, axis=1)
            lp = {"params": enc_params[f"layer_{i}"]}
            if deterministic:
                out = layer_mod.apply(lp, window, mask, True)
            else:
                out = layer_mod.apply(lp, window, mask, False,
                                      rngs={"dropout": jax.random.fold_in(rng, i)})
            h = jax.lax.dynamic_slice_in_dim(out, off, shard, axis=1)
        return h

    xspec = P(data_axis if data_axis is not None and n_data > 1 else None,
              axis, None)
    operands = [enc_params, x]
    in_specs = [P(), xspec]
    if has_rng:
        operands.append(dropout_rng)
        in_specs.append(P())
    wrapper = (fn if has_rng
               else (lambda ep, xs: fn(ep, xs, None)))
    run = shard_map_compat(wrapper, mesh=mesh,
                    in_specs=tuple(in_specs),
                    out_specs=xspec)
    return run(*operands)


def encode_banded_sp_oracle(model, variables, x: jax.Array, n: int,
                            left: int, right: int,
                            window_len: Optional[int] = None) -> jax.Array:
    """Single-device layer-by-layer reference of :func:`encode_banded_sp`
    (explicit python slicing instead of shard_map/ppermute) — the test
    oracle for the halo-exchange logic."""
    e = model.enc
    b, t, d = x.shape
    shard = t // n
    w = window_len or pinned_window_len(left, shard, right)
    mask = context_mask(w, left, right)
    layer_mod = TransformerXLLayer(
        k_len=e[1], n_head=e[2], d_model=e[3], d_head=e[4], d_inner=e[5],
        dropout=0.0, compute_dtype=model.compute_dtype)
    params = variables["params"] if "params" in variables else variables
    enc_params = params["encoder"]

    h = np.asarray(x)
    for i in range(e[0]):
        outs = []
        padded_h = np.concatenate(
            [h, np.zeros((b, right, d), h.dtype)], axis=1)
        for s in range(n):
            start = s * shard
            lo = max(0, start - left)
            window = padded_h[:, lo:start + shard + right]
            off = start - lo
            buf = np.zeros((b, w, d), h.dtype)
            buf[:, :window.shape[1]] = window
            out = layer_mod.apply({"params": enc_params[f"layer_{i}"]},
                                  jnp.asarray(buf), mask, True)
            outs.append(np.asarray(out)[:, off:off + shard])
        h = np.concatenate(outs, axis=1)
    return jnp.asarray(h)
