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


def encode_banded_sp_espnet(model, params, xs: jax.Array,
                            lengths: Optional[jax.Array], mesh: Mesh,
                            window_len: Optional[int] = None,
                            axis: str = SEQ_AXIS,
                            data_axis: Optional[str] = None,
                            deterministic: bool = True,
                            dropout_rng: Optional[jax.Array] = None):
    """ESPnet-family banded encode with the time axis sharded (VERDICT r4
    #4, the §3b argument): the sinusoidal signed rel-pos encoding is fully
    length-shift-invariant (``models/espnet_variant.py`` module notes), so
    — unlike the native family's pinned-window semantics — every shard's
    window computes EXACTLY the full-T banded attention restricted to its
    rows.  ``encode_banded_sp_espnet(...) == model.encode(...)`` up to
    float reassociation, any shard count, pad masks included.

    Per layer each shard halo-exchanges ``left``/``right`` frames over ICI
    (``ppermute``), builds a ``window_len`` buffer, masks keys by band ∧
    absolute-position validity (content bounds + per-row lengths — the dp
    path's pad∧band combine, window-relative), and keeps its local rows.
    The input layer / sqrt(d) / positional dropout / after_norm run on the
    data-parallel part around the shard_map (pointwise or pre-shard).

    Returns ``(enc (B, T, D) logically sharded on T, out_lengths)``.
    Train-mode dropout uses per-(shard, layer) folded keys; the positional
    table drops per WINDOW — valid iid draws, different stream than the dp
    path (parity tests run dropout 0)."""
    import math

    from transformer_transducer_tpu.models.espnet_variant import (
        apply_input_layer_pure, rel_positional_encoding)
    from transformer_transducer_tpu.parallel.pipeline import (
        _pure_dropout, _pure_layer_norm, espnet_encoder_layer_module)

    kw = dict(model.enc_kwargs)
    d = kw["output_size"]
    n_layer = kw["num_blocks"]
    left, right = model.encoder_left_mask, model.encoder_right_mask
    if left < 0 or right < 0:
        raise ValueError("espnet sequence parallelism needs a finite band "
                         "(model.mask.encoder_left_mask/right_mask >= 0)")
    if not deterministic and dropout_rng is None:
        raise ValueError("deterministic=False requires a dropout_rng")
    p_rate = kw.get("positional_dropout_rate") or 0.0
    keys = (jax.random.split(dropout_rng, 4) if not deterministic
            else (None,) * 4)
    enc_params = params["encoder"]

    x, lens = apply_input_layer_pure(kw, enc_params, xs, lengths, keys[0],
                                     deterministic)
    b, t, _ = x.shape
    n = mesh.shape[axis]
    if t % n:
        raise ValueError(f"model-rate T={t} must divide over {n} shards")
    shard = t // n
    if shard < max(left, right):
        raise ValueError(f"shard {shard} must cover the halo "
                         f"(left {left} / right {right})")
    w = window_len or pinned_window_len(left, shard, right)
    if w < left + shard + right:
        raise ValueError(f"window_len {w} < left+shard+right "
                         f"{left + shard + right}")

    x = x * math.sqrt(d)
    x = _pure_dropout(x, p_rate, keys[1], deterministic)
    pos_w = jnp.asarray(rel_positional_encoding(w, d))
    pos_w = _pure_dropout(pos_w, p_rate, keys[2], deterministic)
    band_w = context_mask(w, left, right)
    layer_mod = espnet_encoder_layer_module(model)
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    has_rng = dropout_rng is not None
    has_len = lens is not None

    send_right = [(j, (j + 1) % n) for j in range(n)]
    send_left = [(j, (j - 1) % n) for j in range(n)]

    def fn(layer_params, xs_local, lens_local, rng):
        idx = jax.lax.axis_index(axis)
        bl = xs_local.shape[0]
        if has_rng:
            rng = jax.random.fold_in(rng, idx)
            if data_axis is not None and n_data > 1:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        off = jnp.where(idx == 0, 0, left)
        # window slot k holds absolute frame idx*shard + k - off; a key is
        # valid iff it is real window CONTENT (k < off + shard + right) and
        # inside the row's valid length — exactly the dp path's key-side
        # pad mask, window-relative.  (band handles the rest.)
        k_idx = jnp.arange(w)[None, :]
        abs_pos = idx * shard + k_idx - off
        content = k_idx < (off + shard + right)
        valid_len = (lens_local[:, None] if has_len
                     else jnp.full((bl, 1), t))
        key_bad = ~content | (abs_pos >= jnp.minimum(valid_len, t)) \
            | (abs_pos < 0)
        mask = band_w[None] | key_bad[:, None, :]      # (bl, w, w)

        h = xs_local
        for i in range(n_layer):
            if n > 1 and left > 0:
                lh = jax.lax.ppermute(h[:, shard - left:], axis, send_right)
            else:
                lh = jnp.zeros((bl, left, d), h.dtype)
            if n > 1 and right > 0:
                rh = jax.lax.ppermute(h[:, :right], axis, send_left)
            else:
                rh = jnp.zeros((bl, right, d), h.dtype)
            rh = jnp.where(idx == n - 1, 0.0, rh)
            body = jnp.concatenate([lh, h, rh], axis=1)
            body = jnp.pad(
                body, ((0, 0), (0, left + (w - (left + shard + right))),
                       (0, 0)))
            window = jax.lax.dynamic_slice_in_dim(body, left - off, w,
                                                  axis=1)
            lp = {"params": layer_params[f"layer_{i}"]}
            if deterministic:
                out = layer_mod.apply(lp, window, pos_w, mask, True)
            else:
                out = layer_mod.apply(
                    lp, window, pos_w, mask, False,
                    rngs={"dropout": jax.random.fold_in(rng, i)})
            h = jax.lax.dynamic_slice_in_dim(out, off, shard, axis=1)
        return h

    layer_params = {k: v for k, v in enc_params.items()
                    if k.startswith("layer_")}
    xspec = P(data_axis if data_axis is not None and n_data > 1 else None,
              axis, None)
    lspec = P(data_axis if data_axis is not None and n_data > 1 else None)
    operands = [layer_params, x,
                lens if has_len else jnp.zeros((b,), jnp.int32)]
    in_specs = [P(), xspec, lspec]
    if has_rng:
        operands.append(dropout_rng)
        in_specs.append(P())
    wrapper = (fn if has_rng
               else (lambda lp, xs_, ls: fn(lp, xs_, ls, None)))
    run = shard_map_compat(wrapper, mesh=mesh, in_specs=tuple(in_specs),
                           out_specs=xspec)
    h = run(*operands)
    return _pure_layer_norm(h, enc_params["after_norm"]), lens


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
