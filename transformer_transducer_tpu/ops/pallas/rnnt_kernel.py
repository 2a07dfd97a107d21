"""Pallas TPU kernels for the RNN-T lattice (alpha/beta wavefront sweeps).

This is the TPU-native replacement for the reference's one native component,
the CUDA warp-transducer loss (reference: ``train.py:13,231``).  The lattice
recursion runs along anti-diagonals (see ``ops/rnnt_loss.py`` for the math):
each step is a dense (B, U+1) vector op, so a whole batch-tile's DP lives in
VMEM and sweeps with zero HBM traffic between steps — the XLA scan version
round-trips carry state through HBM on every step boundary fusion break.

Layout: diagonals on the sublane axis, lattice-u on the lane axis (padded to
128), batch-tiled grid.  The u-shift between diagonals is a lane roll.

Contract matches ``rnnt_loss._alpha_scan`` / ``_beta_scan`` (those are the
test oracles): inputs are pre-skewed diag-major grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANES = 128


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    return mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _pad_lanes(x: jax.Array) -> jax.Array:
    """Pad the trailing (u) axis to a lane multiple with NEG."""
    u1 = x.shape[-1]
    pad = (-u1) % LANES
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=NEG)
    return x


def _alpha_kernel(sb_ref, sl_ref, alpha_ref):
    b, d_total, u1p = sb_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, u1p), 1)
    first = (lane == 0)
    alpha_ref[:, 0, :] = jnp.where(first, 0.0, NEG)

    def body(d, prev):
        blank = prev + sb_ref[:, d - 1, :]
        label = prev + sl_ref[:, d - 1, :]
        label = jnp.where(first, NEG, pltpu.roll(label, 1, axis=1))
        cur = _logaddexp(blank, label)
        alpha_ref[:, d, :] = cur
        return cur

    init = jnp.where(first, 0.0, jnp.full((b, u1p), NEG))
    jax.lax.fori_loop(1, d_total, body, init)


def _beta_kernel(sb_ref, sl_ref, inject_ref, beta_ref):
    b, d_total, u1p = sb_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, u1p), 1)
    last = (lane == u1p - 1)
    beta_ref[:, d_total - 1, :] = inject_ref[:, d_total - 1, :]

    def body(i, nxt):
        d = d_total - 2 - i
        blank = sb_ref[:, d, :] + nxt
        # left-shift = circular roll by (lanes - 1), wrap lane masked below
        label = sl_ref[:, d, :] + jnp.where(last, NEG,
                                            pltpu.roll(nxt, u1p - 1, axis=1))
        cur = _logaddexp(_logaddexp(blank, label), inject_ref[:, d, :])
        beta_ref[:, d, :] = cur
        return cur

    jax.lax.fori_loop(0, d_total - 1, body, inject_ref[:, d_total - 1, :])


def _tile_batch(b: int) -> int:
    for cand in (8, 4, 2, 1):
        if b % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def alpha_scan_pallas(skew_b: jax.Array, skew_l: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Diag-major alpha (B, D, U1) from pre-skewed grids."""
    b, d_total, u1 = skew_b.shape
    sb = _pad_lanes(skew_b)
    sl = _pad_lanes(skew_l)
    u1p = sb.shape[-1]
    tb = _tile_batch(b)
    out = pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d_total, u1p), jnp.float32),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, d_total, u1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d_total, u1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, d_total, u1p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sb, sl)
    return out[..., :u1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def beta_scan_pallas(skew_b: jax.Array, skew_l: jax.Array,
                     inject: jax.Array, interpret: bool = False) -> jax.Array:
    """Diag-major beta' (B, D, U1) from pre-skewed grids + terminal inject."""
    b, d_total, u1 = skew_b.shape
    sb = _pad_lanes(skew_b)
    sl = _pad_lanes(skew_l)
    inj = _pad_lanes(inject)
    u1p = sb.shape[-1]
    tb = _tile_batch(b)
    spec = pl.BlockSpec((tb, d_total, u1p), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _beta_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d_total, u1p), jnp.float32),
        grid=(b // tb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(sb, sl, inj)
    return out[..., :u1]
