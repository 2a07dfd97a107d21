"""Pallas TPU kernels for the PRUNED-loss band DP (alpha/beta row sweeps).

The banded lattice (``ops/rnnt_loss_pruned.py::rnnt_loss_banded_grid``) is a
T-serial recurrence over a tiny (B, s_range) state: cell ``(t, s)`` is
lattice cell ``(t, u = rs[t] + s)``, blank edges shift the band window by
``d_t = rs[t] - rs[t-1]`` slots and label edges sweep within the row.  The
XLA ``lax.scan`` version pays ~409 loop-boundary fusion breaks plus
per-step ``take_along_axis`` gathers and an unrolled ``.at[].set`` chain —
measured 5.9 ms fwd+bwd at B=4 flagship shapes chained-in-jit (DESIGN.md
§1c), as much as the banded joint matmuls themselves.  Here the whole wavefront lives in VMEM and each row is
a handful of (B, 128) vector ops:

* the per-batch dynamic band shift ``d`` becomes ``s_range`` static
  ``pltpu.roll``s selected by ``d == k`` (0 <= d <= s_range-1 by
  ``bounds_from_occ`` construction; anything else means "no in-band
  source" and stays NEG, matching the oracle's guard);
* the in-row label chain (first-order recurrence over s) is unrolled —
  s_range is small and static;
* rows are chunked over the grid with the (B, 128) wavefront carried in
  VMEM scratch across grid steps, exactly like the full-lattice kernels
  (``rnnt_kernel.py``, DESIGN.md §2b) — one serial T-sweep for any batch.

Per-batch sequence ends are handled in-sweep: the beta kernel injects the
terminal cell ``(t_len-1, sf)`` row-by-row (each batch element can end at a
different row), and rows past a batch element's terminal naturally stay NEG
because the carried wavefront only turns finite at its injection row.

Contract matches ``rnnt_loss_pruned.rnnt_loss_banded_grid`` (the test
oracle).  Reference context: the loss being replaced is the CUDA
warp-transducer (``/root/reference/train.py:13,231``); the pruning recipe
is the published k2/BAT band, see ``rnnt_loss_pruned.py``.
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


def _t_chunk(b: int, n_blocks: int, budget: int = 5 << 20) -> int:
    """Rows per grid step: keep ``n_blocks`` (B, tc, 128) f32 blocks under
    ``budget`` bytes (Pallas double-buffers blocks for grid pipelining)."""
    per_row = b * LANES * 4 * n_blocks
    tc = max(8, min(512, budget // max(per_row, 1)))
    return tc - tc % 8


def _pad_rows(x: jax.Array, tc: int, value: float) -> jax.Array:
    t = x.shape[1]
    pad = (-t) % tc
    if pad:
        cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, cfg, constant_values=value)
    return x


def _pad_lanes(x: jax.Array) -> jax.Array:
    pad = LANES - x.shape[-1]
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad)), constant_values=NEG)


def _band_shift(x: jax.Array, d_col: jax.Array, s_range: int,
                direction: int) -> jax.Array:
    """``out[:, s] = x[:, s + direction * d]`` with NEG out-of-band fill,
    as s_range static rolls selected by the per-batch ``d`` (B, LANES,
    lane-broadcast — Mosaic cannot dynamically slice single lanes, so the
    wrappers pre-broadcast the per-row scalars across the lane axis)."""
    out = jnp.full_like(x, NEG)
    for k in range(s_range):
        rolled = x if k == 0 else pltpu.roll(
            x, (LANES - k) if direction > 0 else k, axis=1)
        out = jnp.where(d_col == k, rolled, out)
    return out


def _alpha_kernel(s_range: int, d_ref, sb_ref, sl_ref, alpha_ref, carry):
    b, tc, _ = sb_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)
    in_band = lane < s_range
    base = pl.program_id(0) * tc

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry[...] = jnp.full((b, LANES), NEG)

    def body(j, _):
        t = base + j
        prev = carry[...]
        d_col = d_ref[:, j, :]                     # (B, LANES) broadcast
        # blank edges: out of row t-1, band window re-based by d_t
        prev_total = prev + sb_ref[:, j, :]        # sb row t = lp_b[t-1]
        blank_in = _band_shift(prev_total, d_col, s_range, direction=1)
        # row 0 has no predecessor row: paths start at lattice (0, 0)
        blank_in = jnp.where(t == 0,
                             jnp.where(lane == 0, 0.0, NEG), blank_in)
        # in-row label chain: a[s] = logaddexp(blank_in[s],
        #                                      a[s-1] + lp_l[t, s-1])
        lpl = sl_ref[:, j, :]
        a = blank_in
        for s in range(1, s_range):
            cand = pltpu.roll(a + lpl, 1, axis=1)  # lane s <- a[s-1]+lpl[s-1]
            a = _logaddexp(a, jnp.where(lane == s, cand, NEG))
        a = jnp.where(in_band, a, NEG)
        alpha_ref[:, j, :] = a
        carry[...] = a
        return 0

    jax.lax.fori_loop(0, tc, body, 0)


def _beta_kernel(s_range: int, d_ref, lb_ref, ll_ref, tf_ref, sf_ref,
                 beta_ref, carry):
    b, tc, _ = lb_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)
    in_band = lane < s_range
    n_chunks = pl.num_programs(0)
    base = (n_chunks - 1 - pl.program_id(0)) * tc
    tf_col = tf_ref[...]                           # (B, LANES) broadcast
    sf_col = sf_ref[...]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry[...] = jnp.full((b, LANES), NEG)

    def body(i, _):
        j = tc - 1 - i                             # descending rows
        t = base + j
        nxt = carry[...]
        d_col = d_ref[:, j, :]                     # d_{t+1}, lane-broadcast
        lpb = lb_ref[:, j, :]
        lpl = ll_ref[:, j, :]
        # blank continuation: beta'[t+1, s - d_{t+1}]
        shifted = _band_shift(nxt, d_col, s_range, direction=-1)
        is_term = (t == tf_col)                    # per-batch terminal row
        blank_term = jnp.where(
            is_term, jnp.where(lane == sf_col, lpb, NEG), lpb + shifted)
        # in-row reverse label chain:
        #   bt[s] = logaddexp(blank_term[s], lpl[s] + bt[s+1])
        bt = blank_term
        for s in range(s_range - 2, -1, -1):
            cand = lpl + pltpu.roll(bt, LANES - 1, axis=1)  # lane s <- bt[s+1]
            bt = _logaddexp(bt, jnp.where(lane == s, cand, NEG))
        bt = jnp.where(in_band, bt, NEG)
        beta_ref[:, j, :] = bt
        carry[...] = bt
        return 0

    jax.lax.fori_loop(0, tc, body, 0)


@functools.partial(jax.jit, static_argnames=("s_range", "interpret"))
def band_alpha_pallas(lp_b: jax.Array, lp_l: jax.Array, d_alpha: jax.Array,
                      s_range: int, interpret: bool = False) -> jax.Array:
    """Band alphas (B, T, s_range); ``d_alpha[:, t] = rs[t] - rs[t-1]``
    (row 0 unused)."""
    b, t, _ = lp_b.shape
    sb = jnp.pad(lp_b, ((0, 0), (1, 0), (0, 0)),
                 constant_values=NEG)[:, :-1]      # row t = lp_b[t-1]
    sb = _pad_lanes(sb.astype(jnp.float32))
    sl = _pad_lanes(lp_l.astype(jnp.float32))
    tc = _t_chunk(b, n_blocks=4)
    sb = _pad_rows(sb, tc, NEG)
    sl = _pad_rows(sl, tc, NEG)
    d_p = _pad_rows(jnp.broadcast_to(d_alpha.astype(jnp.int32)[:, :, None],
                                     (b, t, LANES)), tc, 0)
    tp = sb.shape[1]
    spec = pl.BlockSpec((b, tc, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_alpha_kernel, s_range),
        out_shape=jax.ShapeDtypeStruct((b, tp, LANES), jnp.float32),
        grid=(tp // tc,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((b, LANES), jnp.float32)],
        interpret=interpret,
    )(d_p, sb, sl)
    return out[:, :t, :s_range]


@functools.partial(jax.jit, static_argnames=("s_range", "interpret"))
def band_beta_pallas(lp_b: jax.Array, lp_l: jax.Array, d_beta: jax.Array,
                     tf: jax.Array, sf: jax.Array, s_range: int,
                     interpret: bool = False) -> jax.Array:
    """Band betas (B, T, s_range): ``beta[t, s]`` is the log-prob of
    finishing from cell (t, s) (terminal blank included).
    ``d_beta[:, t] = rs[t+1] - rs[t]`` (last row unused); ``tf``/``sf``
    are each batch element's terminal (row, slot)."""
    b, t, _ = lp_b.shape
    lb = _pad_lanes(lp_b.astype(jnp.float32))
    ll = _pad_lanes(lp_l.astype(jnp.float32))
    tc = _t_chunk(b, n_blocks=4)
    lb = _pad_rows(lb, tc, NEG)
    ll = _pad_rows(ll, tc, NEG)
    d_p = _pad_rows(jnp.broadcast_to(d_beta.astype(jnp.int32)[:, :, None],
                                     (b, t, LANES)), tc, 0)
    tp = lb.shape[1]
    n_chunks = tp // tc
    spec = pl.BlockSpec((b, tc, LANES), lambda i: (0, n_chunks - 1 - i, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((b, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_beta_kernel, s_range),
        out_shape=jax.ShapeDtypeStruct((b, tp, LANES), jnp.float32),
        grid=(n_chunks,),
        in_specs=[spec, spec, spec, col, col],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((b, LANES), jnp.float32)],
        interpret=interpret,
    )(d_p, lb, ll,
      jnp.broadcast_to(tf.astype(jnp.int32)[:, None], (b, LANES)),
      jnp.broadcast_to(sf.astype(jnp.int32)[:, None], (b, LANES)))
    return out[:, :t, :s_range]
