"""Pruned RNN-T loss — banded lattice over a learned alignment corridor.

Beyond-reference training-speed capability (the reference trains with the
full-grid external CUDA ``warprnnt_pytorch``, ``train.py:13,231``): the
joint network — the FLOP-dominant part of transducer training — is
evaluated only on a width-``s_range`` band of label positions around the
alignment instead of all ``U+1``, following the pruned-transducer recipe
(k2 "pruned RNN-T" / Kuang et al.; band idea also in BAT, arXiv:2305.11571
— both retrieved in PAPERS.md).  At flagship shapes (U+1 = 43, s_range 5)
this cuts the joint + grid work ~8.6x.

Three stages:

1. **Simple (linearized) joint** — the full joint is
   ``act(enc@W_e + dec@W_d + b1) @ W_out + b_out``; dropping the
   activation makes it ADDITIVE: ``logits = A[t] + L[u]`` with
   ``A = (enc@W_e)@W_out`` and ``L = (dec@W_d + b1)@W_out + b_out``.
   No extra parameters (k2 trains a separate trivial joiner; reusing the
   linearization keeps checkpoints unchanged), and the (B,T,U+1) log-prob
   grids cost two thin matmuls plus a per-u logsumexp sweep — ~2 % of the
   full joint.
2. **Pruning bounds** — occupancy posteriors of the simple lattice (the
   analytic grads of :func:`ops.rnnt_loss.rnnt_loss_grid`) give a
   per-frame alignment center; ``pruned_bounds`` turns it into monotone
   band starts ``rs`` with step <= s_range-1, rs[0] = 0, and terminal
   coverage of (t_len-1, u_len).  All under ``stop_gradient``.
3. **Banded full joint + band DP** — the real joint evaluated only at
   ``u in [rs[t], rs[t]+s_range)`` (T-chunked under ``jax.checkpoint``
   like the full fused path), then the band DP over t.  On TPU the DP
   runs as Pallas row sweeps with an analytic VJP
   (:func:`rnnt_loss_banded_pallas`; ``ops/pallas/band_kernel.py``) —
   the XLA ``lax.scan`` version (:func:`rnnt_loss_banded_grid`, also the
   test oracle) pays ~T loop-boundary fusion breaks and measured 5.9 ms
   fwd+bwd at B=4 flagship shapes chained-in-jit (DESIGN.md §1c), as much
   as the banded joint matmuls themselves.

Properties (tested): with ``s_range >= U+1`` the band covers the whole
grid and the loss/gradients equal :func:`ops.rnnt_loss.rnnt_loss_fused`
exactly; with a narrow band the loss upper-bounds the full NLL (pruning
removes paths).  Feasibility: the corridor must be able to climb to
``u_len`` — requires ``u_len <= (t_len-1)*(s_range-1)`` (always true for
ASR shapes, e.g. 42 <= 409*4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.ops.rnnt_loss import (NEG, _logaddexp,
                                                      _use_pallas)


# ---------------------------------------------------------------------------
# Stage 1: linearized-joint log-prob grids
# ---------------------------------------------------------------------------

def simple_grid_logprobs(enc: jax.Array, dec: jax.Array, joint_params,
                         labels: jax.Array, blank: int = 0,
                         compute_dtype=jnp.float32
                         ) -> Tuple[jax.Array, jax.Array]:
    """Blank/label log-prob grids (each (B, T, U+1)) of the LINEARIZED
    joint ``A[t] + L[u]`` (no activation).

    The additive structure means only the normalizer needs a (t, u, v)
    sweep — done by the VMEM-resident Pallas kernel
    (``ops/pallas/logz_kernel.py``; A read from HBM once instead of U+1
    times); the blank/label numerators are two gathers."""
    from transformer_transducer_tpu.ops.pallas.logz_kernel import (
        additive_logz)
    w_enc, w_dec, b1, w_out, b_out = joint_params
    cd = compute_dtype
    a_grid = ((enc.astype(cd) @ w_enc.astype(cd)) @ w_out.astype(cd)
              ).astype(jnp.float32)                       # (B, T, V)
    l_grid = (((dec.astype(cd) @ w_dec.astype(cd) + b1) @ w_out.astype(cd)
               + b_out)).astype(jnp.float32)              # (B, U1, V)
    b, t, _ = a_grid.shape
    u1 = dec.shape[1]
    labels_pad = jnp.pad(labels, ((0, 0), (0, u1 - labels.shape[1])),
                         constant_values=blank)
    log_z = additive_logz(a_grid, l_grid)                 # (B, T, U1)
    a_lab = jnp.take_along_axis(
        a_grid, jnp.broadcast_to(labels_pad[:, None, :], (b, t, u1)), axis=2)
    l_lab = jnp.take_along_axis(l_grid, labels_pad[:, :, None], axis=2)[..., 0]
    lp_b = (a_grid[..., blank][:, :, None] + l_grid[..., blank][:, None, :]
            - log_z)
    lp_l = a_lab + l_lab[:, None, :] - log_z
    return lp_b, lp_l


# ---------------------------------------------------------------------------
# Stage 2: pruning bounds
# ---------------------------------------------------------------------------

@jax.custom_vjp
def simple_loss_and_occ(lp_b: jax.Array, lp_l: jax.Array, t_len: jax.Array,
                        u_len: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """Simple-lattice NLL (B,) AND occupancy posteriors (B, T, U+1) from
    ONE alpha+beta sweep.  ``jax.grad`` of the loss would run a second
    full sweep just to read the posteriors the backward already computes;
    this custom rule exposes them as an output (treated as constant by
    the VJP — use for the stop-gradient pruning bounds) and reuses them
    as the saved residual for the loss gradient."""
    return _sl_fwd(lp_b, lp_l, t_len, u_len)[0]


def _sl_fwd(lp_b, lp_l, t_len, u_len):
    from transformer_transducer_tpu.ops.rnnt_loss import _rnnt_bwd, _rnnt_fwd
    losses, res = _rnnt_fwd(lp_b, lp_l, t_len, u_len)
    # d grids for g = 1: exactly -occupancy
    d_b, d_l = _rnnt_bwd(res, jnp.ones_like(losses))[:2]
    occ = -(d_b + d_l)
    return (losses, occ), (d_b, d_l)


def _sl_bwd(saved, gs):
    d_b, d_l = saved
    g_loss, _ = gs          # the occ output is non-differentiable by design
    g = g_loss[:, None, None]
    return d_b * g, d_l * g, None, None


simple_loss_and_occ.defvjp(_sl_fwd, _sl_bwd)


def bounds_from_occ(occ: jax.Array, t_len: jax.Array, u_len: jax.Array,
                    s_range: int) -> jax.Array:
    """Band starts ``rs`` (B, T) int32 from occupancy posteriors.

    Guarantees (by construction): ``rs[:, 0] == 0``; ``0 <= rs[:, t+1] -
    rs[:, t] <= s_range - 1`` (a path can always continue into the next
    band); ``rs[:, t_len-1] + s_range > u_len`` (the terminal cell is in
    the final band, feasibility permitting); ``rs <= max(0, u_len -
    s_range + 1)``."""
    b, t, u1 = occ.shape
    u_idx = jnp.arange(u1, dtype=jnp.float32)
    tot = jnp.sum(occ, axis=-1)
    center = jnp.sum(occ * u_idx, axis=-1) / jnp.maximum(tot, 1e-6)
    u_hi = jnp.maximum(u_len - (s_range - 1), 0)          # (B,)
    raw = jnp.round(center - (s_range - 1) / 2.0).astype(jnp.int32)
    # per-row lower ramp: the minimum start at row t that can still climb
    # (at <= s_range-1 per step) to u_hi by row t_len-1.  Folding it into
    # the forward clip guarantees terminal coverage by induction — a
    # backward "raise" pass cannot (it can never lift the final row).
    rows_left = jnp.maximum((t_len - 1)[:, None] - jnp.arange(t)[None, :], 0)
    lo = jnp.maximum(u_hi[:, None] - rows_left * (s_range - 1), 0)
    raw = jnp.clip(jnp.maximum(raw, lo), 0, u_hi[:, None])

    def fwd(prev, r):
        cur = jnp.clip(r, prev, prev + s_range - 1)
        return cur, cur

    r0 = jnp.zeros((b,), jnp.int32)                       # rs[0] = 0
    _, rs_f = jax.lax.scan(fwd, r0, raw[:, 1:].swapaxes(0, 1))
    rs = jnp.concatenate([r0[None], rs_f], axis=0).swapaxes(0, 1)
    return jax.lax.stop_gradient(rs)


def pruned_bounds(lp_b: jax.Array, lp_l: jax.Array, t_len: jax.Array,
                  u_len: jax.Array, s_range: int) -> jax.Array:
    """Band starts straight from simple grids (tests/diagnostics; the
    training path reuses the occupancies from ``simple_loss_and_occ``)."""
    _, occ = simple_loss_and_occ(jax.lax.stop_gradient(lp_b),
                                 jax.lax.stop_gradient(lp_l), t_len, u_len)
    return bounds_from_occ(jax.lax.stop_gradient(occ), t_len, u_len,
                           s_range)


# ---------------------------------------------------------------------------
# Stage 3: banded joint grids + band DP
# ---------------------------------------------------------------------------

def banded_grid_logprobs(enc: jax.Array, dec: jax.Array, joint_params,
                         labels: jax.Array, rs: jax.Array, u_len: jax.Array,
                         s_range: int, blank: int = 0, chunk_size: int = 32,
                         compute_dtype=jnp.float32, remat: bool = True,
                         activation: str = "tanh"
                         ) -> Tuple[jax.Array, jax.Array]:
    """Blank/label log-prob grids on the band only (each (B, T, s_range)):
    cell (t, s) is lattice cell (t, rs[t] + s).  The REAL joint (with its
    activation), T-chunked under ``jax.checkpoint`` like
    ``fused_grid_logprobs``."""
    w_enc, w_dec, b1, w_out, b_out = joint_params
    cd = compute_dtype
    b, t, _ = enc.shape
    u1 = dec.shape[1]
    labels_pad = jnp.pad(labels, ((0, 0), (0, u1 - labels.shape[1])),
                         constant_values=blank)
    dec_proj = dec.astype(cd) @ w_dec.astype(cd) + b1     # (B, U1, inner)
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu}[activation]

    pad_t = (-t) % chunk_size
    enc_p = jnp.pad(enc, ((0, 0), (0, pad_t), (0, 0)))
    rs_p = jnp.pad(rs, ((0, 0), (0, pad_t)), mode="edge")
    n_chunks = (t + pad_t) // chunk_size
    enc_chunks = enc_p.reshape(b, n_chunks, chunk_size, -1).swapaxes(0, 1)
    rs_chunks = rs_p.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    def chunk_fn(xs):
        enc_chunk, rs_chunk = xs
        h_enc = enc_chunk.astype(cd) @ w_enc.astype(cd)   # (B, C, inner)
        uidx = rs_chunk[..., None] + jnp.arange(s_range)  # (B, C, S)
        uidx_c = jnp.minimum(uidx, u1 - 1)
        dec_band = jax.vmap(lambda dp, ui: dp[ui])(dec_proj, uidx_c)
        h = act(h_enc[:, :, None, :] + dec_band)          # (B, C, S, inner)
        logits = (h @ w_out.astype(cd) + b_out).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        lp_b = logits[..., blank] - lse
        lab_band = jax.vmap(lambda lp, ui: lp[ui])(labels_pad, uidx_c)
        lp_l = jnp.take_along_axis(
            logits, lab_band[..., None], axis=-1)[..., 0] - lse
        has_label = uidx < u_len[:, None, None]
        lp_l = jnp.where(has_label, lp_l, NEG)
        return lp_b, lp_l

    lp_b, lp_l = jax.lax.map(
        jax.checkpoint(chunk_fn) if remat else chunk_fn,
        (enc_chunks, rs_chunks))
    lp_b = lp_b.swapaxes(0, 1).reshape(b, t + pad_t, s_range)[:, :t]
    lp_l = lp_l.swapaxes(0, 1).reshape(b, t + pad_t, s_range)[:, :t]
    return lp_b, lp_l


def rnnt_loss_banded_grid(lp_b: jax.Array, lp_l: jax.Array, rs: jax.Array,
                          t_len: jax.Array, u_len: jax.Array) -> jax.Array:
    """Per-sequence NLL over the banded lattice.

    Cell (t, s) is (t, u = rs[t] + s); transitions are blank (t, u) ->
    (t+1, u) (a band-shift gather) and label (t, u) -> (t, u+1) (an
    in-row sweep, unrolled over the small s_range).  Paths leaving the
    corridor are dropped — that IS the pruning.  State is (B, s_range),
    so autodiff through the scan stores only tiny residuals."""
    lp_b = lp_b.astype(jnp.float32)
    lp_l = lp_l.astype(jnp.float32)
    b, t, s_range = lp_b.shape
    t_len = jnp.minimum(t_len, t)
    # row 0 (rs[:,0] == 0): only label emissions lead to (0, s)
    alpha0 = jnp.pad(jnp.cumsum(lp_l[:, 0, :-1], axis=-1),
                     ((0, 0), (1, 0)))
    s_idx = jnp.arange(s_range)

    def step(a_prev, xs):
        py_prev, pl_t, d = xs
        prev_total = a_prev + py_prev                     # out of row t-1
        idx = s_idx[None, :] + d[:, None]                 # source band slot
        ok = (idx >= 0) & (idx < s_range)   # d >= 0 from pruned_bounds;
        blank_in = jnp.where(               # guard anyway for custom rs
            ok, jnp.take_along_axis(prev_total,
                                    jnp.clip(idx, 0, s_range - 1), axis=1),
            NEG)
        a = blank_in
        for s in range(1, s_range):                       # in-row emissions
            a = a.at[:, s].set(
                _logaddexp(a[:, s], a[:, s - 1] + pl_t[:, s - 1]))
        return a, a

    xs = (lp_b[:, :-1].swapaxes(0, 1), lp_l[:, 1:].swapaxes(0, 1),
          (rs[:, 1:] - rs[:, :-1]).swapaxes(0, 1))
    _, rows = jax.lax.scan(step, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], rows], axis=0).swapaxes(0, 1)

    bi = jnp.arange(b)
    tf = jnp.maximum(t_len - 1, 0)
    # sf >= 0 always (rs <= u_hi <= u_len); sf > s_range-1 only when the
    # corridor cannot climb to u_len at all (u_len > (t_len-1)*(s_range-1)
    # + s_range - 1).  Clamp to the highest reachable label count — the
    # truncated-sequence NLL with LIVE gradients, mirroring the full
    # path's over-length policy (rnnt_loss.py:158-166) — instead of a
    # silent zero-gradient no-op for the row.
    sf = jnp.clip(u_len - rs[bi, tf], 0, s_range - 1)
    log_z = alphas[bi, tf, sf] + lp_b[bi, tf, sf]
    valid = t_len > 0
    return jnp.where(valid, -log_z, 0.0)


# ---------------------------------------------------------------------------
# Band DP via Pallas row sweeps (TPU path; rnnt_loss_banded_grid is the
# oracle and CPU fallback)
# ---------------------------------------------------------------------------

def _band_terminal(lp_b, rs, t_len, u_len):
    """(tf, sf, log_z-pieces) shared by fwd and the oracle: terminal row
    ``tf = t_len - 1`` and slot ``sf`` with the same over-length clamp as
    :func:`rnnt_loss_banded_grid`."""
    b, t, s_range = lp_b.shape
    bi = jnp.arange(b)
    tf = jnp.maximum(jnp.minimum(t_len, t) - 1, 0)
    sf = jnp.clip(u_len - rs[bi, tf], 0, s_range - 1)
    return bi, tf, sf


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def rnnt_loss_banded_pallas(lp_b: jax.Array, lp_l: jax.Array, rs: jax.Array,
                            t_len: jax.Array, u_len: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Per-sequence banded NLL, numerically equal to
    :func:`rnnt_loss_banded_grid`, with the DP as Pallas row sweeps and an
    analytic VJP (band occupancies from one beta sweep) instead of autodiff
    through a T-step scan.

    Precondition: band-start steps ``d_t = rs[:, t] - rs[:, t-1]`` must
    satisfy ``0 <= d_t <= s_range - 1`` (monotone starts, no full-band
    jumps) — guaranteed by :func:`bounds_from_occ`.  The kernel maps any
    out-of-range ``d`` to "no in-band source" (the row stays NEG), whereas
    :func:`rnnt_loss_banded_grid`'s guarded gather still sums the valid
    in-band sources for ``d < 0`` — direct callers with custom ``rs`` must
    respect the precondition or the two paths diverge."""
    return _blp_fwd(lp_b, lp_l, rs, t_len, u_len, interpret)[0]


def _blp_fwd(lp_b, lp_l, rs, t_len, u_len, interpret):
    from transformer_transducer_tpu.ops.pallas.band_kernel import (
        band_alpha_pallas)
    lp_b = lp_b.astype(jnp.float32)
    lp_l = lp_l.astype(jnp.float32)
    b, t, s_range = lp_b.shape
    t_len = jnp.minimum(t_len, t)
    d_alpha = jnp.pad(rs[:, 1:] - rs[:, :-1], ((0, 0), (1, 0)))
    alpha = band_alpha_pallas(lp_b, lp_l, d_alpha, s_range, interpret)
    bi, tf, sf = _band_terminal(lp_b, rs, t_len, u_len)
    log_z = alpha[bi, tf, sf] + lp_b[bi, tf, sf]
    valid = t_len > 0
    losses = jnp.where(valid, -log_z, 0.0)
    return losses, (lp_b, lp_l, rs, alpha, log_z, tf, sf, valid)


def _blp_bwd(interpret, res, g):
    from transformer_transducer_tpu.ops.pallas.band_kernel import (
        band_beta_pallas)
    lp_b, lp_l, rs, alpha, log_z, tf, sf, valid = res
    b, t, s_range = lp_b.shape
    d_steps = rs[:, 1:] - rs[:, :-1]                     # (B, T-1)
    d_beta = jnp.pad(d_steps, ((0, 0), (0, 1)))          # row t: d_{t+1}
    beta = band_beta_pallas(lp_b, lp_l, d_beta, tf, sf, s_range, interpret)
    # a NEG log_z (empty/infeasible lattice) must yield zero occupancies,
    # not exp(+1e30) = inf (0 * inf = NaN through the gm mask below); the
    # exponent clip also bounds float-error overshoot of exact-1 cells
    lz = jnp.where(log_z > NEG / 2, log_z, 0.0)[:, None, None]
    _occ = lambda x: jnp.exp(jnp.minimum(x - lz, 0.0))
    # label-edge occupancy: (t, s) -> (t, s+1)
    beta_s1 = jnp.pad(beta[:, :, 1:], ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG)
    occ_l = _occ(alpha + lp_l + beta_s1)
    # blank-edge occupancy: (t, s) -> (t+1, s - d_{t+1}); the terminal
    # cell's blank leaves the lattice (continuation log-prob 0)
    s_idx = jnp.arange(s_range)
    src = s_idx[None, None, :] - d_steps[:, :, None]     # (B, T-1, S)
    ok = (src >= 0) & (src < s_range)
    gathered = jnp.take_along_axis(beta[:, 1:],
                                   jnp.clip(src, 0, s_range - 1), axis=2)
    bo = jnp.concatenate(
        [jnp.where(ok, gathered, NEG),
         jnp.full((b, 1, s_range), NEG, jnp.float32)], axis=1)
    term = ((jnp.arange(t)[None, :, None] == tf[:, None, None]) &
            (s_idx[None, None, :] == sf[:, None, None]))
    bo = jnp.where(term, 0.0, bo)
    occ_b = _occ(alpha + lp_b + bo)
    gm = jnp.where(valid, -g, 0.0)[:, None, None]
    return gm * occ_b, gm * occ_l, None, None, None


rnnt_loss_banded_pallas.defvjp(_blp_fwd, _blp_bwd)


# ---------------------------------------------------------------------------
# End-to-end pruned loss
# ---------------------------------------------------------------------------

def rnnt_loss_pruned(enc: jax.Array, dec: jax.Array, joint_params,
                     labels: jax.Array, t_len: jax.Array, u_len: jax.Array,
                     *, s_range: int = 5, blank: int = 0,
                     chunk_size: int = 32, reduction: str = "mean",
                     compute_dtype=jnp.float32, remat: bool = True,
                     activation: str = "tanh",
                     simple_scale: float = 0.0) -> jax.Array:
    """Training loss with the joint evaluated only on the pruned band.

    ``simple_scale > 0`` adds that multiple of the linearized-joint NLL
    (k2 trains its trivial joiner the same way; here the linearization
    shares the full joint's weights, so the term doubles as a regularizer
    keeping the corridor estimate aligned).
    """
    t_len = jnp.minimum(t_len, enc.shape[1])
    u_len = jnp.minimum(u_len, dec.shape[1] - 1)
    sp_b, sp_l = simple_grid_logprobs(enc, dec, joint_params, labels,
                                      blank, compute_dtype)
    if not simple_scale:
        # bounds are the grids' only consumer: keep the whole simple
        # pipeline out of the backward pass
        sp_b = jax.lax.stop_gradient(sp_b)
        sp_l = jax.lax.stop_gradient(sp_l)
    simple_losses, occ = simple_loss_and_occ(sp_b, sp_l, t_len, u_len)
    rs = bounds_from_occ(jax.lax.stop_gradient(occ), t_len, u_len, s_range)
    lp_b, lp_l = banded_grid_logprobs(enc, dec, joint_params, labels, rs,
                                      u_len, s_range, blank, chunk_size,
                                      compute_dtype, remat, activation)
    if _use_pallas():
        losses = rnnt_loss_banded_pallas(lp_b, lp_l, rs, t_len, u_len)
    else:
        losses = rnnt_loss_banded_grid(lp_b, lp_l, rs, t_len, u_len)
    if simple_scale:
        losses = losses + simple_scale * simple_losses
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
