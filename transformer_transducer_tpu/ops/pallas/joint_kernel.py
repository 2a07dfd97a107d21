"""Pallas TPU kernel: fused joint network + log-softmax grid extraction.

Computes the RNN-T per-cell blank/label log-probs straight from encoder and
label-encoder states:

    h(t,u)   = tanh(enc_t @ W_e + dec_u @ W_d + b)        (never stored)
    logit    = h @ W_o + b_o                               (never stored)
    lp_b/lp_l = {blank, label_u} logit - logsumexp_V(logit)

in ONE pass: the vocab axis is tiled on the innermost grid dimension with an
online (flash-style) max/sum, so neither the (B,T,U,V) logits nor the
(B,T,U,J) activations ever reach HBM.  The XLA path
(``ops.rnnt_loss.fused_grid_logprobs``) does the same job with chunked
rematerialization and is the gradient path + test oracle; this kernel is the
fast inference/eval forward.

Layout: grid (B, T-tiles, V-tiles); the tanh activations for a (batch,
T-tile) live in VMEM scratch as (TT*U1p, J) rows and persist across the
sequential V steps; outputs are written (flattened (t,u) rows) when the last
V tile finishes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
TT = 16       # frames per block
VT = 512      # vocab tile
U1P = 8       # pad U+1 to a multiple of this


def _make_kernel(activation: str):
    act = {"tanh": jnp.tanh, "relu": lambda x: jnp.maximum(x, 0.0)}[activation]

    def _kernel(enc_ref, decp_ref, we_ref, wo_ref, bo_ref, labels_ref,
                    lpb_ref, lpl_ref, h_scr, m_scr, s_scr, lbl_scr, blk_scr):
        k = pl.program_id(2)
        nk = pl.num_programs(2)
        u1p = decp_ref.shape[1]
        n = TT * u1p

        @pl.when(k == 0)
        def _init():
            he = jnp.dot(enc_ref[0], we_ref[:],
                         preferred_element_type=jnp.float32)       # (TT, J)
            decp = decp_ref[0]                                     # (U1p, J)
            for ti in range(TT):
                h_scr[pl.ds(ti * u1p, u1p), :] = act(
                    he[ti:ti + 1, :] + decp).astype(h_scr.dtype)
            m_scr[:] = jnp.full((n, 1), NEG, jnp.float32)
            s_scr[:] = jnp.zeros((n, 1), jnp.float32)
            lbl_scr[:] = jnp.zeros((n, 1), jnp.float32)
            blk_scr[:] = jnp.zeros((n, 1), jnp.float32)

        logits = jnp.dot(h_scr[:], wo_ref[:],
                         preferred_element_type=jnp.float32) + bo_ref[0]  # (N, VT)
        # (bf16 operands, f32 accumulation — the MXU's native fast path)

        # online logsumexp
        row_max = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_scr[:], row_max)
        s_scr[:] = (s_scr[:] * jnp.exp(m_scr[:] - m_new)
                    + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
        m_scr[:] = m_new

        # gathered entries: blank column (global id 0 -> tile 0, lane 0) and the
        # per-row label id via a compare-select reduction
        @pl.when(k == 0)
        def _blank():
            blk_scr[:] = logits[:, 0:1]

        v_start = k * VT
        col = jax.lax.broadcasted_iota(jnp.int32, (n, VT), 1) + v_start
        sel = (col == labels_ref[0])                                # (N, VT)
        lbl_scr[:] = lbl_scr[:] + jnp.sum(jnp.where(sel, logits, 0.0),
                                          axis=1, keepdims=True)

        @pl.when(k == nk - 1)
        def _emit():
            lse = m_scr[:] + jnp.log(s_scr[:])
            lpb_ref[0] = blk_scr[:] - lse
            lpl_ref[0] = lbl_scr[:] - lse


    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("blank", "interpret", "compute_dtype",
                                    "activation"))
def fused_grid_logprobs_pallas(enc: jax.Array, dec: jax.Array, joint_params,
                               labels: jax.Array, blank: int = 0,
                               interpret: bool = False,
                               compute_dtype=jnp.float32,
                               activation: str = "tanh"
                               ) -> Tuple[jax.Array, jax.Array]:
    """Blank/label log-prob grids (each (B, T, U+1)) — forward only.

    Same contract as ``ops.rnnt_loss.fused_grid_logprobs`` (the oracle).
    ``blank`` must be 0 (framework-wide convention).
    """
    assert blank == 0
    w_enc, w_dec, b1, w_out, b_out = [x.astype(jnp.float32) for x in joint_params]
    mm_dtype = compute_dtype  # matmul operand dtype (f32 accumulation)
    b, t, d = enc.shape
    u1 = dec.shape[1]
    j = w_enc.shape[1]
    v = w_out.shape[1]

    t_pad = -(-t // TT) * TT
    u1p = -(-u1 // U1P) * U1P
    v_pad = -(-v // VT) * VT
    n = TT * u1p

    enc_p = jnp.pad(enc.astype(mm_dtype), ((0, 0), (0, t_pad - t), (0, 0)))
    dec_proj = dec.astype(jnp.float32) @ w_dec + b1                # (B, U1, J)
    dec_proj = jnp.pad(dec_proj, ((0, 0), (0, u1p - u1), (0, 0)))
    w_out_p = jnp.pad(w_out, ((0, 0), (0, v_pad - v))).astype(mm_dtype)
    # padded vocab lanes must vanish from the logsumexp
    b_out_p = jnp.pad(b_out, (0, v_pad - v), constant_values=NEG)[None, :]

    labels_p = jnp.pad(labels.astype(jnp.int32),
                       ((0, 0), (0, u1p - labels.shape[1])))
    labels_rep = jnp.tile(labels_p, (1, TT))[:, :, None]           # (B, N, 1)

    grid = (b, t_pad // TT, v_pad // VT)
    lpb, lpl = pl.pallas_call(
        _make_kernel(activation),
        out_shape=(jax.ShapeDtypeStruct((b, t_pad // TT * n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((b, t_pad // TT * n, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TT, d), lambda ib, it, k: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, j), lambda ib, it, k: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, j), lambda ib, it, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, VT), lambda ib, it, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VT), lambda ib, it, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda ib, it, k: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 1), lambda ib, it, k: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda ib, it, k: (ib, it, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, j), compute_dtype),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(enc_p, dec_proj.astype(jnp.float32), w_enc.astype(mm_dtype), w_out_p,
      b_out_p, labels_rep)

    lpb = lpb.reshape(b, t_pad, u1p)[:, :t, :u1]
    lpl = lpl.reshape(b, t_pad, u1p)[:, :t, :u1]
    return lpb, lpl
