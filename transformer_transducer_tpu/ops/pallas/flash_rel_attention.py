"""Pallas TPU kernel: full (unmasked) rel-position attention, fwd + bwd.

The native family trains its encoder with NO attention mask
(reference ``tt/model.py:61``), so XLA materializes four (B, H, T, T) score
tensors per layer per direction — the encoder's HBM bottleneck.  This kernel
computes attention per 128-row query block with scores living only in VMEM,
with a custom VJP that rematerializes them blockwise (flash-attention
structure), including gradients for the learnable position tables.

Score semantics are the reference's exactly (see
``ops/pallas/banded_attention.py`` for the derivation):

    o = j - i <= 0 :  q_i . re[T-1+o]  +  rb[T-1+o]
    o = 1          :  0
    o >= 2         :  q_{i+1} . re[o-2] + rb[o-2]

Everything is computed in a TRANSPOSED orientation — scores as (T, TQ),
keys on sublanes — so the diagonal alignment of the BD term is a
lane-conditioned sublane roll plus one dynamic sublane roll (both
Mosaic-native); no gathers, no reshapes.

``r_bias`` rides the table matmuls as an augmented feature column
(q gains a ones column), so its gradient falls out of ``d_re_aug``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
TQ = 128  # 256 fails Mosaic alignment on the unaligned dq boundary store;
          # at T=410 the kernel is ~par with XLA dense anyway (README table)


def _roll_rows_by_lane(x: jax.Array, sign: int) -> jax.Array:
    """Circular roll of each lane's column down by ``sign * lane_index``
    (sublane axis), in log2(TQ) conditional rolls.  x: (R, TQ)."""
    r = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for bit in range(TQ.bit_length() - 1):
        amt = 1 << bit
        shift = amt if sign > 0 else (r - amt % r) % r
        rolled = pltpu.roll(x, shift, axis=0)
        x = jnp.where((lane & amt) != 0, rolled, x)
    return x


def _dyn_roll_rows(x: jax.Array, shift, scratch) -> jax.Array:
    """Circular roll down by a traced ``shift`` on the sublane axis, via a
    duplicated scratch write + dynamic slice (dynamic pltpu.roll shifts are
    not universally supported)."""
    r = x.shape[0]
    scratch[pl.ds(0, r), :] = x
    scratch[pl.ds(r, r), :] = x
    start = (r - shift % r) % r
    return scratch[pl.ds(start, r), :]


def _scores_T(q, q_next, k, re, u, qs, t_true, shift, t_pad,
              roll_scratch_a, roll_scratch_b):
    """Transposed scores (T_pad, TQ) + prob pieces for one query block.
    Matmul operands stay in the input dtype (bf16-capable), f32 accumulation."""
    ones = jnp.ones((TQ, 1), q.dtype)
    q_aug = jnp.concatenate([q, ones], axis=1)
    qn_aug = jnp.concatenate([q_next, ones], axis=1)

    ac_t = jax.lax.dot_general(k, q + u, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (Tp, TQ)
    p_past = jax.lax.dot_general(re, q_aug, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    p_wrap = jax.lax.dot_general(re, qn_aug, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    # past: BD_T[j, i] = p_past[r0 + (j - i)], r0 = t_pad-1-qs (tables are
    # rolled so padded row t_pad-1 holds true row t-1)
    r0 = t_pad - 1 - qs
    past = _roll_rows_by_lane(_dyn_roll_rows(p_past, -r0, roll_scratch_a), +1)
    # wrap: BD_T[j, i] = p_wrap[shift + (j - qs - i - 2)]
    wrap = _roll_rows_by_lane(
        _dyn_roll_rows(p_wrap, qs + 2 - shift, roll_scratch_b), +1)

    row = jax.lax.broadcasted_iota(jnp.int32, (t_pad, TQ), 0)   # j
    lane = jax.lax.broadcasted_iota(jnp.int32, (t_pad, TQ), 1)  # i
    o = row - (qs + lane)
    bd = jnp.where(o <= 0, past, jnp.where(o == 1, 0.0, wrap))

    dh = q.shape[1]
    scores = (ac_t + bd) / np.sqrt(dh)
    valid = row < t_true
    scores = jnp.where(valid, scores, NEG)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    probs = e / s                                                # (Tp, TQ)
    return probs, o, valid


def _load_common(q_ref, k_ref, v_ref, re_ref, u_ref, scal):
    qs = pl.program_id(2) * TQ
    t_pad = q_ref.shape[2]
    q = q_ref[0, 0, pl.ds(qs, TQ), :]
    # boundary row for q_next: first row of the next block, read from an
    # aligned block start (the clamped last-block value is always masked)
    nxt = pl.multiple_of(jnp.minimum(qs + TQ, t_pad - TQ), TQ)
    q_extra = q_ref[0, 0, pl.ds(nxt, TQ), :][0:1]
    q_next = jnp.concatenate([q[1:], q_extra], axis=0)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    re = re_ref[0]
    u = u_ref[0]
    t_true, shift = scal[0], scal[1]
    return qs, t_pad, q, q_next, k, v, re, u, t_true, shift


def _fwd_kernel(scal_ref, q_ref, k_ref, v_ref, re_ref, u_ref, o_ref,
                ra, rb_):
    qs, t_pad, q, q_next, k, v, re, u, t_true, shift = _load_common(
        q_ref, k_ref, v_ref, re_ref, u_ref, scal_ref)
    probs, _, _ = _scores_T(q, q_next, k, re, u, qs, t_true, shift, t_pad,
                            ra, rb_)
    out = jax.lax.dot_general(probs.astype(v.dtype), v,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (TQ, Dh)
    o_ref[0, 0] = out


def _bwd_kernel(scal_ref, q_ref, k_ref, v_ref, re_ref, u_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dre_ref, du_ref, ra, rb_):
    b_idx = pl.program_id(1)
    qb = pl.program_id(2)
    qs, t_pad, q, q_next, k, v, re, u, t_true, shift = _load_common(
        q_ref, k_ref, v_ref, re_ref, u_ref, scal_ref)
    probs, o, valid = _scores_T(q, q_next, k, re, u, qs, t_true, shift,
                                t_pad, ra, rb_)
    do = do_ref[0, 0, pl.ds(qs, TQ), :]                         # (TQ, Dh)

    @pl.when(qb == 0)
    def _init_bh():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    @pl.when((b_idx == 0) & (qb == 0))
    def _init_h():
        dre_ref[0] = jnp.zeros_like(dre_ref[0])
        du_ref[0] = jnp.zeros_like(du_ref[0])

    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (Tp, TQ)
    # flash identity: D_i = sum_j p[j,i] dp[j,i] (= sum_d out*do), computed
    # lane-oriented via a ones-row matmul (no (TQ,1)->(1,TQ) transpose)
    ones_row = jnp.ones((1, dp_t.shape[0]), jnp.float32)
    d_row = jax.lax.dot_general(ones_row, probs * dp_t,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, TQ)
    dh = q.shape[1]
    ds_t = probs * (dp_t - d_row) / np.sqrt(dh)
    ds_t = jnp.where(valid, ds_t, 0.0)
    ds_mm = ds_t.astype(q.dtype)        # matmul-operand copy
    probs_mm = probs.astype(q.dtype)

    # value / key / content-query grads
    dv_ref[0, 0] += jax.lax.dot_general(
        probs_mm, do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds_mm, q + u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ac = jax.lax.dot_general(ds_mm, k, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (TQ, Dh)
    du_ref[0] += jnp.sum(dq_ac, axis=0, keepdims=True)

    # BD-path grads: un-roll the scatter (exact inverse of the fwd rolls)
    r0 = t_pad - 1 - qs
    ds_past = jnp.where(o <= 0, ds_t, 0.0)
    ds_wrap = jnp.where(o >= 2, ds_t, 0.0)
    dp_past = _dyn_roll_rows(_roll_rows_by_lane(ds_past, -1), r0, ra) \
        .astype(q.dtype)
    dp_wrap = _dyn_roll_rows(_roll_rows_by_lane(ds_wrap, -1),
                             shift - (qs + 2), rb_).astype(q.dtype)

    ones = jnp.ones((TQ, 1), q.dtype)
    q_aug = jnp.concatenate([q, ones], axis=1)
    qn_aug = jnp.concatenate([q_next, ones], axis=1)
    dre_ref[0] += (
        jax.lax.dot_general(dp_past, q_aug, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(dp_wrap, qn_aug, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    dq_aug_past = jax.lax.dot_general(dp_past, re, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dqn_aug = jax.lax.dot_general(dp_wrap, re, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dq_block = dq_ac + dq_aug_past[:, :dh]
    dq_ref[0, 0, pl.ds(qs, TQ), :] += dq_block
    # q_next rows are q rows shifted by one (the padded dq buffer absorbs
    # the final block's boundary row)
    dq_ref[0, 0, pl.ds(qs + 1, TQ), :] += dqn_aug[:, :dh]


def _specs(h, b, t_pad, dh, aug):
    return dict(
        q=pl.BlockSpec((1, 1, t_pad, dh), lambda i, j, n: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
        re=pl.BlockSpec((1, t_pad, aug), lambda i, j, n: (i, 0, 0),
                        memory_space=pltpu.VMEM),
        u=pl.BlockSpec((1, 1, dh), lambda i, j, n: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        oblock=pl.BlockSpec((1, 1, TQ, dh), lambda i, j, n: (i, j, n, 0),
                            memory_space=pltpu.VMEM),
        full=pl.BlockSpec((1, 1, t_pad, dh), lambda i, j, n: (i, j, 0, 0),
                          memory_space=pltpu.VMEM),
    )


def _prep(q, k, v, r_emb, r_w_bias, r_bias):
    b, t, h, dh = q.shape
    t_pad = -(-t // TQ) * TQ
    dt = q.dtype

    def fold(x):
        x = jnp.pad(x.astype(dt), ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        return x.transpose(2, 0, 1, 3)                        # (H, B, Tp, Dh)

    qf, kf, vf = fold(q), fold(k), fold(v)
    re_aug = jnp.concatenate([r_emb, r_bias[:, :, None]], axis=-1)
    re = jnp.pad(re_aug.astype(dt), ((0, t_pad - t), (0, 0), (0, 0))) \
        .transpose(1, 0, 2)                                   # (H, Tp, Dh+1)
    shift = t_pad - t
    re = jnp.roll(re, shift, axis=1)
    u = r_w_bias.astype(dt)[:, None, :]                       # (H, 1, Dh)
    scal = jnp.asarray([t, shift], jnp.int32)
    return qf, kf, vf, re, u, scal, t_pad


def _fwd_impl(q, k, v, r_emb, r_w_bias, r_bias, interpret):
    b, t, h, dh = q.shape
    qf, kf, vf, re, u, scal, t_pad = _prep(q, k, v, r_emb, r_w_bias, r_bias)
    sp = _specs(h, b, t_pad, dh, re.shape[-1])
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((h, b, t_pad, dh), jnp.float32),
        grid=(h, b, t_pad // TQ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sp["q"], sp["q"], sp["q"], sp["re"], sp["u"]],
        out_specs=sp["oblock"],
        scratch_shapes=[pltpu.VMEM((2 * t_pad, TQ), jnp.float32),
                        pltpu.VMEM((2 * t_pad, TQ), jnp.float32)],
        interpret=interpret,
    )(scal, qf, kf, vf, re, u)
    return out.transpose(1, 2, 0, 3)[:, :t]                   # (B, T, H, Dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def flash_rel_attention(q, k, v, r_emb, r_w_bias, r_bias,
                        interpret: bool = False):
    """Full-attention rel-position MHA (pre out-projection).

    Args: q/k/v (B, T, H, Dh); tables sliced to klen == T rows
    (``models.attention._slice_pos_table``).  Returns (B, T, H, Dh).
    """
    return _fwd_impl(q, k, v, r_emb, r_w_bias, r_bias, interpret)


def _vjp_fwd(q, k, v, r_emb, r_w_bias, r_bias, interpret):
    out = _fwd_impl(q, k, v, r_emb, r_w_bias, r_bias, interpret)
    return out, (q, k, v, r_emb, r_w_bias, r_bias)


def _vjp_bwd(interpret, res, g):
    q, k, v, r_emb, r_w_bias, r_bias = res
    b, t, h, dh = q.shape
    qf, kf, vf, re, u, scal, t_pad = _prep(q, k, v, r_emb, r_w_bias, r_bias)
    gf = jnp.pad(g.astype(q.dtype), ((0, 0), (0, t_pad - t), (0, 0), (0, 0))) \
        .transpose(2, 0, 1, 3)
    aug = re.shape[-1]
    sp = _specs(h, b, t_pad, dh, aug)
    dq_spec = pl.BlockSpec((1, 1, t_pad + TQ, dh), lambda i, j, n: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv, dre, du = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, b, t_pad + TQ, dh), jnp.float32),
            jax.ShapeDtypeStruct((h, b, t_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((h, b, t_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((h, t_pad, aug), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, dh), jnp.float32),
        ),
        grid=(h, b, t_pad // TQ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sp["q"], sp["q"], sp["q"], sp["re"], sp["u"], sp["q"]],
        out_specs=(dq_spec, sp["full"], sp["full"], sp["re"], sp["u"]),
        scratch_shapes=[pltpu.VMEM((2 * t_pad, TQ), jnp.float32),
                        pltpu.VMEM((2 * t_pad, TQ), jnp.float32)],
        interpret=interpret,
    )(scal, qf, kf, vf, re, u, gf)

    shift = t_pad - t
    dq = dq.transpose(1, 2, 0, 3)[:, :t]
    dk = dk.transpose(1, 2, 0, 3)[:, :t]
    dv = dv.transpose(1, 2, 0, 3)[:, :t]
    dre = jnp.roll(dre, -shift, axis=1).transpose(1, 0, 2)[:t]  # (T, H, aug)
    d_r_emb = dre[..., :dh]
    d_r_bias = dre[..., dh]
    d_u = du[:, 0, :]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            d_r_emb.astype(r_emb.dtype), d_u.astype(r_w_bias.dtype),
            d_r_bias.astype(r_bias.dtype))


flash_rel_attention.defvjp(_vjp_fwd, _vjp_bwd)
