"""Transformer-XL style relative-position attention (XLA dense path).

Parity surface (reference ``tt/transformer.py``):

* ``RelLearnableMultiHeadAttn`` (:102-177): fused bias-free QKV projection,
  score = AC + rel_shift(B + D) with learnable per-layer tables
  ``r_emb[k_len,h,d]`` / ``r_w_bias[h,d]`` / ``r_bias[k_len,h]``, additive
  -inf masking, post-LN residual.
* ``_rel_shift`` (:82-95): the pad-one-column-and-reshape trick.  NOTE: the
  reference trains the non-streaming model with **no** attention mask, so the
  trick's wrap-around values at ``j > i`` (which a causal mask would normally
  hide) are part of the trained function.  We therefore reproduce the exact
  pad/reshape construction rather than a gather with different out-of-band
  behaviour.
* ``PositionwiseFF`` (:36-58): a single LayerNorm instance applied **twice**
  (pre-activation and on the residual sum) — shared scale/bias, reproduced by
  calling one flax module twice.
* ``RelLearnableDecoderLayer`` (:181-197): attention -> FFN -> dropout.

Layout: batch-major ``(B, T, D)`` (the reference is time-major for torch; on
TPU batch-major keeps the attention einsums MXU-shaped).  Scores are
``(B, H, q, k)``; the rel-shift operates on the trailing two dims, which is
flat-order equivalent to the reference's leading-dims construction.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer_transducer_tpu.ops.quant import make_dense

NEG_INF = float(jnp.finfo(jnp.float32).min)


def rel_shift(x: jax.Array) -> jax.Array:
    """Transformer-XL relative shift on the trailing two dims ``(..., q, k)``.

    Exactly reproduces the reference pad/reshape trick (``tt/transformer.py:
    82-95``): result[..., i, j] = x[..., i, j - i - 1 (mod rules)] including
    the cross-row wrap-around for j > i.
    """
    *lead, q, k = x.shape
    pad = [(0, 0)] * len(lead) + [(0, 0), (1, 0)]
    x_padded = jnp.pad(x, pad)                       # (..., q, k+1)
    x_padded = x_padded.reshape(*lead, k + 1, q)     # flat-order reinterpret
    return x_padded[..., 1:, :].reshape(*lead, q, k)


def _slice_pos_table(table: jax.Array, klen: int) -> jax.Array:
    """Take the last ``klen`` rows; if ``klen`` exceeds the table, front-pad
    by repeating row 0 (reference ``tt/transformer.py:128-135``)."""
    k_len = table.shape[0]
    if klen > k_len:
        pad = jnp.broadcast_to(table[0:1], (klen - k_len,) + table.shape[1:])
        return jnp.concatenate([pad, table], axis=0)
    return table[k_len - klen:]


class RelLearnableSelfAttention(nn.Module):
    """Multi-head self-attention with learnable relative-position tables.

    The position tables are passed in by the owning layer (they live at the
    layer level in the reference: ``tt/encoder.py:18-20``).
    """

    n_head: int
    d_model: int
    d_head: int
    dropout: float = 0.0
    dropatt: float = 0.0
    flash: bool = False   # unmasked attention via the flash Pallas kernel
    quant: bool = False   # int8 projections (inference; see ops/quant.py)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, r_emb: jax.Array, r_w_bias: jax.Array,
                 r_bias: jax.Array, attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 band: Optional[tuple] = None) -> jax.Array:
        b, qlen, _ = x.shape
        h, dh = self.n_head, self.d_head
        xc = x.astype(self.compute_dtype)

        qkv = make_dense(self.quant, 3 * h * dh, use_bias=False, name="qkv",
                         dtype=self.compute_dtype)(xc)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        klen = qlen
        q = q.reshape(b, qlen, h, dh)
        k = k.reshape(b, klen, h, dh)
        v = v.reshape(b, klen, h, dh)

        r_emb = _slice_pos_table(r_emb, klen).astype(self.compute_dtype)
        r_bias = _slice_pos_table(r_bias, klen).astype(self.compute_dtype)

        def tail(vec):
            """Shared out-projection -> dropout -> residual LayerNorm
            (identical for every score-computation branch)."""
            vec = vec.reshape(b, qlen, h * dh).astype(self.compute_dtype)
            out = make_dense(self.quant, self.d_model, use_bias=False,
                             name="out", dtype=self.compute_dtype)(vec)
            out = nn.Dropout(self.dropout, name="drop")(
                out, deterministic=deterministic)
            return nn.LayerNorm(epsilon=1e-5, name="ln")(
                (x + out).astype(jnp.float32))

        if band is None and attn_mask is None and self.flash:
            # full-attention flash kernel (custom VJP, no (B,H,T,T) in HBM);
            # exact reference score semantics — see
            # ops/pallas/flash_rel_attention.py
            from transformer_transducer_tpu.ops.pallas.flash_rel_attention import (
                flash_rel_attention)
            cd = self.compute_dtype
            return tail(flash_rel_attention(
                q.astype(cd), k.astype(cd), v.astype(cd), r_emb.astype(cd),
                r_w_bias.astype(cd), r_bias.astype(cd),
                jax.default_backend() != "tpu"))

        if band is not None:
            # Pallas banded kernel: O(T*window) scores instead of O(T^2);
            # numerics match the dense path (same score formula incl. the
            # rel-shift wrap) — see ops/pallas/banded_attention.py.
            from transformer_transducer_tpu.ops.pallas.banded_attention import (
                banded_attention)
            return tail(banded_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), r_emb.astype(jnp.float32),
                r_w_bias.astype(jnp.float32), r_bias.astype(jnp.float32),
                int(band[0]), int(band[1]),
                interpret=jax.default_backend() != "tpu"))

        rw_q = q + r_w_bias.astype(self.compute_dtype)[None, None]
        # content score (AC) and position score (BD), both (B, H, q, k)
        ac = jnp.einsum("bind,bjnd->bnij", rw_q, k)
        b_ = jnp.einsum("bind,jnd->bnij", q, r_emb)
        d_ = r_bias.T[None, :, None, :]                  # (1, H, 1, k)
        bd = rel_shift(b_ + d_)

        scale = 1.0 / (dh ** 0.5)
        score = (ac + bd) * scale
        if attn_mask is not None:
            # mask: (q, k) or (B, q, k), True == masked
            if attn_mask.ndim == 2:
                mask = attn_mask[None, None]
            else:
                mask = attn_mask[:, None]
            score = jnp.where(mask, jnp.asarray(NEG_INF, score.dtype), score)

        # f32 softmax (measured faster than bf16 on v5e — XLA's bf16 softmax
        # upcasts internally anyway) and numerically matches the reference
        prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.compute_dtype)
        prob = nn.Dropout(self.dropatt, name="dropatt")(prob, deterministic=deterministic)

        return tail(jnp.einsum("bnij,bjnd->bind", prob, v))


class PositionwiseFF(nn.Module):
    """FFN with a *shared* LayerNorm applied pre-activation and post-residual
    (single parameter set used twice, as in ``tt/transformer.py:36-58``)."""

    d_model: int
    d_inner: int
    dropout: float = 0.0
    quant: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        ln = nn.LayerNorm(epsilon=1e-5, name="ln")
        h = ln(x).astype(self.compute_dtype)
        h = make_dense(self.quant, self.d_inner, name="fc1",
                       dtype=self.compute_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, name="drop1")(h, deterministic=deterministic)
        h = make_dense(self.quant, self.d_model, name="fc2",
                       dtype=self.compute_dtype)(h)
        h = nn.Dropout(self.dropout, name="drop2")(h, deterministic=deterministic)
        return ln(x + h.astype(jnp.float32))


class TransformerXLLayer(nn.Module):
    """One encoder/label-encoder layer: rel-attention -> FFN -> dropout.

    Owns the per-layer learnable position tables (``k_len`` rows), matching
    the reference layer wrappers (``tt/encoder.py:7-29``/``tt/decoder.py:6-20``).
    """

    k_len: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    dropout: float = 0.0
    flash: bool = False
    quant: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 band: Optional[tuple] = None) -> jax.Array:
        r_emb = self.param("r_emb", nn.initializers.normal(1.0),
                           (self.k_len, self.n_head, self.d_head), jnp.float32)
        r_w_bias = self.param("r_w_bias", nn.initializers.normal(1.0),
                              (self.n_head, self.d_head), jnp.float32)
        r_bias = self.param("r_bias", nn.initializers.normal(1.0),
                            (self.k_len, self.n_head), jnp.float32)
        x = RelLearnableSelfAttention(
            n_head=self.n_head, d_model=self.d_model, d_head=self.d_head,
            dropout=self.dropout, flash=self.flash, quant=self.quant,
            compute_dtype=self.compute_dtype,
            name="attn")(x, r_emb, r_w_bias, r_bias, attn_mask, deterministic,
                         band=band)
        x = PositionwiseFF(
            d_model=self.d_model, d_inner=self.d_inner, dropout=self.dropout,
            quant=self.quant, compute_dtype=self.compute_dtype,
            name="ff")(x, deterministic)
        x = nn.Dropout(self.dropout, name="drop")(x, deterministic=deterministic)
        return x
