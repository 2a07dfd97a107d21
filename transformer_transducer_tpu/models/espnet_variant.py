"""The ESPnet-variant Transformer-Transducer model family.

Parity surface: the reference's second model family (``tt_espnet/model.py``
driven by ``train_esptt.py`` / ``config/espnet_aishell.yaml``), built from the
author-modified ESPnet pieces:

* ``RelPositionalEncoding`` — sinusoidal ± relative positions, input scaled
  by sqrt(d_model) (``espnet/.../transformer/embedding.py:218-243``);
* ``RelPositionMultiHeadedAttention`` — per-projection biased q/k/v/out
  linears, bias-free ``linear_pos``, learnable ``pos_bias_u``/``pos_bias_v``,
  signed rel-shift (``espnet/.../transformer/attention.py:212-284``).  Unlike
  the native family's learnable-table attention, this rel-shift is exact for
  all offsets |i-j| < T — no wrap artifact, fully length-shift-invariant;
* pre-LN ``EncoderLayer`` with final ``after_norm``
  (``espnet/.../transformer/encoder_layer.py``, author changes :15-18,78-82);
* ``TransformerEncoder`` with input layers (none / embed / linear) and the
  combined pad ∧ band mask (``espnet2/asr/encoder/transformer_encoder.py:
  206-210``, band mask ``nets_utils.py:268-281``);
* additive ``JointNetwork`` — ``lin_out(act(lin_enc(enc) + lin_dec(dec)))``
  with bias-free ``lin_dec`` (``espnet/.../transducer/joint_network.py``);
* ``TransformerTransducer`` — sos = eos = vocab-1 text prefix, encoder band
  left=10/right=2, text band left=2/right=0, loss inside the model
  (``tt_espnet/model.py:18-81``).

Mask convention here matches the rest of this framework (True == masked);
the espnet convention (True == keep) is inverted at the torch boundary in
``utils/torch_convert.py`` tests.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.models.attention import rel_shift
from transformer_transducer_tpu.ops.masks import combine_masks, context_mask, padding_mask
from transformer_transducer_tpu.ops.quant import make_dense

NEG_INF = float(np.finfo(np.float32).min)


def rel_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """(2L-1, d) signed relative encodings; row j encodes rel = L-1-j."""
    rel = (length - 1) - np.arange(2 * length - 1)
    inv = np.exp(np.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    ang = rel[:, None] * inv[None, :]
    pe = np.zeros((2 * length - 1, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _rel_shift_signed(x: jax.Array) -> jax.Array:
    """(..., t, 2t-1) -> (..., t, t): out[i, j] = x[i, t-1 + j - i].

    The same flat-order pad/reshape trick as ``models.attention.rel_shift``
    (one shared implementation of the sharp-edged construction), truncated
    to the first t columns of the signed 2t-1-wide table."""
    return rel_shift(x)[..., :x.shape[-2]]


class RelPosMultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    dropout: float = 0.0
    quant: bool = False   # int8 projections (inference; see ops/quant.py)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pos_emb: jax.Array,
                 attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        b, t, _ = x.shape
        h = self.n_head
        dk = self.d_model // h
        cd = self.compute_dtype
        xc = x.astype(cd)
        q = make_dense(self.quant, self.d_model, name="linear_q",
                       dtype=cd)(xc).reshape(b, t, h, dk)
        k = make_dense(self.quant, self.d_model, name="linear_k",
                       dtype=cd)(xc).reshape(b, t, h, dk)
        v = make_dense(self.quant, self.d_model, name="linear_v",
                       dtype=cd)(xc).reshape(b, t, h, dk)
        p = make_dense(self.quant, self.d_model, use_bias=False,
                       name="linear_pos",
                       dtype=cd)(pos_emb.astype(cd)).reshape(-1, h, dk)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        ac = jnp.einsum("bind,bjnd->bnij", q + u.astype(cd), k)
        bd = jnp.einsum("bind,jnd->bnij", q + w.astype(cd), p)   # (B,H,t,2t-1)
        bd = _rel_shift_signed(bd)
        scores = (ac + bd) / math.sqrt(dk)

        if attn_mask is not None:
            m = attn_mask[None, None] if attn_mask.ndim == 2 else attn_mask[:, None]
            scores = jnp.where(m, jnp.asarray(NEG_INF, scores.dtype), scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if attn_mask is not None:
            probs = jnp.where(m, 0.0, probs)     # espnet re-zeroes masked cells
        probs = nn.Dropout(self.dropout, name="dropatt")(
            probs.astype(cd), deterministic=deterministic)
        out = jnp.einsum("bnij,bjnd->bind", probs, v).reshape(b, t, h * dk)
        return make_dense(self.quant, self.d_model, name="linear_out",
                          dtype=cd)(out).astype(jnp.float32)


class EspnetFeedForward(nn.Module):
    d_model: int
    d_inner: int
    dropout: float = 0.0
    quant: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = make_dense(self.quant, self.d_inner, name="w_1",
                       dtype=self.compute_dtype)(
            x.astype(self.compute_dtype))
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        return make_dense(self.quant, self.d_model, name="w_2",
                          dtype=self.compute_dtype)(h).astype(jnp.float32)


class EspnetEncoderLayer(nn.Module):
    """Pre-LN layer: x + drop(attn(LN(x))) then x + drop(ff(LN(x)))."""

    n_head: int
    d_model: int
    d_inner: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    quant: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pos_emb: jax.Array,
                 attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        att = RelPosMultiHeadAttention(
            n_head=self.n_head, d_model=self.d_model, dropout=self.attn_dropout,
            quant=self.quant, compute_dtype=self.compute_dtype,
            name="self_attn")(
            y, pos_emb, attn_mask, deterministic)
        x = x + nn.Dropout(self.dropout, name="drop1")(att, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        ff = EspnetFeedForward(d_model=self.d_model, d_inner=self.d_inner,
                               dropout=self.dropout, quant=self.quant,
                               compute_dtype=self.compute_dtype,
                               name="feed_forward")(y, deterministic)
        return x + nn.Dropout(self.dropout, name="drop2")(ff, deterministic=deterministic)


_CONV_STACKS = {
    # (kernel, stride) per conv; all VALID padding (torch Conv2d padding=0).
    # Reference: espnet/nets/pytorch_backend/transformer/subsampling.py
    # Conv2dSubsampling:42 (1/4), Conv2dSubsampling6:101 (1/6),
    # Conv2dSubsampling8:149 (1/8).
    "conv2d": ((3, 2), (3, 2)),
    "conv2d6": ((3, 2), (5, 3)),
    "conv2d8": ((3, 2), (3, 2), (3, 2)),
}


def conv_subsampled_length(lengths, variant: str, t_in: int):
    """Valid-length update matching espnet's mask slicing exactly
    (``[:-2:2]`` per s2 conv, ``[:-4:3]`` for the s3 conv): the slice keeps
    positions ``0, s, 2s, ... <= T-k``, so the valid count is
    ``ceil(min(len, T-(k-1)) / s)`` per conv."""
    t = t_in
    for k, s in _CONV_STACKS[variant]:
        lengths = -(-jnp.minimum(lengths, t - (k - 1)) // s)
        t = (t - k) // s + 1
    return lengths


class Conv2dSubsampling(nn.Module):
    """Conv2d subsampling front-end (1/4, 1/6 or 1/8 time reduction).

    Matches the reference modules' math: stacked VALID Conv2d(+ReLU) over the
    (time, freq) plane, channels -> ``odim``, then a Linear over the
    flattened (channel-major, as torch's ``view(b, t, c*f)``) feature axis.
    The positional encoding / sqrt(d) scaling stays with the caller (the
    espnet recipe threads its pos_enc class INTO the torch module; here the
    encoder applies it right after, same order).
    """

    odim: int
    variant: str = "conv2d"
    quant: bool = False   # int8 for the flattening Dense (convs stay float)

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array]
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        h = x[..., None]                                   # NHWC (B, T, D, 1)
        for i, (k, s) in enumerate(_CONV_STACKS[self.variant]):
            h = nn.Conv(self.odim, (k, k), strides=(s, s), padding="VALID",
                        name=f"conv_{i}")(h)
            h = nn.relu(h)
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)   # torch (b,t,c*f)
        h = make_dense(self.quant, self.odim, name="out")(h)
        if lengths is None:
            return h, None
        return h, conv_subsampled_length(lengths, self.variant, x.shape[1])


class EspnetTransformerEncoder(nn.Module):
    """ESPnet-style encoder with banded masks and rel-pos attention.

    ``input_layer``: None (features already d_model-sized), "embed"
    (token embedding, padding semantics per espnet padding_idx=-1 — i.e. a
    plain lookup), "linear" (projection + LN + dropout + relu), or
    "conv2d"/"conv2d6"/"conv2d8" (time-subsampling conv front-ends; the
    band/padding masks are built at the SUBSAMPLED rate, like the
    reference's post-embed mask math).
    """

    output_size: int
    attention_heads: int
    linear_units: int
    num_blocks: int
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = None
    input_size: Optional[int] = None
    padding_idx: Optional[int] = None   # espnet padding_idx=-1 -> row V-1
    quant: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: jax.Array, lengths: Optional[jax.Array] = None,
                 left_mask: int = -1, right_mask: int = -1,
                 deterministic: bool = True,
                 extra_mask: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        if self.input_layer == "embed":
            x = nn.Embed(self.input_size, self.output_size, name="embed",
                         embedding_init=nn.initializers.normal(1.0))(xs)
            if self.padding_idx is not None:
                # torch zero-freezes the padding row (padding_idx=-1 == V-1,
                # which is also the sos id in this recipe — quirk preserved)
                row = self.padding_idx % self.input_size
                x = x * (xs != row)[..., None].astype(x.dtype)
        elif self.input_layer == "linear":
            x = make_dense(self.quant, self.output_size, name="input_proj")(xs)
            x = nn.LayerNorm(epsilon=1e-5, name="input_norm")(x)
            x = nn.Dropout(self.dropout_rate, name="input_drop")(
                x, deterministic=deterministic)
            x = nn.relu(x)
        elif self.input_layer in _CONV_STACKS:
            x, lengths = Conv2dSubsampling(
                odim=self.output_size, variant=self.input_layer,
                quant=self.quant, name="subsample")(xs, lengths)
        else:
            x = xs

        t = x.shape[1]
        # combined mask (True == masked): band + key-side padding + extra,
        # all at the (possibly conv-subsampled) model rate
        band = None
        if left_mask >= 0 or right_mask >= 0:
            band = context_mask(t, left_mask if left_mask >= 0 else t,
                                right_mask if right_mask >= 0 else t)
        pad = padding_mask(lengths, t)[:, None, :] if lengths is not None else None
        if extra_mask is not None and extra_mask.ndim == 2:
            extra_mask = extra_mask[None]
        mask = combine_masks(band[None] if band is not None else None, pad,
                             extra_mask)

        x = x * math.sqrt(self.output_size)
        pos = jnp.asarray(rel_positional_encoding(t, self.output_size))
        x = nn.Dropout(self.positional_dropout_rate, name="pos_drop")(
            x, deterministic=deterministic)
        pos = nn.Dropout(self.positional_dropout_rate, name="pos_drop_emb")(
            pos, deterministic=deterministic)

        for i in range(self.num_blocks):
            x = EspnetEncoderLayer(
                n_head=self.attention_heads, d_model=self.output_size,
                d_inner=self.linear_units, dropout=self.dropout_rate,
                attn_dropout=self.attention_dropout_rate, quant=self.quant,
                compute_dtype=self.compute_dtype, name=f"layer_{i}")(
                x, pos, mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        return x, lengths


class AdditiveJointNetwork(nn.Module):
    """lin_out(act(lin_enc(enc) + lin_dec(dec))), bias-free lin_dec."""

    vocab_size: int
    joint_space_size: int
    activation: str = "tanh"
    quant: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc: jax.Array, dec: jax.Array) -> jax.Array:
        cd = self.compute_dtype
        he = make_dense(self.quant, self.joint_space_size, name="lin_enc",
                        dtype=cd)(enc.astype(cd))
        hd = make_dense(self.quant, self.joint_space_size, use_bias=False,
                        name="lin_dec", dtype=cd)(dec.astype(cd))
        if enc.ndim == 3 and dec.ndim == 3:
            h = he[:, :, None, :] + hd[:, None, :, :]
        else:
            h = he + hd
        act = {"tanh": jnp.tanh, "relu": nn.relu}[self.activation]
        return make_dense(self.quant, self.vocab_size, name="lin_out",
                          dtype=cd)(act(h)).astype(jnp.float32)


class EspnetTransducer(nn.Module):
    """Encoder + sos-prefixed text encoder + additive joint (+ RNN-T loss)."""

    vocab_size: int
    enc_kwargs: Tuple[Tuple[str, Any], ...]
    dec_kwargs: Tuple[Tuple[str, Any], ...]
    joint_space_size: int
    joint_activation: str = "tanh"
    encoder_left_mask: int = 10
    encoder_right_mask: int = 2
    decoder_left_mask: int = 2
    quant: bool = False   # int8 projections; variables must come from
                          # ops.quant.quantize_variables (inference only)
    compute_dtype: Any = jnp.float32

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        self.encoder = EspnetTransformerEncoder(
            quant=self.quant, compute_dtype=self.compute_dtype,
            **dict(self.enc_kwargs))
        self.decoder = EspnetTransformerEncoder(
            quant=self.quant, compute_dtype=self.compute_dtype,
            **dict(self.dec_kwargs))
        self.joint = AdditiveJointNetwork(
            vocab_size=self.vocab_size, joint_space_size=self.joint_space_size,
            activation=self.joint_activation, quant=self.quant,
            compute_dtype=self.compute_dtype)

    def __call__(self, speech: jax.Array, speech_lengths: jax.Array,
                 text: jax.Array, text_lengths: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """Full logits (B, T, U+1, V) — reference computes the loss inside
        ``forward`` (``tt_espnet/model.py:35-81``); trainers here use
        :meth:`encode_both` + the fused loss instead."""
        enc, dec = self.encode_both(speech, speech_lengths, text, text_lengths,
                                    deterministic)
        return self.joint(enc, dec)

    def encode_both(self, speech, speech_lengths, text, text_lengths,
                    deterministic: bool = True):
        enc, _ = self.encoder(speech, speech_lengths,
                              left_mask=self.encoder_left_mask,
                              right_mask=self.encoder_right_mask,
                              deterministic=deterministic)
        dec = self.encode_text(text, text_lengths, deterministic)
        return enc, dec

    def encode_text(self, text, text_lengths, deterministic: bool = True):
        """sos-prefixed text encoder alone (``tt_espnet/model.py:59-66``) —
        the label half of :meth:`encode_both`, callable standalone so the
        pipeline-parallel loss path (``parallel.pipeline.
        encode_pipelined_espnet`` for the audio side) can run it on the
        data-parallel part of the mesh."""
        text_in = jnp.pad(text, ((0, 0), (1, 0)), constant_values=self.sos)
        dec, _ = self.decoder(text_in, text_lengths + 1,
                              left_mask=self.decoder_left_mask, right_mask=0,
                              deterministic=deterministic)
        return dec

    def encode(self, speech, speech_lengths=None, deterministic: bool = True):
        enc, _ = self.encoder(speech, speech_lengths,
                              left_mask=self.encoder_left_mask,
                              right_mask=self.encoder_right_mask,
                              deterministic=deterministic)
        return enc

    def encoded_lengths(self, lengths, t_in: int):
        """Input-frame lengths -> encoder-OUTPUT lengths (pure shape
        arithmetic, callable without ``apply``).  Identity unless the
        encoder has a conv-subsampling input layer, in which case the output
        is 4-8x shorter than the input and every consumer of encoder frames
        (RNN-T loss t_len, greedy/beam decode) MUST use the mapped value —
        raw input lengths would index past the valid frames."""
        il = dict(self.enc_kwargs).get("input_layer")
        if il in _CONV_STACKS:
            return conv_subsampled_length(lengths, il, t_in)
        return lengths

    def predict(self, tokens, attn_mask=None, deterministic: bool = True):
        """Label-encoder over a token buffer (band left=decoder_left_mask,
        right=0), matching ``forward_one_step``
        (``espnet2/.../transformer_encoder.py:241-283``).  ``attn_mask``
        (True == masked) is OR-combined with the internal band — the greedy
        decoder's causal mask is redundant here (band right=0 ⊆ causal) but
        accepted for interface parity with the native family."""
        dec, _ = self.decoder(tokens, None, left_mask=self.decoder_left_mask,
                              right_mask=0, deterministic=deterministic,
                              extra_mask=attn_mask)
        return dec

    def joint_logits(self, enc, dec):
        return self.joint(enc, dec)


def apply_input_layer_pure(enc_kwargs: dict, enc_params, xs: jax.Array,
                           lengths: Optional[jax.Array],
                           dropout_key=None, deterministic: bool = True):
    """Pure-function twin of :class:`EspnetTransformerEncoder`'s input stage
    (everything before the sqrt(d) scaling): input layer (none / embed /
    linear / conv2d*) applied straight from the param tree.  Used by the
    SPMD encoder programs (``parallel/pipeline.py`` pp,
    ``parallel/sequence.py`` sp), whose block params live stacked/sharded
    while the input-layer params stay replicated.  Returns ``(x, lengths)``
    at the model rate.  Train-mode dropout (the "linear" variant's
    input_drop) uses the explicit ``dropout_key`` — a valid iid draw, but a
    different stream than the flax-path-derived one (SPMD-program parity
    tests run with dropout 0)."""
    il = enc_kwargs.get("input_layer")
    if il == "embed":
        x = jnp.asarray(enc_params["embed"]["embedding"])[xs]
        if enc_kwargs.get("padding_idx") is not None:
            row = enc_kwargs["padding_idx"] % enc_kwargs["input_size"]
            x = x * (xs != row)[..., None].astype(x.dtype)
        return x, lengths
    if il == "linear":
        pr = enc_params["input_proj"]
        x = xs @ pr["kernel"] + pr["bias"]
        nm = enc_params["input_norm"]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * nm["scale"] + nm["bias"]
        rate = enc_kwargs.get("dropout_rate") or 0.0
        if not deterministic and rate > 0.0:
            keep = jax.random.bernoulli(dropout_key, 1.0 - rate, x.shape)
            x = jnp.where(keep, x / (1.0 - rate), 0.0)
        return jax.nn.relu(x), lengths
    if il in _CONV_STACKS:
        return Conv2dSubsampling(
            odim=enc_kwargs["output_size"], variant=il).apply(
            {"params": enc_params["subsample"]}, xs, lengths)
    return xs, lengths


def joint_params_from_espnet_variables(variables):
    """(W_enc, W_dec, b_enc, W_out, b_out) for the fused RNN-T loss path —
    the additive joint has the same algebraic form as the concat joint."""
    from transformer_transducer_tpu.ops.quant import dense_kernel
    params = variables["params"] if "params" in variables else variables
    joint = params["joint"]
    return (dense_kernel(joint["lin_enc"]), dense_kernel(joint["lin_dec"]),
            joint["lin_enc"]["bias"], dense_kernel(joint["lin_out"]),
            joint["lin_out"]["bias"])


def build_espnet_transducer(model_cfg, compute_dtype=jnp.float32,
                            quant: bool = False) -> EspnetTransducer:
    """From a reference-schema ``config/espnet_aishell.yaml`` model block."""
    def enc_args(blk, input_layer):
        return tuple({
            "output_size": blk.output_size,
            "attention_heads": blk.attention_heads,
            "linear_units": blk.linear_units,
            "num_blocks": blk.num_blocks,
            "dropout_rate": blk.dropout_rate or 0.0,
            "positional_dropout_rate": blk.positional_dropout_rate or 0.0,
            "attention_dropout_rate": blk.attention_dropout_rate or 0.0,
            "input_layer": input_layer,
            "input_size": blk.input_size,
            "padding_idx": blk.padding_idx,
        }.items())

    return EspnetTransducer(
        vocab_size=model_cfg.joint.vocab_size,
        enc_kwargs=enc_args(model_cfg.enc, model_cfg.enc.input_layer),
        dec_kwargs=enc_args(model_cfg.dec, model_cfg.dec.input_layer or "embed"),
        joint_space_size=model_cfg.joint.joint_space_size,
        joint_activation=model_cfg.joint.joint_activation_type or "tanh",
        encoder_left_mask=model_cfg.mask.encoder_left_mask,
        encoder_right_mask=model_cfg.mask.encoder_right_mask,
        decoder_left_mask=model_cfg.mask.decoder_left_mask,
        quant=quant, compute_dtype=compute_dtype)
