"""The Transformer-Transducer model family (native variant).

Parity surface:

* ``AudioEncoder``  <- reference ``BuildEncoder`` (``tt/encoder.py:32-50``):
  N stacked rel-attention layers with per-layer position tables of
  ``k_len = max_input_length``; **no input projection** — stacked-fbank
  features must equal ``d_model``.
* ``LabelEncoder``  <- reference ``BuildDecoder`` (``tt/decoder.py:23-45``):
  ``Embedding(vocab, d_model, padding_idx=0)`` + layers with
  ``k_len = max_target_length``.  ``padding_idx=0`` semantics (row 0 zero and
  gradient-frozen) are reproduced by masking token-0 embeddings to zero.
* ``JointNetwork``  <- reference ``JointNet`` (``tt/model.py:12-39``):
  concat(enc, dec) -> Linear -> tanh -> Linear(vocab) with (B,T,U) broadcast.
* ``Transducer``    <- reference ``Transducer`` (``tt/model.py:42-68``):
  blank-prefixed targets, look-ahead label mask, no audio mask in training
  forward (non-streaming; the streaming band mask is applied by inference
  callers).

TPU-first deviations: batch-major layout, bf16 compute option, and training
never materializes the (B,T,U,V) joint output — the loss consumes encoder and
label-encoder states directly (see ``ops/rnnt_loss.py``).  ``__call__``
returning full logits is kept for API parity and tests.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.attention import TransformerXLLayer
from transformer_transducer_tpu.ops.masks import look_ahead_mask
from transformer_transducer_tpu.ops.quant import make_dense


class AudioEncoder(nn.Module):
    n_layer: int
    k_len: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    dropout: float = 0.0
    remat: bool = False   # rematerialize layers in backward (saves the
                          # (B,H,T,T) attention residuals; ~17% faster
                          # fwd+bwd at B=32 on v5e)
    flash: bool = False   # flash Pallas kernel for unmasked attention
    quant: bool = False   # int8 projections (inference; see ops/quant.py)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: jax.Array, attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 band: Optional[Tuple[int, int]] = None) -> jax.Array:
        layer_cls = (nn.remat(TransformerXLLayer, static_argnums=(2, 3))
                     if self.remat else TransformerXLLayer)
        x = inputs
        for i in range(self.n_layer):
            x = layer_cls(
                k_len=self.k_len, n_head=self.n_head, d_model=self.d_model,
                d_head=self.d_head, d_inner=self.d_inner, dropout=self.dropout,
                flash=self.flash, quant=self.quant,
                compute_dtype=self.compute_dtype,
                name=f"layer_{i}")(x, attn_mask, deterministic, band)
        return x


class LabelEncoder(nn.Module):
    vocab_size: int
    n_layer: int
    k_len: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    dropout: float = 0.0
    quant: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model,
                                  name="embedding",
                                  embedding_init=nn.initializers.normal(1.0))
        self.layers = [TransformerXLLayer(
            k_len=self.k_len, n_head=self.n_head, d_model=self.d_model,
            d_head=self.d_head, d_inner=self.d_inner, dropout=self.dropout,
            quant=self.quant, compute_dtype=self.compute_dtype,
            name=f"layer_{i}")
            for i in range(self.n_layer)]

    def __call__(self, tokens: jax.Array, attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        emb = self.embedding(tokens)
        # padding_idx=0: token 0 embeds to an all-zero, gradient-free vector.
        emb = emb * (tokens != 0)[..., None].astype(emb.dtype)
        x = emb
        for layer in self.layers:
            x = layer(x, attn_mask, deterministic)
        return x

    def embedding_table(self) -> jax.Array:
        """The (V, d_model) embedding matrix (for output-weight tying)."""
        return self.embedding.embedding


class JointNetwork(nn.Module):
    inner_dim: int
    vocab_size: int
    quant: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_state: jax.Array, dec_state: jax.Array,
                 tied_projection: Optional[jax.Array] = None) -> jax.Array:
        """(B,T,D)+(B,U,D) -> (B,T,U,V); matching-rank inputs are concatenated
        directly (the reference's vector-vector decode path).

        ``tied_projection``: optional (V, inner_dim) matrix replacing the
        output kernel (embedding/output weight tying, reference
        ``tt/model.py:53-56``); the projection bias stays a free parameter.
        """
        if enc_state.ndim == 3 and dec_state.ndim == 3:
            t, u = enc_state.shape[1], dec_state.shape[1]
            enc_state = jnp.broadcast_to(enc_state[:, :, None, :],
                                         enc_state.shape[:2] + (u,) + enc_state.shape[-1:])
            dec_state = jnp.broadcast_to(dec_state[:, None, :, :],
                                         (dec_state.shape[0], t) + dec_state.shape[1:])
        concat = jnp.concatenate([enc_state, dec_state], axis=-1).astype(self.compute_dtype)
        h = make_dense(self.quant, self.inner_dim, name="forward_layer",
                       dtype=self.compute_dtype)(concat)
        h = jnp.tanh(h)
        if tied_projection is not None:
            # Tied projection reuses the (float) embedding table — it is not
            # a stored Dense kernel, so it stays unquantized.
            bias = self.param("project_bias", nn.initializers.zeros,
                              (self.vocab_size,), jnp.float32)
            out = h @ tied_projection.T.astype(self.compute_dtype) + bias
            return out.astype(jnp.float32)
        return make_dense(self.quant, self.vocab_size, name="project_layer",
                          dtype=self.compute_dtype)(h).astype(jnp.float32)


class Transducer(nn.Module):
    """Audio encoder + label encoder + joint network."""

    vocab_size: int
    enc: Tuple[int, ...]   # (n_layer, k_len, n_head, d_model, d_head, d_inner)
    dec: Tuple[int, ...]
    joint_inner: int
    dropout: float = 0.0
    share_embedding: bool = False   # tie joint output weights to the embedding
    remat: bool = False             # rematerialize encoder layers in backward
    flash: bool = False             # flash kernel for unmasked encoder attention
    # Train the encoder under the streaming band via the Pallas kernel
    # (fwd+bwd).  DELIBERATE deviation when set: the reference trains every
    # config with audio_mask=None (the banded mask is commented out at
    # tt/model.py:60-61) and only decodes with the band — train/infer
    # consistency is the paper's (arXiv:2002.02562) intent, and O(T*window)
    # beats the dense (T,T) masked path ~4x at T=410, w=13.
    band: Optional[Tuple[int, int]] = None
    quant: bool = False   # int8 projections; variables must come from
                          # ops.quant.quantize_variables (inference only)
    compute_dtype: Any = jnp.float32

    def setup(self):
        e = self.enc
        d = self.dec
        self.encoder = AudioEncoder(n_layer=e[0], k_len=e[1], n_head=e[2],
                                    d_model=e[3], d_head=e[4], d_inner=e[5],
                                    dropout=self.dropout, remat=self.remat,
                                    flash=self.flash, quant=self.quant,
                                    compute_dtype=self.compute_dtype)
        self.decoder = LabelEncoder(vocab_size=self.vocab_size, n_layer=d[0],
                                    k_len=d[1], n_head=d[2], d_model=d[3],
                                    d_head=d[4], d_inner=d[5],
                                    dropout=self.dropout, quant=self.quant,
                                    compute_dtype=self.compute_dtype)
        self.joint = JointNetwork(inner_dim=self.joint_inner,
                                  vocab_size=self.vocab_size,
                                  quant=self.quant,
                                  compute_dtype=self.compute_dtype)

    def __call__(self, inputs: jax.Array, targets: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """Full-logits forward: (B,T,D), (B,U) -> (B,T,U+1,V).

        Matches reference ``Transducer.forward`` (``tt/model.py:58-68``):
        blank-prefix targets, look-ahead label mask, no audio mask.
        """
        enc_state, dec_state = self.encode_both(inputs, targets, deterministic)
        return self.joint_logits(enc_state, dec_state)

    def encode_both(self, inputs: jax.Array, targets: jax.Array,
                    deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        """Encoder + label-encoder states (no joint materialization).

        This is the training hot path: the RNN-T loss kernel consumes these
        directly so the (B,T,U,V) tensor never reaches HBM.
        """
        prefixed = jnp.pad(targets, ((0, 0), (1, 0)))          # blank prefix
        label_mask = look_ahead_mask(prefixed.shape[1])
        enc_state = self.encoder(inputs, None, deterministic, band=self.band)
        dec_state = self.decoder(prefixed, label_mask, deterministic)
        return enc_state, dec_state

    def encode(self, inputs: jax.Array, attn_mask: Optional[jax.Array] = None,
               deterministic: bool = True) -> jax.Array:
        return self.encoder(inputs, attn_mask, deterministic)

    def encode_banded(self, inputs: jax.Array, left: int, right: int,
                      deterministic: bool = True) -> jax.Array:
        """Streaming-band encoding via the Pallas kernel — numerically
        equivalent to ``encode(inputs, context_mask(T, left, right))`` with
        O(T*window) attention cost (see ops/pallas/banded_attention.py)."""
        return self.encoder(inputs, None, deterministic, band=(left, right))

    def predict(self, tokens: jax.Array, attn_mask: Optional[jax.Array] = None,
                deterministic: bool = True) -> jax.Array:
        """Label-encoder forward (reference inference passes no mask)."""
        return self.decoder(tokens, attn_mask, deterministic)

    def joint_logits(self, enc_state: jax.Array, dec_state: jax.Array) -> jax.Array:
        if self.share_embedding:
            table = self.decoder.embedding_table()
            assert table.shape == (self.vocab_size, self.joint_inner), (
                f"weight tying needs embedding {table.shape} == "
                f"(vocab, joint_inner) {(self.vocab_size, self.joint_inner)}")
            return self.joint(enc_state, dec_state, tied_projection=table)
        return self.joint(enc_state, dec_state)


def build_transducer(model_cfg, compute_dtype=jnp.float32,
                     remat: bool = False, flash: bool = False,
                     banded: bool = False, quant: bool = False) -> Transducer:
    """Construct a :class:`Transducer` from a reference-schema model config
    (``config/*.yaml`` ``model:`` block, e.g. ``config/aishell.yaml:20-48``).

    ``banded=True`` trains the encoder under the config's streaming band
    (``enc.left_context``/``enc.right_context``) via the Pallas kernel —
    see the ``Transducer.band`` field note for why this deviates from the
    reference's unmasked training."""
    enc = (model_cfg.enc.n_layer, model_cfg.enc.max_input_length,
           model_cfg.enc.n_head, model_cfg.enc.d_model,
           model_cfg.enc.d_head, model_cfg.enc.d_inner)
    dec = (model_cfg.dec.n_layer, model_cfg.dec.max_target_length,
           model_cfg.dec.n_head, model_cfg.dec.d_model,
           model_cfg.dec.d_head, model_cfg.dec.d_inner)
    # NOTE: like the reference (tt/model.py:53), tying is gated on the
    # `share_embedding` key — the shipped configs define `share_weight`
    # instead, which is silently ignored there and here (missing-key -> None).
    band = None
    if banded:
        left = model_cfg.enc.left_context
        right = model_cfg.enc.right_context
        assert left is not None and right is not None, (
            "banded training needs model.enc.left_context/right_context")
        band = (int(left), int(right))
    return Transducer(vocab_size=model_cfg.vocab_size, enc=enc, dec=dec,
                      joint_inner=model_cfg.joint.inner_size,
                      dropout=model_cfg.dropout or 0.0,
                      share_embedding=bool(model_cfg.share_embedding),
                      remat=remat, flash=flash, band=band, quant=quant,
                      compute_dtype=compute_dtype)
