"""Greedy RNN-T decoding — batched, jit-compiled, static shapes.

Parity surface: reference ``Transducer.decode``/``recognize``
(``tt/model.py:70-108``): start from blank token 0, for each frame take
``argmax(joint(enc_t, dec_state))``; on a non-blank emission append the token
and re-encode the full label history, taking the last position; at most one
emission per frame.

TPU-first redesign: the reference is a per-utterance Python loop with
data-dependent re-encodes (``tt/model.py:76-88``).  Here the whole batch
advances in one ``lax.scan`` over frames with a fixed token budget:

* the token buffer is front-aligned with a **causal label mask**, so the
  label-encoder output at position ``count-1`` is exactly the dynamic-length
  result (the rel-position tables are shift-invariant for ``j <= i`` and the
  causal mask removes the rel-shift wrap-around);
* the label encoder is re-run every frame on the static buffer — identical
  output when no token was emitted, so numerics match the reference's
  "recompute only on emission" control flow.

Deviation (deliberate): the reference passes **no** label mask at inference
(``tt/model.py:75,88``), which feeds the rel-shift wrap-around values that the
look-ahead-masked training never produced (``tt/model.py:62``).  The jit path
uses the causal mask — the training-consistent choice and the only
static-shape-exact one.  ``decode_reference_exact`` reproduces the unmasked
reference behaviour bit-for-bit for parity tests.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import look_ahead_mask


def _is_native_family(variables) -> bool:
    """Single source of truth for the family check (probes the native
    ``LabelEncoder`` param layout); streaming/session.py, streaming/
    batched.py and this module all dispatch on it — do not re-implement."""
    params = variables.get("params", variables)
    dec = params.get("decoder", {})
    return "layer_0" in dec and "attn" in dec.get("layer_0", {})


def predict_last_state(model, variables, buf: jax.Array, count: jax.Array,
                       label_mask) -> jax.Array:
    """(N, U) token buffers -> (N, D) label-encoder state at position
    count-1.  The shared decode-side contract (greedy, beam, streaming,
    batched serving): encode the whole static buffer under ``label_mask``
    (the causal choice is documented at :func:`greedy_decode`) and gather
    each row's last real token's state."""
    dec = model.apply(variables, buf, label_mask, method="predict")
    idx = (count - 1)[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(dec, idx.repeat(dec.shape[-1], -1), 1)[:, 0]


def greedy_decode(model: Transducer, variables, enc_states: jax.Array,
                  t_len: jax.Array, max_tokens: int = 43,
                  blank: int = 0, use_cache: Optional[bool] = None,
                  seed_token: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Batched greedy decode.

    Args:
      enc_states: (B, T, D) encoder output.
      t_len: (B,) valid frame counts.
      max_tokens: static token budget (>= 1 + longest expected emission).
      use_cache: KV-cached incremental label encoding (numerics-identical
        under the causal mask / causal band; see ``decoding/label_cache.py``
        and ``decoding/espnet_label_cache.py``).  Defaults to on for both
        families.
      seed_token: history seed — blank 0 for the native family
        (``tt/model.py:72``), sos == vocab-1 for the espnet family
        (``tt_espnet/model.py:86``).
    Returns:
      tokens: (B, max_tokens) with tokens[:, 0] == the seed token,
      counts: (B,) number of valid entries in ``tokens`` (including seed).
    """
    b, t_max, _ = enc_states.shape
    label_mask = look_ahead_mask(max_tokens)
    if use_cache is None:
        use_cache = True

    def predict_last(buf: jax.Array, count: jax.Array) -> jax.Array:
        return predict_last_state(model, variables, buf, count, label_mask)

    def joint_argmax(t, dec_state, count):
        logits = model.apply(variables, enc_states[:, t], dec_state,
                             method="joint_logits")
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (t < t_len) & (pred != blank) & (count < max_tokens), pred

    def update_buf(buf, count, pred, valid):
        pos = jnp.where(valid, count, 0)
        onehot = jax.nn.one_hot(pos, max_tokens, dtype=buf.dtype)
        buf = jnp.where(valid[:, None],
                        buf * (1 - onehot) + pred[:, None] * onehot, buf)
        return buf, count + valid.astype(count.dtype)

    if use_cache:
        if _is_native_family(variables):
            from transformer_transducer_tpu.decoding import label_cache as lc
            step_fn = lc.step
        else:
            import functools
            from transformer_transducer_tpu.decoding import (
                espnet_label_cache as lc)
            step_fn = functools.partial(
                lc.step, left=int(getattr(model, "decoder_left_mask", 2)))
        # restored checkpoints hold numpy leaves; the caches index tables
        # with traced ids, which numpy rejects
        params = jax.tree_util.tree_map(
            jnp.asarray, variables.get("params", variables))

        def step(state, t):
            buf, count, dec_state, cache = state
            valid, pred = joint_argmax(t, dec_state, count)
            buf, count = update_buf(buf, count, pred, valid)
            dec_state, cache = jax.lax.cond(
                valid.any(),
                lambda: _cached_advance(pred, valid, dec_state, cache),
                lambda: (dec_state, cache))
            return (buf, count, dec_state, cache), None

        def _cached_advance(pred, valid, dec_state, cache):
            out, cache = step_fn(params, pred, cache, valid)
            return jnp.where(valid[:, None], out, dec_state), cache

        cache0 = lc.init_cache(params, b, max_tokens)
        dec0, cache0 = step_fn(params,
                               jnp.full((b,), seed_token, jnp.int32), cache0,
                               jnp.ones((b,), bool))
        buf0 = jnp.zeros((b, max_tokens), dtype=jnp.int32) \
            .at[:, 0].set(seed_token)
        count0 = jnp.ones((b,), dtype=jnp.int32)
        (buf, count, _, _), _ = jax.lax.scan(
            step, (buf0, count0, dec0, cache0), jnp.arange(t_max))
        return buf, count

    def step(state, t):
        buf, count, dec_state = state
        valid, pred = joint_argmax(t, dec_state, count)
        buf, count = update_buf(buf, count, pred, valid)
        # scalar-gated recompute: blank frames skip the label encoder
        dec_state = jax.lax.cond(
            valid.any(),
            lambda: jnp.where(valid[:, None], predict_last(buf, count),
                              dec_state),
            lambda: dec_state)
        return (buf, count, dec_state), None

    buf0 = jnp.zeros((b, max_tokens), dtype=jnp.int32).at[:, 0].set(seed_token)
    count0 = jnp.ones((b,), dtype=jnp.int32)
    dec0 = predict_last(buf0, count0)
    (buf, count, _), _ = jax.lax.scan(step, (buf0, count0, dec0),
                                      jnp.arange(t_max))
    return buf, count


def tokens_to_lists(tokens: np.ndarray, counts: np.ndarray) -> List[List[int]]:
    """Strip the blank seed and padding -> python lists (reference returns
    ``token_list[1:]``, ``tt/model.py:90``)."""
    return [list(map(int, tokens[i, 1:counts[i]])) for i in range(len(counts))]


def recognize(model: Transducer, variables, inputs: jax.Array,
              t_len: jax.Array, audio_mask=None, max_tokens: int = 43,
              jit: bool = True) -> List[List[int]]:
    """Full offline recognition: encoder (no mask by default, as in the
    reference eval path ``tt/model.py:92-108``) + batched greedy decode.

    The jitted path is module-level with the (hashable) model static, so the
    compiled program is CACHED across calls and the parameters/mask stay jit
    ARGUMENTS (a per-call closure would re-trace every invocation and bake
    closed-over arrays into the HLO as literal constants)."""
    if jit:
        tokens, counts = _recognize_run(model, max_tokens, variables, inputs,
                                        t_len, audio_mask)
    else:
        enc = model.apply(variables, inputs, audio_mask, method="encode")
        tokens, counts = greedy_decode(model, variables, enc, t_len,
                                       max_tokens)
    return tokens_to_lists(np.asarray(tokens), np.asarray(counts))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _recognize_run(model, max_tokens, variables, inputs, t_len, audio_mask):
    enc = model.apply(variables, inputs, audio_mask, method="encode")
    return greedy_decode(model, variables, enc, t_len, max_tokens)


def decode_reference_exact(model: Transducer, variables,
                           enc_states_b: np.ndarray, t_len_b: int,
                           blank: int = 0) -> List[int]:
    """Bit-exact replica of the reference's unmasked greedy loop for ONE
    utterance (``tt/model.py:70-90``) — dynamic shapes, no jit.  Test oracle
    for :func:`greedy_decode` and the torch-parity suite."""
    tokens = [blank]

    def dec_last():
        buf = jnp.asarray([tokens], dtype=jnp.int32)
        dec = model.apply(variables, buf, None, method="predict")
        return dec[0, -1]

    dec_state = dec_last()
    for t in range(int(t_len_b)):
        logits = model.apply(variables, jnp.asarray(enc_states_b[t]), dec_state,
                             method="joint_logits")
        pred = int(jnp.argmax(logits))
        if pred != blank:
            tokens.append(pred)
            dec_state = dec_last()
    return tokens[1:]
