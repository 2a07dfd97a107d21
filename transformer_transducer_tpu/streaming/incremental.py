"""Incremental (cached) streaming encoder for the native family.

The reference's streaming loop re-encodes a ``n_layer*left`` history halo
plus a ``n_layer*right`` future halo around every ~1 s of new frames
(``audio/streamRec_unlimit_dynamic_window.py:61-63,160-183``) — at the
18-layer flagship that is 180 + ~33 + 36 = 250 frames of 18-layer encode per
~33 new frames, a ~7.6x compute redundancy.  This module removes it the
TPU-native way: each layer caches the last ``left + right`` frames of its
*input* stream, and one device step advances every layer by the chunk's
``n_new`` frames — O(new frames) work per step instead of O(halo + new).

Numerics are IDENTICAL to the canonical pinned-window path
(``StreamingSession`` / ``chunked_encode``) because the banded rel-attention
scores are evaluated in closed form, including the rel-shift wrap semantics
(DESIGN.md §2, reference ``tt/transformer.py:82-95,128-135``):

* ``j - i = dj in [-left, 0]``: ``q_i . re[K-1+dj] + rb[K-1+dj]`` — the LAST
  table rows, window-length invariant;
* ``dj = +1``: 0 (the rel-shift zero-pad column);
* ``dj in [2, right]``: ``q_{i+1} . re_w[dj-2] + rb_w[dj-2]`` where
  ``re_w[m] = table[max(0, k_len - W + m)]`` — the wrap row, pinned to the
  session's fixed ``window_len`` W exactly as the padded-window program pins
  it (``StreamingConfig.window_len``).

Each layer's output frontier lags its input frontier by ``right`` frames
(an output needs ``right`` future inputs), so the encoder output lags the
feature frontier by ``n_layer*right`` — the same algorithmic latency as the
halo design.  At stream end, ``n_layer*right`` zero feature rows flush the
pipe; ``key_limit`` reproduces the canonical final-window clipping (keys at
positions >= the canonical window's last padded row do not exist there).

Espnet family (round 4): its sinusoidal rel-pos attention is
shift-invariant — bd[i, j] depends only on ``i - j`` — which makes the
cached-layer step *simpler* than the native one: no wrap row, no window
pinning, just the ``rel in [-R, L]`` slice of the sinusoid table
(``_espnet_layer_step``).  Halo-cone correctness is the standard argument:
a valid output's receptive cone lies inside its window, and shift-invariant
banded attention over identical input rows produces identical values, so
the per-layer input cache reproduces the espnet window program exactly
(including the final window's padded-key capacity via ``key_limit``).

Int8 (round 4): every projection routes through :func:`_dense`, which
consumes float ``{kernel[, bias]}`` and quantized ``{kernel_q, scale[,
bias]}`` Dense leaves alike (``ops.quant.quant_dense_apply`` — the same
W8A8 dynamic per-row scheme the window program's ``QuantDense`` runs, and
activation scales are row-local, so incremental int8 matches window int8
the way float matches float).

Numerics: exactly equal to the window path in f32 (CPU property tests,
``tests/test_incremental_streaming.py``).  On TPU the different matmul
shapes tile the MXU differently, so f32-via-bf16-passes rounding differs at
the usual ~6e-3 relative level (measured max |delta| 0.026 on outputs with
absmax 4.3 at d_model=512) — the same grouping noise the label-cache and
beam tests tolerate.  Trained-model greedy margins sit far above it.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.models.attention import NEG_INF
from transformer_transducer_tpu.ops.quant import quant_dense_apply

_BIG = np.int32(2**30)  # "no key limit" sentinel (positions are small ints)


def _dense(x: jax.Array, p: Dict[str, jax.Array], cd) -> jax.Array:
    """Apply a Dense param leaf in ``cd`` — float ``{kernel[, bias]}`` or
    int8 ``{kernel_q, scale[, bias]}`` (the window program's ``QuantDense``
    scheme: per-row dynamic activation scales, so identical rows quantize
    identically in both programs)."""
    if "kernel_q" in p:
        return quant_dense_apply(x, p["kernel_q"], p["scale"],
                                 p.get("bias")).astype(cd)
    y = x.astype(cd) @ p["kernel"].astype(cd)
    if "bias" in p:
        y = y + p["bias"].astype(cd)
    return y


def stack_encoder_layers(variables, n_layer: int):
    """Stack the per-layer encoder param subtrees along a leading axis so
    one ``lax.scan`` body serves all layers (one compile instead of
    ``n_layer`` unrolled copies)."""
    layers = [variables["params"]["encoder"][f"layer_{i}"]
              for i in range(n_layer)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_cache(n_layer: int, left: int, right: int, d_model: int
               ) -> Dict[str, Any]:
    """Fresh stream state: per-layer input ring (last ``left+right`` rows)
    plus the global feature-frontier counter."""
    return {"bufs": jnp.zeros((n_layer, left + right, d_model), jnp.float32),
            "n_in": jnp.zeros((), jnp.int32)}


def _layer_norm(x, p):
    """flax ``nn.LayerNorm(epsilon=1e-5)`` bit pattern (fast-variance)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return y * p["scale"] + p["bias"]


def _layer_step(lp, buf, x_new, n_new, pos0, key_limit, *, left, right,
                window_len, n_head, d_head, compute_dtype):
    """One encoder layer, one chunk.

    Args:
      lp: this layer's param subtree (``r_emb``/``r_w_bias``/``r_bias``/
          ``attn``/``ff``).
      buf: (L+R, D) cached input rows (positions ``[pos0-L-R, pos0)``).
      x_new: (C, D) new input rows, first ``n_new`` valid
          (positions ``[pos0, pos0+n_new)``).
      pos0: this layer's input frontier before the step.
      key_limit: keys at positions >= this do not exist (canonical
          final-window clipping); ``_BIG`` during streaming.

    Returns ``(new_buf, out)`` — out (C, D), rows ``[0, n_new)`` are the
    layer outputs for positions ``[pos0 - R, pos0 + n_new - R)``.
    """
    L, R = left, right
    cd = compute_dtype
    C = x_new.shape[0]
    K = L + R + C
    H, dh = n_head, d_head
    # the main-band slice below takes the LAST L+1 table rows directly; a
    # table shorter than the left context would need the canonical
    # front-pad-with-row-0 rule (attention._slice_pos_table) instead of
    # silently mis-slicing (no shipped config comes close: k_len >= 410)
    assert lp["r_emb"].shape[0] > L, (
        f"encoder k_len {lp['r_emb'].shape[0]} must exceed left context {L} "
        "for the incremental closed form")

    concat = jnp.concatenate([buf, x_new], axis=0)          # (K, D)
    pos = pos0 - (L + R) + jnp.arange(K)                    # global positions
    row_ok = (pos >= 0) & (jnp.arange(K) < L + R + n_new) & (pos < key_limit)
    # zero invalid rows: they are always key-masked below, but NaNs from
    # all-masked softmax rows upstream must not ride the V matmul (0*NaN)
    concat = jnp.where(row_ok[:, None], concat, 0.0)

    qkv = _dense(concat, lp["attn"]["qkv"], cd)             # (K, 3*H*dh)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(K, H, dh)
    k = k.reshape(K, H, dh)
    v = v.reshape(K, H, dh)

    r_w_bias = lp["r_w_bias"].astype(cd)                    # (H, dh)
    re = lp["r_emb"]                                        # (k_len, H, dh)
    rb = lp["r_bias"]                                       # (k_len, H)
    k_len = re.shape[0]

    # queries: buffer rows [L, L+C) -> output positions [pos0-R, pos0+C-R)
    qm = q[L:L + C]                                         # (C, H, dh)
    qn = q[L + 1:L + C + 1]                                 # the i+1 neighbor

    ac = jnp.einsum("ihd,jhd->ihj", qm + r_w_bias, k)       # (C, H, K)

    # BD main (dj in [-L, 0]): last L+1 table rows, m = dj + L
    re_main = re[k_len - 1 - L:].astype(cd)                 # (L+1, H, dh)
    rb_main = rb[k_len - 1 - L:].astype(cd)                 # (L+1, H)
    bd_main = (jnp.einsum("ihd,mhd->ihm", qm, re_main)
               + rb_main.T[None])                           # (C, H, L+1)

    i_idx = jnp.arange(C)[:, None]                          # query row i
    j_idx = jnp.arange(K)[None, :]
    dj = j_idx - (i_idx + L)                                # position offset
    m1 = jnp.clip(dj + L, 0, L)                             # main row index
    bd_from_main = jnp.take_along_axis(
        bd_main, jnp.broadcast_to(m1[:, None, :], (C, H, K)), axis=2)

    if R >= 2:
        # BD wrap (dj in [2, R]): slice rows of the WINDOW-PINNED table
        # (front-pad rule when window_len > k_len: row max(0, k_len-W+m))
        rows = np.maximum(0, k_len - window_len + np.arange(R - 1))
        re_wrap = re[rows].astype(cd)                       # (R-1, H, dh)
        rb_wrap = rb[rows].astype(cd)                       # (R-1, H)
        bd_wrap = (jnp.einsum("ihd,mhd->ihm", qn, re_wrap)
                   + rb_wrap.T[None])                       # (C, H, R-1)
        m2 = jnp.clip(dj - 2, 0, R - 2)
        bd_from_wrap = jnp.take_along_axis(
            bd_wrap, jnp.broadcast_to(m2[:, None, :], (C, H, K)), axis=2)
    else:
        bd_from_wrap = jnp.zeros_like(bd_from_main[..., :1])
        bd_from_wrap = jnp.broadcast_to(bd_from_wrap, (C, H, K))

    dj3 = dj[:, None, :]                                    # (C, 1, K)
    bd = jnp.where(dj3 <= 0, bd_from_main,
                   jnp.where(dj3 == 1, jnp.zeros((), cd), bd_from_wrap))

    scale = 1.0 / (dh ** 0.5)
    score = (ac + bd) * scale                               # (C, H, K)
    band = (dj >= -L) & (dj <= R)                           # (C, K)
    valid = band & row_ok[None, :]
    score = jnp.where(valid[:, None, :],
                      score, jnp.asarray(NEG_INF, score.dtype))

    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(cd)
    vec = jnp.einsum("ihj,jhd->ihd", prob, v).reshape(C, H * dh)
    out = _dense(vec, lp["attn"]["out"], cd)
    x_res = concat[L:L + C]                                 # residual rows
    y = _layer_norm((x_res + out).astype(jnp.float32), lp["attn"]["ln"])

    # FFN: one LayerNorm applied twice (shared params), reference
    # tt/transformer.py:36-58
    fp = lp["ff"]
    h = _layer_norm(y, fp["ln"])
    h = jax.nn.relu(_dense(h, fp["fc1"], cd))
    h = _dense(h, fp["fc2"], cd)
    y = _layer_norm(y + h.astype(jnp.float32), fp["ln"])

    new_buf = jax.lax.dynamic_slice_in_dim(concat, n_new, L + R, axis=0)
    return new_buf, y


def incremental_encode_step(enc_stack, cache, x_new, n_new,
                            key_limit=None, *, left, right, window_len,
                            n_head, d_head,
                            compute_dtype=jnp.float32
                            ) -> Tuple[Dict[str, Any], jax.Array, jax.Array]:
    """Advance the whole encoder by one chunk.

    Args:
      enc_stack: ``stack_encoder_layers`` result.
      cache: ``init_cache`` state.
      x_new: (C, D) new feature rows, first ``n_new`` valid.
      key_limit: optional position clip for the canonical final window.

    Returns ``(new_cache, out, out_start)``: out (C, D) encoder outputs —
    row j (j < n_new) is the output for position ``out_start + j`` where
    ``out_start = n_in - n_layer*right`` (rows at negative positions or
    >= the content length are flush garbage for the caller to skip).
    """
    n_layer = cache["bufs"].shape[0]
    n_in = cache["n_in"]
    if key_limit is None:
        key_limit = jnp.asarray(_BIG, jnp.int32)

    def body(x, xs):
        lp, buf, k = xs
        pos0 = n_in - k * right
        new_buf, y = _layer_step(
            lp, buf, x, n_new, pos0, key_limit, left=left, right=right,
            window_len=window_len, n_head=n_head, d_head=d_head,
            compute_dtype=compute_dtype)
        return y, new_buf

    # (full unroll was tried for the 18-layer flagship: 37.5 vs 34.0
    # ms/call encode-only — inside the relay's dispatch variance, so the
    # scanned body stays: one compiled layer body, 18x faster compiles)
    out, new_bufs = jax.lax.scan(
        body, x_new, (enc_stack, cache["bufs"], jnp.arange(n_layer)))
    new_cache = {"bufs": new_bufs, "n_in": n_in + n_new}
    out_start = n_in - n_layer * right
    return new_cache, out, out_start


# ---------------------------------------------------------------------------
# Espnet family (round 4): shift-invariant rel-pos makes the cached step
# simpler — no wrap row, no window pinning (see module docstring).

def stack_espnet_encoder_layers(variables, n_layer: int):
    """Stack the espnet encoder's per-layer subtrees + carry the rowwise
    head params (``after_norm``; ``input_proj``/``input_norm`` when the
    encoder has the "linear" input layer) alongside, as one pytree the
    sessions can ``device_put`` and pass as a jit argument."""
    enc = variables["params"]["encoder"]
    layers = [enc[f"layer_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    head = {"after_norm": enc["after_norm"]}
    if "input_proj" in enc:
        head["input"] = {"proj": enc["input_proj"],
                         "norm": enc["input_norm"]}
    return {"layers": stacked, "head": head}


def _espnet_rel_rows(left: int, right: int, d_model: int) -> np.ndarray:
    """Sinusoid rows for ``rel = i - j`` at band offsets ``dj = j - i``:
    row ``m = dj + left`` encodes ``rel = left - m`` — the only slice of
    ``models.espnet_variant.rel_positional_encoding`` a banded query ever
    reads (bit-identical formula, so window and incremental project the
    same vectors through ``linear_pos``)."""
    rel = left - np.arange(left + right + 1)
    inv = np.exp(np.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    ang = rel[:, None] * inv[None, :]
    pe = np.zeros((left + right + 1, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _espnet_layer_step(lp, buf, x_new, n_new, pos0, key_limit, rel_pe, *,
                       left, right, n_head, compute_dtype):
    """One espnet pre-LN encoder layer, one chunk (parity surface:
    ``models.espnet_variant.EspnetEncoderLayer`` +
    ``RelPosMultiHeadAttention``, reference
    ``espnet/.../transformer/{encoder_layer,attention}.py``).

    Same contract as the native ``_layer_step``: ``buf`` holds the last
    ``left + right`` input rows (positions ``[pos0-L-R, pos0)``), queries
    are concat rows ``[L, L+C)`` (positions ``[pos0-R, pos0+C-R)``),
    ``key_limit`` reproduces the canonical final window's padded-key
    capacity."""
    L, R = left, right
    cd = compute_dtype
    C = x_new.shape[0]
    K = L + R + C
    H = n_head
    ap = lp["self_attn"]

    concat = jnp.concatenate([buf, x_new], axis=0)          # (K, D)
    pos = pos0 - (L + R) + jnp.arange(K)
    row_ok = (pos >= 0) & (jnp.arange(K) < L + R + n_new) & (pos < key_limit)
    concat = jnp.where(row_ok[:, None], concat, 0.0)

    y = _layer_norm(concat, lp["norm1"])                    # pre-LN, f32
    dk = concat.shape[-1] // H
    q = _dense(y[L:L + C], ap["linear_q"], cd).reshape(C, H, dk)
    k = _dense(y, ap["linear_k"], cd).reshape(K, H, dk)
    v = _dense(y, ap["linear_v"], cd).reshape(K, H, dk)
    p = _dense(rel_pe, ap["linear_pos"], cd).reshape(L + R + 1, H, dk)

    u = ap["pos_bias_u"].astype(cd)
    w = ap["pos_bias_v"].astype(cd)
    ac = jnp.einsum("ihd,jhd->ihj", q + u, k)               # (C, H, K)
    bd_all = jnp.einsum("ihd,mhd->ihm", q + w, p)           # (C, H, L+R+1)

    i_idx = jnp.arange(C)[:, None]
    j_idx = jnp.arange(K)[None, :]
    dj = j_idx - (i_idx + L)                                # position offset
    m = jnp.clip(dj + L, 0, L + R)
    bd = jnp.take_along_axis(
        bd_all, jnp.broadcast_to(m[:, None, :], (C, H, K)), axis=2)

    score = (ac + bd) / math.sqrt(dk)
    band = (dj >= -L) & (dj <= R)
    valid = band & row_ok[None, :]
    score = jnp.where(valid[:, None, :],
                      score, jnp.asarray(NEG_INF, score.dtype))
    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1)
    # espnet re-zeroes masked cells after softmax (matters only for
    # all-masked rows; kept for exactness)
    prob = jnp.where(valid[:, None, :], prob, 0.0).astype(cd)
    vec = jnp.einsum("ihj,jhd->ihd", prob, v).reshape(C, H * dk)
    att = _dense(vec, ap["linear_out"], cd).astype(jnp.float32)

    x_att = concat[L:L + C] + att                           # residual, f32
    y2 = _layer_norm(x_att, lp["norm2"])
    fp = lp["feed_forward"]
    h = jax.nn.relu(_dense(y2, fp["w_1"], cd))
    out = x_att + _dense(h, fp["w_2"], cd).astype(jnp.float32)

    new_buf = jax.lax.dynamic_slice_in_dim(concat, n_new, L + R, axis=0)
    return new_buf, out


def espnet_input_transform(head, x_new, cd):
    """The rowwise espnet input pipeline (input layer + sqrt(d) scale) —
    applied to RAW feature rows inside the device step, so flush zeros pass
    through it exactly like the canonical window's padded rows do
    (``EspnetTransformerEncoder.__call__`` order: proj -> LN -> [dropout
    off] -> relu, then ``x * sqrt(d_model)``)."""
    if "input" in head:
        x_new = _dense(x_new, head["input"]["proj"], jnp.float32)
        x_new = _layer_norm(x_new, head["input"]["norm"])
        x_new = jax.nn.relu(x_new)
    d_model = head["after_norm"]["scale"].shape[-1]
    return x_new * math.sqrt(d_model)


def incremental_encode_step_espnet(enc_stack, cache, x_new, n_new,
                                   key_limit=None, *, left, right, n_head,
                                   compute_dtype=jnp.float32
                                   ) -> Tuple[Dict[str, Any], jax.Array,
                                              jax.Array]:
    """Espnet twin of :func:`incremental_encode_step`: input transform +
    per-layer cached band attention + ``after_norm`` on the emerging output
    rows.  ``x_new`` is RAW (stacked-subsampled) feature rows; the cache
    holds post-input-transform streams."""
    n_layer = cache["bufs"].shape[0]
    n_in = cache["n_in"]
    if key_limit is None:
        key_limit = jnp.asarray(_BIG, jnp.int32)
    head = enc_stack["head"]
    rel_pe = jnp.asarray(_espnet_rel_rows(
        left, right, head["after_norm"]["scale"].shape[-1]))
    x = espnet_input_transform(head, x_new, compute_dtype)

    def body(x, xs):
        lp, buf, kk = xs
        pos0 = n_in - kk * right
        new_buf, y = _espnet_layer_step(
            lp, buf, x, n_new, pos0, key_limit, rel_pe, left=left,
            right=right, n_head=n_head, compute_dtype=compute_dtype)
        return y, new_buf

    out, new_bufs = jax.lax.scan(
        body, x, (enc_stack["layers"], cache["bufs"], jnp.arange(n_layer)))
    out = _layer_norm(out, head["after_norm"])
    new_cache = {"bufs": new_bufs, "n_in": n_in + n_new}
    out_start = n_in - n_layer * right
    return new_cache, out, out_start


def make_incremental_encoder(model, variables, cfg):
    """Family dispatch for the sessions: returns ``(enc_stack, (n_layer,
    d_model), step_fn)`` where ``step_fn(enc_stack, cache, x_new, n_new,
    key_limit) -> (cache, out, out_start)`` is the family's cached-encoder
    step (native: wrap-pinned closed form; espnet: shift-invariant band).
    ``enc_stack`` is an opaque pytree — ``device_put`` it and pass it as a
    jit ARGUMENT (never a closure).  Espnet models with conv-subsampling
    input layers are rejected: their window streaming geometry (feature
    rows != encoder rows) has no session support either."""
    from transformer_transducer_tpu.decoding.greedy import _is_native_family
    if _is_native_family(variables):
        e = model.enc
        n_layer, n_head, d_head, d_model = e[0], e[2], e[4], e[3]
        stack = stack_encoder_layers(variables, n_layer)
        cd = model.compute_dtype

        def step(enc_stack, cache, x_new, n_new, key_limit):
            return incremental_encode_step(
                enc_stack, cache, x_new, n_new, key_limit,
                left=cfg.left_context, right=cfg.right_context,
                window_len=cfg.window_len, n_head=n_head, d_head=d_head,
                compute_dtype=cd)

        return stack, (n_layer, d_model), step

    ek = dict(model.enc_kwargs)
    il = ek.get("input_layer")
    if il not in (None, "linear"):
        raise ValueError(
            f"incremental mode supports espnet input_layer None/'linear', "
            f"not {il!r} (conv subsampling changes the feature:encoder row "
            "rate — unsupported by the window streaming geometry too)")
    n_layer, n_head, d_model = (ek["num_blocks"], ek["attention_heads"],
                                ek["output_size"])
    stack = stack_espnet_encoder_layers(variables, n_layer)
    cd = model.compute_dtype

    def step(enc_stack, cache, x_new, n_new, key_limit):
        return incremental_encode_step_espnet(
            enc_stack, cache, x_new, n_new, key_limit,
            left=cfg.left_context, right=cfg.right_context, n_head=n_head,
            compute_dtype=cd)

    return stack, (n_layer, d_model), step


def chunked_encode_key_limit(t: int, left_len: int, right_len: int,
                             step: int, fixed_len: int) -> int:
    """Key capacity of ``streaming.session.chunked_encode``'s FINAL window
    (start-of-final-window + fixed_len): keys at positions >= this do not
    exist in the canonical W x W program, so the incremental path must mask
    them to match the tail frames exactly."""
    pos = 0
    while pos < t:
        end = min(pos + step + right_len, t)
        left_frame = min(left_len, pos)
        start = pos - left_frame
        right_frame = right_len if end < t else 0
        if end == t:
            return start + fixed_len
        pos += (end - start) - left_frame - right_frame
    return t + fixed_len


def incremental_encode(model, variables, features: np.ndarray, *,
                       left: int, right: int, window_len: int,
                       chunk: int = 40, key_limit=None) -> np.ndarray:
    """Whole-sequence incremental encode (test/diagnostic harness): feeds
    ``features`` chunk-by-chunk plus the flush tail and reassembles the
    output stream.  Equals ``streaming.session.chunked_encode`` at the same
    pinned ``window_len`` exactly (property-tested) — by default including
    the canonical final window's key clip (``chunked_encode_key_limit`` at
    chunked_encode's default ``step``); pass ``key_limit`` explicitly when
    comparing against a different window geometry."""
    e = model.enc
    n_layer, n_head, d_head, d_model = e[0], e[2], e[4], e[3]
    enc_stack = jax.device_put(stack_encoder_layers(variables, n_layer))
    cache = init_cache(n_layer, left, right, d_model)
    t = features.shape[0]
    lag = n_layer * right
    # enc_stack rides as a jit ARGUMENT (closing over it would bake the
    # full encoder into the HLO as literal constants — CLAUDE.md rule)
    step = jax.jit(lambda es, st, x, n, kl: incremental_encode_step(
        es, st, x, n, kl, left=left, right=right,
        window_len=window_len, n_head=n_head, d_head=d_head,
        compute_dtype=model.compute_dtype))
    padded = np.concatenate(
        [features, np.zeros((lag, features.shape[1]), np.float32)])
    if key_limit is None:
        key_limit = chunked_encode_key_limit(
            t, n_layer * left, lag, max(lag, 1), window_len)
    outs = []
    for p in range(0, padded.shape[0], chunk):
        rows = padded[p:p + chunk]
        n_new = rows.shape[0]
        if n_new < chunk:
            rows = np.pad(rows, ((0, chunk - n_new), (0, 0)))
        cache, out, out_start = step(enc_stack, cache, jnp.asarray(rows),
                                     jnp.asarray(n_new, jnp.int32),
                                     jnp.asarray(key_limit, jnp.int32))
        out = np.asarray(out)
        s = int(out_start)
        for j in range(n_new):
            if 0 <= s + j < t:
                outs.append(out[j])
    return np.stack(outs, axis=0)
