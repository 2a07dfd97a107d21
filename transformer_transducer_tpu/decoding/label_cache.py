"""KV-cached incremental label encoder (native family).

The decoders re-encode the full (<= 43-token) label history on every
emission, like the reference (``tt/model.py:82-88``).  Under the causal mask
that recompute is wasteful: position u's output depends only on tokens
<= u, and the rel-position scores depend only on the DISTANCE u - j
(the last-klen table slice makes j <= i scores shift-invariant — see
docs/DESIGN.md §2), so per-layer K/V caches give bit-equal results with
O(cap) work per emission instead of O(cap²) per frame.

Scope: exact while the history fits the buffer (offline greedy's one-shot
growth).  The streaming 40-token ring SHIFTS its window on overflow, which
changes what early positions attend to — there the sessions keep the
recompute path after the cap engages.

Implemented as pure functions over the flax parameter tree (mirrors
``models.attention`` math; equality-tested against ``Transducer.predict``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.ops.quant import apply_dense_params


def init_cache(params: Dict, batch: int, cap: int) -> Dict:
    """Empty per-layer K/V caches + position counter."""
    dec = params["decoder"]
    layers = sorted([k for k in dec if k.startswith("layer_")],
                    key=lambda s: int(s.split("_")[1]))
    any_layer = dec[layers[0]]
    k_len, n_head = any_layer["r_bias"].shape
    d_head = any_layer["r_emb"].shape[-1]
    return {
        "k": [jnp.zeros((batch, cap, n_head, d_head)) for _ in layers],
        "v": [jnp.zeros((batch, cap, n_head, d_head)) for _ in layers],
        "idx": jnp.zeros((batch,), jnp.int32),
    }


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _rel_rows(table: jax.Array, idx: jax.Array, cap: int) -> jax.Array:
    """Table rows for distances d = idx - j, j = 0..cap-1, as a (cap, ...)
    slice: row(j) = k_len-1-(idx-j), with the front-pad rule (row 0 repeats)
    for distances beyond the table (reference ``tt/transformer.py:128-135``)."""
    k_len = table.shape[0]
    j = jnp.arange(cap)
    rows = jnp.clip(k_len - 1 - (idx - j), 0, k_len - 1)
    # jnp.asarray: restored checkpoints hold numpy arrays, which reject
    # traced indices
    return jnp.asarray(table)[rows]


def step(params: Dict, tokens: jax.Array, cache: Dict,
         update_mask: jax.Array) -> Tuple[jax.Array, Dict]:
    """Append ``tokens`` (B,) to the cached history and return the label
    encoder's output at the new position.

    ``update_mask`` (B,) bool: streams/rows whose cache should advance (for
    batched greedy where only emitting rows append).  Rows with
    ``update_mask == False`` get an unspecified output (callers mask it).
    """
    dec = params["decoder"]
    layers = sorted([k for k in dec if k.startswith("layer_")],
                    key=lambda s: int(s.split("_")[1]))
    b = tokens.shape[0]
    cap = cache["k"][0].shape[1]
    idx = cache["idx"]                                      # (B,)

    emb_tbl = dec["embedding"]["embedding"]
    x = emb_tbl[tokens] * (tokens != 0)[:, None]            # padding_idx=0
    new_cache = {"k": [], "v": [], "idx": idx + update_mask.astype(jnp.int32)}

    pos_j = jnp.arange(cap)[None, :]                        # (1, cap)
    attend = pos_j <= idx[:, None]                          # causal, (B, cap)

    for li, lname in enumerate(layers):
        lp = dec[lname]
        ap = lp["attn"]
        h, dh = lp["r_w_bias"].shape
        qkv = apply_dense_params(x, ap["qkv"])              # (B, 3*H*Dh)
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h, dh)
        k_new = k_new.reshape(b, h, dh)
        v_new = v_new.reshape(b, h, dh)

        onehot = (pos_j == idx[:, None]).astype(k_new.dtype)  # (B, cap)
        upd = update_mask[:, None].astype(k_new.dtype)
        k_cache = cache["k"][li] + (onehot * upd)[:, :, None, None] \
            * k_new[:, None, :, :]
        v_cache = cache["v"][li] + (onehot * upd)[:, :, None, None] \
            * v_new[:, None, :, :]
        new_cache["k"].append(k_cache)
        new_cache["v"].append(v_cache)

        # scores over cached keys: AC + BD(distance)
        ac = jnp.einsum("bhd,bjhd->bhj", q + lp["r_w_bias"], k_cache)
        re_rows = jax.vmap(lambda i: _rel_rows(lp["r_emb"], i, cap))(idx)
        rb_rows = jax.vmap(lambda i: _rel_rows(lp["r_bias"], i, cap))(idx)
        bd = jnp.einsum("bhd,bjhd->bhj", q, re_rows)        # (B, H, cap)
        bd = bd + rb_rows.transpose(0, 2, 1)
        score = (ac + bd) / np.sqrt(dh)
        score = jnp.where(attend[:, None, :], score,
                          jnp.finfo(jnp.float32).min)
        prob = jax.nn.softmax(score, axis=-1)
        vec = jnp.einsum("bhj,bjhd->bhd", prob, v_cache).reshape(b, h * dh)
        attn_out = apply_dense_params(vec, ap["out"])
        x = _layer_norm(x + attn_out, ap["ln"]["scale"], ap["ln"]["bias"])

        fp = lp["ff"]
        y = _layer_norm(x, fp["ln"]["scale"], fp["ln"]["bias"])
        y = jax.nn.relu(apply_dense_params(y, fp["fc1"]))
        y = apply_dense_params(y, fp["fc2"])
        x = _layer_norm(x + y, fp["ln"]["scale"], fp["ln"]["bias"])

    return x, new_cache
