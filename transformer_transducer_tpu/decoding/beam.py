"""Width-5 beam search, functionally matching the reference algorithm.

Parity surface: ``Transducer.beam_search`` (``tt/model.py:110-179``).  The
reference algorithm (kept, quirks and all, because it defines the observable
behaviour):

* the frame axis advances gated on the CURRENT BEST hypothesis: expansion
  happens only when ``argmax(joint(enc_t, dec_best))`` is non-blank
  (:127-139) — there is no per-hypothesis blank continuation;
* on expansion every hypothesis proposes its top-(width+1) tokens with blank
  removed (equivalently: top-width over the non-blank vocab, :145-154);
* the width x width children reduce to the best ``width`` by total log-prob
  (:172-176); the first expansion instead seeds the beams from the best
  hypothesis's top-width tokens (all initial beams are identical, :155-169);
* result: best beam, blank seed stripped (:177-179).

TPU redesign: the whole search is one ``lax.scan`` over frames with static
(width, max_tokens) state; the label encoder runs batched over all beams
(the reference re-encodes each beam's full history per frame in Python).
Label-encoder caching uses the causal mask (see ``decoding/greedy.py``).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import look_ahead_mask

NEG = -1e30


def beam_search_batched(model: Transducer, variables, enc_states: jax.Array,
                        t_len: jax.Array, beam_width: int = 5,
                        max_tokens: int = 43, blank: int = 0,
                        use_cache: bool = True):
    """Beam search over a batch.  Returns (tokens (B, W, U), counts (B, W),
    probs (B, W)) sorted best-first.

    ``use_cache``: incremental KV-cached label encoding with parent-gather
    on every expansion (``decoding/label_cache.py``) instead of re-encoding
    all W full histories; numerics-equal (the histories never shift — the
    cap simply stops appends), property-tested against ``use_cache=False``.

    Jit boundary: ``_beam_run`` is module-level with the (hashable) model as
    a static argument, so the compiled program is cached across calls and the
    parameters stay jit ARGUMENTS — a closure would bake them into the
    serialized HLO as literal constants (hundreds of MB at flagship size).

    Both model families (round 4; the reference ships beam only for the
    native family, ``tt/model.py:110-179``, and decodes its espnet variant
    greedily — espnet beam is beyond-reference).  The dispatch is purely
    algebraic: the additive espnet joint ``lin_out(act(lin_enc(enc) +
    lin_dec(dec)))`` has the SAME split form as the native concat joint
    (``joint_params_from_espnet_variables``), the label side seeds with
    sos = V-1 instead of blank, and the KV cache walks
    ``decoding/espnet_label_cache`` instead of ``decoding/label_cache``.
    """
    params = variables["params"] if "params" in variables else variables
    if "forward_layer" in params.get("joint", {}):
        seed, activation = blank, "tanh"
    elif "lin_enc" in params.get("joint", {}):
        seed = model.vocab_size - 1                      # sos == eos == V-1
        activation = getattr(model, "joint_activation", "tanh") or "tanh"
    else:
        raise ValueError(
            "beam_search_batched: unrecognized joint param layout "
            "(neither native joint/forward_layer nor espnet joint/lin_enc)")
    return _beam_run(model, variables, enc_states, t_len,
                     beam_width, max_tokens, blank, use_cache, seed,
                     activation)


GATE_CHUNK = 32  # frames per gate window in the emission-jump loop


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9))
def _beam_run(model: Transducer, variables, enc_states: jax.Array,
              t_len: jax.Array, beam_width: int, max_tokens: int, blank: int,
              use_cache: bool = False, seed: int = 0,
              activation: str = "tanh"):
    """Emission-jump beam search (round-3 rewrite of the frame-scan).

    The reference algorithm only mutates state on frames whose gate
    (``argmax(joint(enc_t, dec_best))``) is non-blank — between expansions
    every frame is a provable no-op, exactly like greedy RNN-T.  So instead
    of a 410-step ``lax.scan`` (serial, latency-bound), a ``while_loop``
    evaluates the gate for GATE_CHUNK frames at once (one MXU-shaped
    batched joint per iteration, each batch row at its own frame cursor)
    and jumps every row straight to its next expanding frame; expansions
    then run the same top-k merge as before.  Iterations ~= max-per-row
    #emissions + T/GATE_CHUNK instead of T; trajectories match the frame
    scan (same gate, same expansion math, same lazily-recomputed
    label-encoder states) — property-tested against the torch reference
    oracle.  Worst case (every frame expands, e.g. an untrained model)
    degrades to the old per-frame cost plus the gate overhead.

    Per-iteration cost engineering: the joint is applied through its SPLIT
    parameters (``joint_params_from_variables`` — the same
    ``concat @ W == enc @ W_top + dec @ W_bot`` identity the fused loss
    uses), so the encoder-side projection of every frame is computed ONCE
    outside the loop and each iteration is one ``dynamic_slice`` window +
    tanh + a single (K, V) MXU matmul; the label-side projections are
    carried and refreshed only on expansion.
    """
    from transformer_transducer_tpu.ops.rnnt_loss import (
        joint_params_from_variables)

    b, t_max, _ = enc_states.shape
    w = beam_width
    k = GATE_CHUNK
    cd = model.compute_dtype
    label_mask = look_ahead_mask(max_tokens)

    _p = variables["params"] if "params" in variables else variables
    is_espnet = "lin_enc" in _p["joint"]
    if is_espnet:
        from transformer_transducer_tpu.models.espnet_variant import (
            joint_params_from_espnet_variables)
        jp = joint_params_from_espnet_variables(variables)
    else:
        jp = joint_params_from_variables(variables)
    w_enc, w_dec, b1, w_out, b_out = [p.astype(cd) for p in jp]
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu}[activation]
    # encoder-side joint projection of every frame, computed once;
    # padded so the per-row gate window never clamps at the sequence end
    enc_proj = enc_states.astype(cd) @ w_enc + b1              # (B, T, J)
    enc_proj = jnp.pad(enc_proj, ((0, 0), (0, k), (0, 0)))

    def joint_split(he: jax.Array, hd: jax.Array) -> jax.Array:
        """act(enc-side + dec-side) @ W_out, f32 logits (broadcasting)."""
        h = act((he + hd).astype(cd))
        return (h @ w_out + b_out).astype(jnp.float32)

    def compute_dec_proj(beams, counts):
        """Label-side joint projections for all beams, (B, W, J)."""
        from transformer_transducer_tpu.decoding.greedy import (
            predict_last_state)
        flat_beams = beams.reshape(b * w, max_tokens)
        flat_counts = counts.reshape(b * w)
        dec = predict_last_state(model, variables, flat_beams, flat_counts,
                                 label_mask)                   # (B*W, D)
        return (dec.astype(cd) @ w_dec).reshape(b, w, -1)

    if use_cache:
        params_tree = variables["params"] if "params" in variables else variables
        if is_espnet:
            from transformer_transducer_tpu.decoding import (
                espnet_label_cache as _elc)
            _left = int(getattr(model, "decoder_left_mask", 2))

            def lc_step(tokens, cache, upd):
                return _elc.step(params_tree, tokens, cache, upd, left=_left)

            lc_init = lambda: _elc.init_cache(params_tree, b * w, max_tokens)
        else:
            from transformer_transducer_tpu.decoding import label_cache as lc

            def lc_step(tokens, cache, upd):
                return lc.step(params_tree, tokens, cache, upd)

            lc_init = lambda: lc.init_cache(params_tree, b * w, max_tokens)

    def cond(state):
        return jnp.any(state[5] < t_len)

    def step(state):
        # no-cache mode: dec_proj is carried and only recomputed after an
        # iteration that expanded the beams (aux == stale flag; identical
        # numerics — the label encoder is deterministic).  cache mode:
        # dec_proj is refreshed eagerly at expansion time via the KV cache
        # (aux == the cache pytree), one incremental token per beam.
        beams, counts, probs, first, dec_proj, cur_t, aux = state

        if not use_cache:
            dec_proj = jax.lax.cond(
                aux, lambda: compute_dec_proj(beams, counts),
                lambda: dec_proj)
        best = jnp.argmax(probs, axis=1)                       # (B,)
        dp_best = jnp.take_along_axis(
            dec_proj, best[:, None, None].repeat(dec_proj.shape[-1], -1),
            1)[:, 0]                                           # (B, J)

        # gate over a K-frame window per row: next frame whose argmax is
        # non-blank under the CURRENT best hypothesis
        enc_win = jax.vmap(
            lambda e, t0: jax.lax.dynamic_slice_in_dim(e, t0, k))(
                enc_proj, cur_t)                               # (B, K, J)
        gate_logits = joint_split(enc_win, dp_best[:, None])   # (B, K, V)
        win_idx = cur_t[:, None] + jnp.arange(k)[None, :]      # (B, K)
        cand = (jnp.argmax(gate_logits, -1) != blank) & (win_idx < t_len[:, None])
        any_cand = jnp.any(cand, axis=1)                       # (B,)
        emit_t = jnp.where(any_cand, cur_t + jnp.argmax(cand, axis=1),
                           jnp.minimum(cur_t + k, t_len))
        expand = any_cand

        # all-beam candidate scores at each row's emission frame
        enc_pt = jax.vmap(
            lambda e, t0: jax.lax.dynamic_slice_in_dim(e, t0, 1))(
                enc_proj, jnp.minimum(emit_t, t_max - 1))      # (B, 1, J)
        logits = joint_split(enc_pt, dec_proj)                 # (B, W, V)
        logp = jax.nn.log_softmax(logits, -1)
        logp = logp.at[:, :, blank].set(NEG)                   # non-blank top-w
        vals, idxs = jax.lax.top_k(logp, w)                    # (B, W, W)

        # children: first expansion seeds from the best row; otherwise 5x5
        child_first = jnp.take_along_axis(
            vals, best[:, None, None].repeat(w, 2), 1)[:, 0]   # (B, W)
        tok_first = jnp.take_along_axis(
            idxs, best[:, None, None].repeat(w, 2), 1)[:, 0]
        parent_first = best[:, None].repeat(w, 1)

        flat = (probs[:, :, None] + vals).reshape(b, w * w)
        top_vals, top_flat = jax.lax.top_k(flat, w)            # (B, W)
        parent_grid = top_flat // w
        tok_grid = jnp.take_along_axis(
            idxs.reshape(b, w * w), top_flat, 1)

        new_probs = jnp.where(first[:, None], child_first, top_vals)
        parents = jnp.where(first[:, None], parent_first, parent_grid)
        new_toks = jnp.where(first[:, None], tok_first, tok_grid).astype(jnp.int32)

        src_beams = jnp.take_along_axis(
            beams, parents[:, :, None].repeat(max_tokens, 2), 1)
        src_counts = jnp.take_along_axis(counts, parents, 1)
        src_probs = jnp.take_along_axis(probs, parents, 1)
        can_append = src_counts < max_tokens
        onehot = jax.nn.one_hot(jnp.where(can_append, src_counts, 0),
                                max_tokens, dtype=beams.dtype)
        appended = jnp.where(can_append[:, :, None],
                             src_beams * (1 - onehot) + new_toks[:, :, None] * onehot,
                             src_beams)
        appended_counts = src_counts + can_append.astype(counts.dtype)

        # a full buffer keeps the parent's score: never credit a token
        # that was not actually appended (phantom-score inflation)
        new_probs = jnp.where(can_append, new_probs, src_probs)

        e = expand[:, None]
        beams = jnp.where(e[:, :, None], appended, beams)
        counts = jnp.where(e, appended_counts, counts)
        probs = jnp.where(e, new_probs, probs)
        first = jnp.where(expand, False, first)
        cur_t = jnp.where(expand, emit_t + 1, emit_t)

        if not use_cache:
            return (beams, counts, probs, first, dec_proj, cur_t,
                    expand.any())

        def do_update(args):
            """Parent-gather every beam's KV cache, append the one new
            token, and refresh the label-side joint projections."""
            dec_proj, cache = args

            def g2(a):  # (B, W, ...) gathered by parents along the W axis
                return jax.vmap(lambda ab, pb: ab[pb])(a, parents)

            def gboth(rows):  # cache leaf (B*W, ...) -> parent rows
                return g2(rows.reshape(b, w, *rows.shape[1:])) \
                    .reshape(rows.shape)

            gathered = {**cache,   # batch-independent leaves (espnet "pos")
                        "k": [gboth(c) for c in cache["k"]],
                        "v": [gboth(c) for c in cache["v"]],
                        "idx": gboth(cache["idx"])}
            upd = (e & can_append).reshape(b * w)
            x, new_cache = lc_step(new_toks.reshape(b * w), gathered, upd)
            new_dp = (x.astype(cd) @ w_dec).reshape(b, w, -1)
            dp = jnp.where(can_append[:, :, None], new_dp, g2(dec_proj))
            dp = jnp.where(e[:, :, None], dp, dec_proj)

            # rows whose batch entry did not expand keep their ORIGINAL
            # cache (the gathered parent rows would reshuffle them)
            row_e = jnp.repeat(expand, w)                      # (B*W,)

            def merge(new, old):
                m = row_e.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            cache = {**cache,
                     "k": [merge(nk, ok) for nk, ok
                           in zip(new_cache["k"], cache["k"])],
                     "v": [merge(nv, ov) for nv, ov
                           in zip(new_cache["v"], cache["v"])],
                     "idx": jnp.where(row_e, new_cache["idx"],
                                      cache["idx"])}
            return dp, cache

        dec_proj, cache = jax.lax.cond(expand.any(), do_update,
                                       lambda args: args, (dec_proj, aux))
        return (beams, counts, probs, first, dec_proj, cur_t, cache)

    beams0 = jnp.full((b, w, max_tokens), blank, jnp.int32) \
        .at[:, :, 0].set(seed)
    counts0 = jnp.ones((b, w), jnp.int32)
    probs0 = jnp.zeros((b, w), jnp.float32)
    first0 = jnp.ones((b,), bool)
    if use_cache:
        cache0 = lc_init()
        x0, cache0 = lc_step(jnp.full((b * w,), seed, jnp.int32), cache0,
                             jnp.ones((b * w,), bool))
        dp0 = (x0.astype(cd) @ w_dec).reshape(b, w, -1)
        aux0 = cache0
    else:
        dp0 = compute_dec_proj(beams0, counts0)
        aux0 = jnp.asarray(False)
    beams, counts, probs, _, _, _, _ = jax.lax.while_loop(
        cond, step, (beams0, counts0, probs0, first0, dp0,
                     jnp.zeros((b,), t_len.dtype), aux0))

    order = jnp.argsort(-probs, axis=1)
    beams = jnp.take_along_axis(beams,
                                order[:, :, None].repeat(max_tokens, 2), 1)
    counts = jnp.take_along_axis(counts, order, 1)
    probs = jnp.take_along_axis(probs, order, 1)
    return beams, counts, probs


def beam_search(model: Transducer, variables, enc_states_b: np.ndarray,
                t_len_b: int, beam_width: int = 5, max_tokens: int = 43,
                blank: int = 0) -> List[int]:
    """Single-utterance convenience wrapper; returns the best token list."""
    beams, counts, _ = beam_search_batched(
        model, variables, jnp.asarray(enc_states_b[None]),
        jnp.asarray([t_len_b]), beam_width, max_tokens, blank)
    best = np.asarray(beams)[0, 0]
    n = int(np.asarray(counts)[0, 0])
    return list(map(int, best[1:n]))


def recognize_beam(model: Transducer, variables, inputs: jax.Array,
                   t_len: jax.Array, audio_mask=None, beam_width: int = 5,
                   max_tokens: int = 43) -> List[List[int]]:
    """Batch recognition via beam search (reference
    ``recognize_beam_search``, ``tt/model.py:181-198``).

    Encoder + beam run as ONE jitted program (module-level, model static,
    params as arguments — same contract as ``greedy.recognize``): a bare
    ``model.apply`` here would dispatch every encoder op individually,
    which against a remote-relay TPU backend costs ~25-100 ms PER OP."""
    params = variables["params"] if "params" in variables else variables
    is_espnet = "lin_enc" in params.get("joint", {})
    if is_espnet:
        seed = model.vocab_size - 1
        activation = getattr(model, "joint_activation", "tanh") or "tanh"
    else:
        seed, activation = 0, "tanh"
    beams, counts, _ = _recognize_beam_run(model, beam_width, max_tokens,
                                           variables, inputs, t_len,
                                           audio_mask, is_espnet, seed,
                                           activation)
    out = []
    for i in range(np.asarray(beams).shape[0]):
        n = int(np.asarray(counts)[i, 0])
        out.append(list(map(int, np.asarray(beams)[i, 0, 1:n])))
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 7, 8, 9))
def _recognize_beam_run(model, beam_width, max_tokens, variables, inputs,
                        t_len, audio_mask, is_espnet=False, seed=0,
                        activation="tanh"):
    if is_espnet:
        # espnet encode: second positional arg is the pad-mask lengths and
        # its output length may be conv-subsampled
        enc = model.apply(variables, inputs, t_len, method="encode")
        t_len = model.encoded_lengths(t_len, inputs.shape[1])
    else:
        enc = model.apply(variables, inputs, audio_mask, method="encode")
    return _beam_run(model, variables, enc, t_len, beam_width, max_tokens,
                     0, True, seed, activation)


def beam_search_reference_exact(model: Transducer, variables,
                                enc_states_b: np.ndarray, t_len_b: int,
                                beam_width: int = 5) -> List[int]:
    """Bit-exact replica of the reference's beam search for ONE utterance
    (``tt/model.py:110-179``), dynamic shapes, no jit — including its
    unmasked label encoding, top-(k+1)-minus-blank expansion, first-iteration
    seeding and ``heapq.nlargest`` tie-breaking.  Test oracle for torch
    parity (the compiled path above deliberately uses the causal label mask,
    see ``decoding/greedy.py``)."""
    import copy
    import heapq

    w = beam_width

    def dec_last(tokens):
        buf = jnp.asarray([tokens], dtype=jnp.int32)
        dec = model.apply(variables, buf, None, method="predict")
        return dec[0, -1]

    def softmax_np(tokens, t):
        logits = model.apply(variables, jnp.asarray(enc_states_b[t]),
                             dec_last(tokens), method="joint_logits")
        return np.array(jax.nn.softmax(logits))

    token_list = [[0] for _ in range(w)]
    probability = np.zeros((w,), dtype=float)
    token_child_list = [[[0] for _ in range(w)] for _ in range(w)]
    probability_child = np.zeros((w, w), dtype=float)
    first = True

    for t in range(int(t_len_b)):
        max_index = int(probability.argmax())
        out = softmax_np(token_list[max_index], t)
        if int(out.argmax()) == 0:
            continue
        for token_index in range(w):
            out = softmax_np(token_list[token_index], t)
            order = np.argsort(-out, kind="stable")[:w + 1]
            values = [float(out[i]) for i in order]
            indices = [int(i) for i in order]
            if 0 in indices:
                zi = indices.index(0)
                indices.pop(zi)
                values.pop(zi)
            else:
                indices.pop(-1)
                values.pop(-1)
            if first:
                for i in range(len(indices)):
                    token_child_list[i][token_index].append(indices[i])
                probability_child[:, token_index] = np.log(values)
            else:
                for i in range(len(indices)):
                    token_child_list[token_index][i].append(indices[i])
                probability_child[token_index] = (probability[token_index]
                                                  + np.log(values))
        if first:
            first = False
            for i in range(w):
                token_list[i] = copy.deepcopy(token_child_list[i][0])
                probability[i] = probability_child[i, 0]
        else:
            top = heapq.nlargest(w, range(w * w), probability_child.take)
            new_tokens, new_probs = [], np.zeros((w,))
            for i, idx in enumerate(top):
                new_probs[i] = probability_child[idx // w, idx % w]
                new_tokens.append(copy.deepcopy(
                    token_child_list[idx // w][idx % w]))
            token_list, probability = new_tokens, new_probs
    return token_list[int(probability.argmax())][1:]
