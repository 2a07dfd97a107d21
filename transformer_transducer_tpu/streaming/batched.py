"""Batched multi-stream streaming recognition (serving).

Beyond-reference capability: the reference serves one microphone stream
(``audio/streamRec*.py``); production serving wants N concurrent streams per
chip.  ``BatchedStreamingSession`` runs N independent feature pipelines on
the host and ONE fused device program per processing round — all streams'
encoder windows and greedy scans advance together (inactive streams ride
along with ``n_eff = 0``), so device cost is amortized across streams and
the per-call dispatch latency is paid once per round instead of once per
stream.

Semantics per stream are identical to :class:`StreamingSession` (same
smoothing rules, halos, label-history ring, blank-run splits) — property:
each stream's output matches a solo session fed the same audio.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.ops import features_np as F
from transformer_transducer_tpu.ops.masks import context_mask, look_ahead_mask
from transformer_transducer_tpu.streaming.session import (
    StreamingConfig, pack_decode_outputs)


class _StreamState:
    """Host-side feature pipeline of one stream.  Buffers are trimmed as
    consumed (positions are ABSOLUTE, the ``*_base`` offsets map them onto
    the retained tails) so a long-lived stream holds O(halo) host state —
    see ``session.StreamingSession.reset`` for the scheme."""

    def __init__(self, cfg: StreamingConfig, d: int):
        self.audio = np.empty((0,), dtype=np.int16)
        self.audio_base = 0
        self.log_mel = np.empty((0, cfg.feature_dim), dtype=np.float32)
        self.concat_len = 0
        self.subsampled = np.empty((0, d), dtype=np.float32)
        self.sub_base = 0
        self.win_audio_position = 0
        self.win_feature_position = 0
        self.result: List[int] = []
        # absolute subsampled-frame index each token was decoded at, and
        # its log-softmax probability at the emitting frame
        # (session.StreamingSession.{timestamps,confidences}, per stream)
        self.timestamps: List[int] = []
        self.confidences: List[float] = []
        self.segments: List[List[int]] = [[]]
        self.finished = False
        # incremental-mode bookkeeping (see session._process_incremental)
        self.fed = 0
        self.shadow_pos = 0
        self.shadow_final_start = None
        self.flushed = False
        self.key_limit = None
        self.pending_flush = 0


class BatchedStreamingSession:
    def __init__(self, model, variables, cfg: StreamingConfig,
                 n_streams: int, incremental: bool = False):
        self.model = model
        # device-put once; jitted programs take the parameters as an ARGUMENT
        # (closed-over arrays would be baked into the serialized HLO as
        # literal constants — ~500 MB for the flagship — and overflow the
        # remote-compile relay's request limit)
        self.variables = jax.device_put(variables)
        self.cfg = cfg
        self.n = n_streams
        self._d = cfg.feature_dim * (1 + cfg.stack_left)
        cfg.ensure_lengths()
        self.incremental = incremental
        if incremental:
            # family dispatch (native closed form / espnet shift-invariant
            # band; float or int8 params) lives in streaming/incremental.py
            from transformer_transducer_tpu.streaming.incremental import (
                make_incremental_encoder)
            stack, self._inc_geom, self._inc_step = make_incremental_encoder(
                self.model, self.variables, cfg)
            self._enc_stack = jax.device_put(stack)
            self._decode = self._build_batched_chunk_decode()
        else:
            self._decode = self._build_batched_decode()
        self.reset()

    def reset(self):
        cfg = self.cfg
        self.streams = [_StreamState(cfg, self._d) for _ in range(self.n)]
        cap = cfg.label_history + 1
        # label-history seed: blank (native) / sos == vocab-1 (espnet)
        self._buf = jnp.zeros((self.n, cap), dtype=jnp.int32) \
            .at[:, 0].set(self.cfg.seed_token)
        self._count = jnp.ones((self.n,), dtype=jnp.int32)
        self._blank_run = jnp.zeros((self.n,), dtype=jnp.int32)
        self._emitted_any = jnp.zeros((self.n,), dtype=jnp.int32)
        self._dec_state = None
        if self.incremental:
            from transformer_transducer_tpu.streaming.incremental import (
                init_cache)
            n_layer, d_model = self._inc_geom
            one = init_cache(n_layer, self.cfg.left_context,
                             self.cfg.right_context, d_model)
            self._cache = jax.device_put(jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (self.n,) + x.shape).copy(),
                one))

    # rounds per device call for the drain path: one compile per bucket,
    # padded rounds are all-stream no-ops (n_eff = 0)
    ROUND_BUCKETS = (1, 2, 4, 8, 16)

    # ------------------------------------------------------------------
    def _make_frame_scan(self, length: int):
        """Per-frame greedy scan over ``length`` effective-frame slots for
        all N streams together (shared by the window and incremental-chunk
        round programs).  N streams advancing in lockstep makes the
        next-emission jump degenerate to ~every frame, so a plain scan
        vectorizes better here than the solo session's ``while_loop``."""
        cfg = self.cfg
        cap = cfg.label_history + 1
        lmask = look_ahead_mask(cap)

        from transformer_transducer_tpu.decoding.greedy import (
            predict_last_state)

        def predict_last(variables, buf, count):
            return predict_last_state(self.model, variables, buf, count,
                                      lmask)

        def frame_scan(variables, state, enc_eff, n_effs):
            def step(state, t):
                buf, count, dec_state, blank_run, emitted_any = state
                enc_t = jax.lax.dynamic_slice_in_dim(enc_eff, t, 1, axis=1)[:, 0]
                logits = self.model.apply(variables, enc_t, dec_state,
                                          method="joint_logits")   # (N, V)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                # log-softmax prob of the winning token (confidences)
                lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
                conf = (jnp.take_along_axis(
                    logits.astype(jnp.float32), pred[:, None],
                    axis=-1)[:, 0] - lse)
                valid = (t < n_effs) & (pred != 0)
                split = valid & (blank_run >= cfg.blank_split) & (emitted_any > 0)

                pos = jnp.minimum(count, cap - 1)
                onehot = jax.nn.one_hot(pos, cap, dtype=buf.dtype)
                appended = buf * (1 - onehot) + pred[:, None] * onehot
                shifted = jnp.concatenate(
                    [buf[:, :1], buf[:, 2:], pred[:, None]], axis=1)
                new_buf = jnp.where((count < cap)[:, None], appended, shifted)
                new_buf = jnp.where(valid[:, None], new_buf, buf)
                new_count = jnp.where(valid, jnp.minimum(count + 1, cap), count)
                dec_state = jax.lax.cond(
                    valid.any(),
                    lambda: jnp.where(valid[:, None],
                                      predict_last(variables, new_buf,
                                                   new_count),
                                      dec_state),
                    lambda: dec_state)
                had = emitted_any > 0
                new_blank = jnp.where(valid, 0,
                                      blank_run + ((t < n_effs) & (pred == 0) & had))
                return ((new_buf, new_count, dec_state, new_blank,
                         emitted_any + valid),
                        (jnp.where(valid, pred, 0), split,
                         jnp.where(valid, conf, 0.0)))

            return jax.lax.scan(step, state, jnp.arange(length))

        self._predict_last = jax.jit(predict_last)
        return frame_scan

    def _build_batched_decode(self):
        cfg = self.cfg
        length = cfg.window_len
        left, right = cfg.left_context, cfg.right_context
        frame_scan = self._make_frame_scan(length)

        from transformer_transducer_tpu.decoding.greedy import (
            _is_native_family)
        is_espnet = not _is_native_family(self.variables)

        def round_body(variables, state, xs):
            """One serving round: encode all N streams' windows + greedy scan.
            ``xs = (windows (N, L, D), left_frames (N,), n_effs (N,))``."""
            windows, left_frames, n_effs = xs
            if is_espnet:
                # espnet encoder bands internally (model.mask config)
                enc = self.model.apply(variables, windows, None,
                                       method="encode")       # (N, L, D)
            else:
                amask = context_mask(length, left, right)
                enc = self.model.apply(variables, windows, amask,
                                       method="encode")       # (N, L, D)
            enc_pad = jnp.pad(enc, ((0, 0), (0, length), (0, 0)))
            enc_eff = jax.vmap(
                lambda e, lf: jax.lax.dynamic_slice_in_dim(e, lf, length)
            )(enc_pad, left_frames)                           # (N, L, D)
            return frame_scan(variables, state, enc_eff, n_effs)

        @jax.jit
        def batched_decode(variables, windows, left_frames, n_effs, buf,
                           count, dec_state, blank_run, emitted_any):
            """One round (the incremental ``process()`` path).  Outputs pack
            as one float32 array (single host transfer): ``out[0]=tokens``,
            ``out[1]=splits``, ``out[2]=log-prob confidences``."""
            state, (toks, splits, confs) = round_body(
                variables, (buf, count, dec_state, blank_run, emitted_any),
                (windows, left_frames, n_effs))
            out = pack_decode_outputs(toks, splits, confs)
            return (*state, out)

        @jax.jit
        def batched_decode_rounds(variables, windows, left_frames, n_effs,
                                  buf, count, dec_state, blank_run,
                                  emitted_any):
            """R stacked rounds in ONE device program (the drain path):
            ``windows (R, N, L, D)``; outputs ``out (3, R, L, N)``."""
            state, (toks, splits, confs) = jax.lax.scan(
                lambda st, xs: round_body(variables, st, xs),
                (buf, count, dec_state, blank_run, emitted_any),
                (windows, left_frames, n_effs))
            out = pack_decode_outputs(toks, splits, confs)
            return (*state, out)

        self._decode_rounds = batched_decode_rounds
        return batched_decode

    def _build_batched_chunk_decode(self):
        """Incremental (cached-encoder) round programs: advance every
        stream's per-layer caches by one feature chunk and greedy-scan the
        emerging output rows.  Vs the window rounds this cuts BOTH the
        encoder work (O(new frames) per stream instead of halo re-encode —
        ~6x at the flagship geometry) and the serial greedy scan
        (``chunk_len`` ≈ 40 frame slots per round instead of
        ``window_len`` = 256).  Per-stream numerics equal the solo
        incremental session (tested)."""
        cfg = self.cfg
        chunk = cfg.chunk_len
        frame_scan = self._make_frame_scan(chunk)
        inc_step = self._inc_step   # family-dispatched cached-encoder step

        def round_body(variables, enc_stack, carry, xs):
            cache, state = carry
            x_new, n_news, kls, vss, nvs = xs

            def one(cache_i, x, n, kl):
                return inc_step(enc_stack, cache_i, x, n, kl)

            cache, out, _ = jax.vmap(one)(cache, x_new, n_news, kls)
            out_pad = jnp.pad(out, ((0, 0), (0, chunk), (0, 0)))
            enc_eff = jax.vmap(
                lambda o, vs: jax.lax.dynamic_slice_in_dim(o, vs, chunk)
            )(out_pad, vss)                                  # (N, C, D)
            state, outs = frame_scan(variables, state, enc_eff, nvs)
            return (cache, state), outs

        @jax.jit
        def chunk_decode(variables, enc_stack, cache, x_new, n_news, kls,
                         vss, nvs, buf, count, dec_state, blank_run,
                         emitted_any):
            (cache, state), (toks, splits, confs) = round_body(
                variables, enc_stack,
                (cache, (buf, count, dec_state, blank_run, emitted_any)),
                (x_new, n_news, kls, vss, nvs))
            out = pack_decode_outputs(toks, splits, confs)
            return (cache, *state, out)

        @jax.jit
        def chunk_decode_rounds(variables, enc_stack, cache, x_new, n_news,
                                kls, vss, nvs, buf, count, dec_state,
                                blank_run, emitted_any):
            """R stacked rounds in ONE device program (the drain path):
            ``x_new (R, N, C, D)``; outputs ``out (3, R, C, N)``."""
            (cache, state), (toks, splits, confs) = jax.lax.scan(
                lambda c, xs: round_body(variables, enc_stack, c, xs),
                (cache, (buf, count, dec_state, blank_run, emitted_any)),
                (x_new, n_news, kls, vss, nvs))
            out = pack_decode_outputs(toks, splits, confs)
            return (cache, *state, out)

        self._decode_rounds = chunk_decode_rounds
        return chunk_decode

    # ------------------------------------------------------------------
    def accept_waveform(self, stream: int, samples: np.ndarray) -> None:
        st = self.streams[stream]
        assert not st.finished
        st.audio = np.concatenate([st.audio, samples.astype(np.int16)])

    def finalize(self, stream: int) -> None:
        self.streams[stream].finished = True

    def _advance_features(self, st: _StreamState) -> None:
        cfg = self.cfg
        while True:
            audio_total = st.audio_base + len(st.audio)
            remaining = audio_total - st.win_audio_position
            rel = st.win_audio_position - st.audio_base
            if remaining >= cfg.win_audio:
                win = st.audio[rel:rel + cfg.win_audio]
                last = False
            elif st.finished and remaining >= 512:
                win = st.audio[rel:]
                last = True
            else:
                # trim consumed audio before returning
                if rel > 0:
                    st.audio = st.audio[rel:]
                    st.audio_base = st.win_audio_position
                return
            feats = F.logmel_masked(win, cfg.sample_rate, cfg.feature_dim)
            if not last:
                feats = feats[:-3]
            n_new = feats.shape[0]
            if n_new > 0:
                borrow = cfg.stack_left
                src = np.concatenate([st.log_mel, feats])[-borrow - n_new:]
                stacked = F.stack_frames(src, borrow, 0)[src.shape[0] - n_new:]
                st.log_mel = src[-borrow:] if borrow else src[:0]
                before = st.concat_len
                off = (-before) % cfg.subsample
                st.concat_len = before + n_new
                st.subsampled = np.concatenate(
                    [st.subsampled, stacked[off::cfg.subsample]])
            if last:
                st.win_audio_position = audio_total
                st.audio = st.audio[:0]
                st.audio_base = st.win_audio_position
                return
            st.win_audio_position += cfg.audio_step

    def _gather_round(self) -> Optional[tuple]:
        """Host-side geometry of the next serving round (pure shape
        arithmetic — independent of decode outputs, so rounds can be
        precomputed and stacked).  Advances per-stream feature positions;
        returns ``(windows, left_frames, n_effs, abs_starts)`` or None when
        no stream has a ready window."""
        cfg = self.cfg
        n = self.n
        windows = np.zeros((n, cfg.window_len, self._d), np.float32)
        left_frames = np.zeros((n,), np.int32)
        n_effs = np.zeros((n,), np.int32)
        abs_starts = np.zeros((n,), np.int32)
        for i, st in enumerate(self.streams):
            self._advance_features(st)
            total = st.sub_base + st.subsampled.shape[0]
            future = total - st.win_feature_position
            if future <= 0 or (not st.finished and future <= cfg.right_len):
                continue
            left_frame = min(cfg.left_len, st.win_feature_position)
            start = st.win_feature_position - left_frame
            end = min(total, start + cfg.window_len)
            right_frame = cfg.right_len if (end < total or not st.finished) else 0
            window = st.subsampled[start - st.sub_base:end - st.sub_base]
            n_eff = window.shape[0] - left_frame - right_frame
            if n_eff <= 0:
                continue
            windows[i, :window.shape[0]] = window
            left_frames[i] = left_frame
            n_effs[i] = n_eff
            abs_starts[i] = st.win_feature_position
            st.win_feature_position += n_eff
            # trim feature frames older than the next window's left halo
            drop = (st.win_feature_position - cfg.left_len) - st.sub_base
            if drop > 0:
                st.subsampled = st.subsampled[drop:]
                st.sub_base += drop
        if not n_effs.any():
            return None
        return windows, left_frames, n_effs, abs_starts

    def _advance_stream_shadow(self, st: _StreamState, total: int) -> None:
        """Per-stream mirror of the canonical window geometry (see
        ``session.advance_window_geometry``)."""
        from transformer_transducer_tpu.streaming.session import (
            advance_window_geometry)
        st.shadow_pos, st.shadow_final_start = advance_window_geometry(
            st.shadow_pos, st.shadow_final_start, total, st.finished,
            self.cfg)

    def _gather_chunk_round(self) -> Optional[tuple]:
        """Host-side geometry of the next incremental round: up to
        ``chunk_len`` pending feature rows per stream, plus — once a stream
        is finalized — its ``right_len`` zero flush rows under the canonical
        final window's key clip (``session._process_incremental`` semantics,
        per stream)."""
        from transformer_transducer_tpu.streaming.incremental import _BIG
        cfg = self.cfg
        chunk = cfg.chunk_len
        lag = cfg.right_len
        x_new = np.zeros((self.n, chunk, self._d), np.float32)
        n_news = np.zeros((self.n,), np.int32)
        kls = np.full((self.n,), int(_BIG), np.int32)
        vss = np.zeros((self.n,), np.int32)
        nvs = np.zeros((self.n,), np.int32)
        abs_starts = np.zeros((self.n,), np.int32)
        for i, st in enumerate(self.streams):
            self._advance_features(st)
            total = st.sub_base + st.subsampled.shape[0]
            self._advance_stream_shadow(st, total)
            if st.finished and not st.flushed and total > 0:
                st.key_limit = (st.shadow_final_start + cfg.window_len
                                if st.shadow_final_start is not None
                                else total + lag)
                st.pending_flush = lag
                st.flushed = True
            n_content = max(0, min(chunk, total - st.fed))
            n_zero = min(chunk - n_content, st.pending_flush) \
                if st.flushed else 0
            n_new = n_content + n_zero
            if n_new == 0:
                continue
            if n_content:
                rel = st.fed - st.sub_base
                x_new[i, :n_content] = st.subsampled[rel:rel + n_content]
            n_news[i] = n_new
            if st.flushed:
                kls[i] = st.key_limit
            out_start = st.fed - lag
            vss[i] = max(0, -out_start)
            nvs[i] = max(0, min(n_new - vss[i], total - (out_start + vss[i])))
            abs_starts[i] = out_start + vss[i]
            st.fed += n_new
            st.pending_flush -= n_zero
            # fed content rows are never re-read
            drop = min(st.fed, total) - st.sub_base
            if drop > 0:
                st.subsampled = st.subsampled[drop:]
                st.sub_base += drop
        if not n_news.any():
            return None
        return x_new, n_news, kls, vss, nvs, abs_starts

    def _emit_round(self, round_out: np.ndarray, n_effs: np.ndarray,
                    abs_starts: np.ndarray) -> List[List[int]]:
        """``round_out (3, L, N)`` = packed tokens/splits/confidences from
        one round -> new tokens per stream.  ``abs_starts[i]`` is the
        absolute subsampled-frame index of stream i's first effective slot
        this round (token timestamps)."""
        toks, splits, confs = round_out
        out: List[List[int]] = [[] for _ in range(self.n)]
        for i, st in enumerate(self.streams):
            for t in range(int(n_effs[i])):
                tok = int(toks[t, i])
                if tok == 0:
                    continue
                if splits[t, i] and st.segments[-1]:
                    st.segments.append([])
                st.result.append(tok)
                st.timestamps.append(int(abs_starts[i]) + t)
                st.confidences.append(float(confs[t, i]))
                st.segments[-1].append(tok)
                out[i].append(tok)
        return out

    def process(self) -> List[List[int]]:
        """One fused device round over all streams; returns new tokens per
        stream.  Call repeatedly until it returns all-empty."""
        if self.incremental:
            ready = self._gather_chunk_round()
            if ready is None:
                return [[] for _ in range(self.n)]
            x_new, n_news, kls, vss, nvs, abs_starts = ready
            (self._cache, self._buf, self._count, self._dec_state,
             self._blank_run, self._emitted_any, out) = self._decode(
                self.variables, self._enc_stack, self._cache,
                jnp.asarray(x_new), jnp.asarray(n_news), jnp.asarray(kls),
                jnp.asarray(vss), jnp.asarray(nvs), self._buf, self._count,
                self._ensure_dec(), self._blank_run, self._emitted_any)
            return self._emit_round(np.asarray(out), nvs, abs_starts)
        ready = self._gather_round()
        if ready is None:
            return [[] for _ in range(self.n)]
        windows, left_frames, n_effs, abs_starts = ready
        (self._buf, self._count, self._dec_state, self._blank_run,
         self._emitted_any, out) = self._decode(
            self.variables, jnp.asarray(windows), jnp.asarray(left_frames),
            jnp.asarray(n_effs), self._buf, self._count, self._ensure_dec(),
            self._blank_run, self._emitted_any)
        return self._emit_round(np.asarray(out), n_effs, abs_starts)

    def _ensure_dec(self):
        if self._dec_state is None:
            self._dec_state = self._predict_last(
                self.variables, self._buf, self._count)
        return self._dec_state

    # ------------------------------------------------------------------
    # Continuous batching: per-slot lifecycle (beyond-reference serving).
    # A slot whose stream has drained can be reset and re-admitted while
    # the other streams keep decoding — no gang scheduling, so one long
    # utterance never head-of-line-blocks the batch.
    # ------------------------------------------------------------------

    def stream_done(self, i: int) -> bool:
        """True when stream ``i`` is finalized and fully drained (no
        feature rows or flush rows left to decode) — the slot can be
        ``reset_streams([i])`` and given a new caller."""
        st = self.streams[i]
        if not st.finished:
            return False
        self._advance_features(st)
        total = st.sub_base + st.subsampled.shape[0]
        if self.incremental:
            if not st.flushed:
                return total == 0       # finalized with no decodable audio
            return st.fed >= total and st.pending_flush <= 0
        return st.win_feature_position >= total

    def reset_streams(self, slots: List[int]) -> None:
        """Reset the given slots to fresh streams, leaving every other
        stream's host and device state untouched.

        Exactness: the per-frame scan maintains ``dec_state`` as a PURE
        FUNCTION of the label ring (``predict_last(buf, count)``, see
        ``_make_frame_scan``), so after the ring rows are re-seeded the
        whole dec state is recomputed from the rings on the next round —
        bit-identical for the surviving streams (tested in
        ``tests/test_batched_streaming.py::test_continuous_slot_reuse``).
        All slots reset in ONE jitted masked update (one dispatch), not a
        scatter per slot."""
        if not slots:
            return
        mask = np.zeros((self.n,), np.bool_)
        for i in slots:
            mask[i] = True
            self.streams[i] = _StreamState(self.cfg, self._d)
        if not hasattr(self, "_slot_reset"):
            seed = int(self.cfg.seed_token)

            @jax.jit
            def slot_reset(mask, buf, count, blank_run, emitted_any):
                m = mask[:, None]
                fresh = jnp.zeros_like(buf).at[:, 0].set(seed)
                return (jnp.where(m, fresh, buf),
                        jnp.where(mask, 1, count),
                        jnp.where(mask, 0, blank_run),
                        jnp.where(mask, 0, emitted_any))

            self._slot_reset = slot_reset
        m = jnp.asarray(mask)
        (self._buf, self._count, self._blank_run,
         self._emitted_any) = self._slot_reset(
            m, self._buf, self._count, self._blank_run, self._emitted_any)
        self._dec_state = None          # recomputed from the rings
        if self.incremental:
            from transformer_transducer_tpu.streaming.incremental import (
                init_cache)
            n_layer, d_model = self._inc_geom
            one = init_cache(n_layer, self.cfg.left_context,
                             self.cfg.right_context, d_model)
            if not hasattr(self, "_cache_reset"):
                @jax.jit
                def cache_reset(mask, cache, one):
                    return jax.tree_util.tree_map(
                        lambda c, o: jnp.where(
                            mask.reshape((-1,) + (1,) * (c.ndim - 1)),
                            jnp.broadcast_to(o, c.shape), c), cache, one)
                self._cache_reset = cache_reset
            self._cache = self._cache_reset(m, self._cache, one)

    def serve_files(self, waves: List[np.ndarray],
                    max_rounds: int = 100000,
                    rounds_per_call: int = 4) -> List[List[int]]:
        """Continuous-batching file server: decode ``len(waves)`` utterances
        through ``n_streams`` slots, admitting the next utterance into a
        slot the moment its stream drains (per-slot turnover; contrast the
        gang-scheduled group mode, where the whole batch waits for its
        longest member).  Returns per-utterance token sequences in input
        order; per-utterance timestamps/confidences land in
        ``self.last_meta`` (same order) and serving stats (rounds, slot
        utilization, per-utterance wall-clock latency from admission to
        drain) in ``self.last_stats``.

        ``rounds_per_call`` rounds run stacked per device call between
        admission checks (numerics identical to round-by-round
        ``process()`` — the stacked drain is the tested
        :meth:`run_to_completion` core): >1 amortizes per-call dispatch
        latency at the cost of a drained slot idling up to
        ``rounds_per_call - 1`` rounds before turnover (and
        ``slot_utilization`` being an upper bound at that granularity;
        exact at 1)."""
        import time as _time

        self.reset()
        pending = list(range(len(waves)))
        active = {}                      # slot -> utterance index
        results: List[Optional[List[int]]] = [None] * len(waves)
        self.last_meta = [None] * len(waves)
        admit_t = [None] * len(waves)    # host wall-clock at admission
        latency_s = [None] * len(waves)  # admission -> drained

        def admit(slot):
            k = pending.pop(0)
            active[slot] = k
            admit_t[k] = _time.perf_counter()
            self.accept_waveform(slot, waves[k])
            self.finalize(slot)

        for slot in range(self.n):
            if pending:
                admit(slot)
            else:
                self.finalize(slot)      # empty slot: finished no-op stream
        rounds = 0
        occupied_slot_rounds = 0
        while active and rounds < max_rounds:
            n_run = self._drain_rounds(min(rounds_per_call,
                                           max_rounds - rounds))
            rounds += n_run
            occupied_slot_rounds += len(active) * n_run
            freed = [s for s in active if self.stream_done(s)]
            if n_run == 0 and not freed:
                raise RuntimeError("serve_files stalled: active streams "
                                   "have no decodable work and none drained")
            for slot in freed:
                k = active.pop(slot)
                latency_s[k] = _time.perf_counter() - admit_t[k]
                st = self.streams[slot]
                results[k] = list(st.result)
                self.last_meta[k] = {"timestamps": list(st.timestamps),
                                     "confidences": list(st.confidences),
                                     "segments": [list(s) for s in
                                                  st.segments if s]}
            if freed:
                self.reset_streams(freed)
                for slot in freed:
                    if pending:
                        admit(slot)
                    else:
                        self.finalize(slot)
        self.last_stats = {
            "rounds": rounds,
            # fraction of slot-rounds that carried a live utterance — the
            # head-of-line metric (gang scheduling idles drained slots
            # until the group's longest member finishes)
            "slot_utilization": (occupied_slot_rounds / (rounds * self.n)
                                 if rounds else 0.0),
            "utt_latency_s": latency_s,
        }
        if active:   # runtime watchdog, not a debug assert (python -O strips
            raise RuntimeError(   # asserts and would return None entries)
                f"serve_files exceeded {max_rounds} rounds with "
                f"{len(active)} streams undrained")
        return results

    def run_to_completion(self, max_rounds: int = 10000) -> List[List[int]]:
        """Drain all streams (they must all be finalized first).

        All remaining rounds' window geometry is host-precomputable, so the
        drain stacks up to 16 rounds (``ROUND_BUCKETS``) per device call and
        scans them through ONE program — same numerics as round-by-round
        ``process()`` (tested), at a fraction of the dispatch cost.
        """
        assert all(st.finished for st in self.streams), "finalize() all streams"
        self._drain_rounds(max_rounds)
        return [st.result for st in self.streams]

    def _drain_rounds(self, max_rounds: int) -> int:
        """Execute up to ``max_rounds`` stacked serving rounds; returns the
        number actually run (0 when no stream has decodable work left).
        Shared drain core of :meth:`run_to_completion` (full drain) and
        :meth:`serve_files` (bounded chunks between admission checks)."""
        max_bucket = self.ROUND_BUCKETS[-1]
        budget = max_rounds
        gather = (self._gather_chunk_round if self.incremental
                  else self._gather_round)
        while budget > 0:
            # gather at most one bucket of rounds before decoding it, so
            # host memory stays O(bucket x N windows), not O(total audio)
            group = []
            while len(group) < min(max_bucket, budget):
                ready = gather()
                if ready is None:
                    break
                group.append(ready)
            if not group:
                break
            budget -= len(group)
            r = next(b for b in self.ROUND_BUCKETS if b >= len(group))
            if self.incremental:
                x_new = np.zeros((r,) + group[0][0].shape, np.float32)
                n_news = np.zeros((r, self.n), np.int32)  # pad rounds: no-op
                from transformer_transducer_tpu.streaming.incremental import (
                    _BIG)
                kls = np.full((r, self.n), int(_BIG), np.int32)
                vss = np.zeros((r, self.n), np.int32)
                nvs = np.zeros((r, self.n), np.int32)
                for j, (x, nn, kl, vs, nv, _) in enumerate(group):
                    x_new[j], n_news[j], kls[j], vss[j], nvs[j] = \
                        x, nn, kl, vs, nv
                (self._cache, self._buf, self._count, self._dec_state,
                 self._blank_run, self._emitted_any, out) = \
                    self._decode_rounds(
                        self.variables, self._enc_stack, self._cache,
                        jnp.asarray(x_new), jnp.asarray(n_news),
                        jnp.asarray(kls), jnp.asarray(vss), jnp.asarray(nvs),
                        self._buf, self._count, self._ensure_dec(),
                        self._blank_run, self._emitted_any)
                gates = [(g[4], g[5]) for g in group]
            else:
                windows = np.zeros((r,) + group[0][0].shape, np.float32)
                left_frames = np.zeros((r, self.n), np.int32)
                n_effs = np.zeros((r, self.n), np.int32)  # pad rounds: no-op
                for j, (w, lf, ne, _) in enumerate(group):
                    windows[j], left_frames[j], n_effs[j] = w, lf, ne
                (self._buf, self._count, self._dec_state, self._blank_run,
                 self._emitted_any, out) = self._decode_rounds(
                    self.variables, jnp.asarray(windows),
                    jnp.asarray(left_frames), jnp.asarray(n_effs), self._buf,
                    self._count, self._ensure_dec(), self._blank_run,
                    self._emitted_any)
                gates = [(g[2], g[3]) for g in group]
            out = np.asarray(out)        # (3, R, L, N) — one host transfer
            for j in range(len(group)):
                self._emit_round(out[:, j], *gates[j])
            if len(group) < max_bucket:
                break
        return max_rounds - budget
