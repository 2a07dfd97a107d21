"""Streaming recognition session (dynamic-window variant).

Parity surface: ``audio/streamRec_unlimit_dynamic_window.py`` (the newer
streaming app the reference's ``test.py:8-10`` launches).  The session keeps
a growing feature pipeline with the reference's three smoothing rules and
decodes receptive-field-exact encoder windows:

* **feature smoothing** — per ~1 s audio window (15,999 samples, hop 15,519)
  extract masked-log mel and drop the last 3 (incomplete) frames (:131-134);
* **stack smoothing** — borrow 3 history log-mel frames before stacking, then
  drop the 3 warm-up rows (:139-145);
* **subsample phase** — align the ÷3 subsampling to the global frame index
  via ``len(concat) % 3`` (:147-153);
* **encoder window** — wait for ``n_layer*right`` future frames (or the final
  chunk), take ``n_layer*left`` history frames as a halo, run the encoder
  with the banded ``context_mask`` and keep only the halo-free frames
  (:159-183);
* **greedy joint** per effective frame against a cached label-encoder state,
  recomputed from the last ≤40 tokens on each emission (:187-207);
* **sentence split** after ≥15 consecutive blank frames (:193-196).

Deliberate divergences (documented, not replicated):

1. the reference slices effective frames as ``[left : -right]`` which is
   ``[left:0]`` == empty when ``right == 0`` on the final chunk — the tail of
   every utterance is silently dropped there; we slice correctly;
2. the label-encoder cache uses the causal mask (see ``decoding/greedy.py``
   for why that is the static-shape-exact, training-consistent choice).

TPU design: the host keeps numpy ring buffers; encoder windows are padded to
static length buckets (one compiled program per bucket — padding beyond the
window cannot reach effective frames because the band mask bounds the
receptive field), and the label-encoder cache is a fixed 41-slot buffer.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops import features_np as F
from transformer_transducer_tpu.ops.masks import context_mask, look_ahead_mask
from transformer_transducer_tpu.utils.config import (
    stack_context, subsample_factor)


@dataclasses.dataclass
class StreamingConfig:
    left_context: int = 10
    right_context: int = 2
    n_layer: int = 18
    feature_dim: int = 128
    stack_left: int = 3
    subsample: int = 3
    win_audio: int = 15999
    audio_step: int = 15519
    sample_rate: int = 16000
    label_history: int = 40
    blank_split: int = 15
    seed_token: int = 0   # label-history seed: blank (native) / sos (espnet)
    # Fixed encoder window length.  All windows are padded to this single
    # static shape: one compiled program, and — crucially — one rel-position
    # table slice.  The table slice depends on sequence length (reference
    # ``tt/transformer.py:128-135`` takes the LAST klen rows), and the
    # rel-shift wrap value at the in-band future offset j = i+2 reads slice
    # row 0 = ``r_emb[k_len - klen]`` — so windows of different lengths
    # produce genuinely different banded attention.  Fixing the window length
    # is what makes chunked decoding equal full-sequence decoding exactly.
    window_len: Optional[int] = None
    # Chunk capacity of the incremental (cached-encoder) mode — frames per
    # device step; defaults to one audio window's worth of new frames.
    chunk_len: Optional[int] = None

    @classmethod
    def from_config(cls, cfg) -> "StreamingConfig":
        if cfg.model.mask is not None:   # espnet-schema config
            return cls(left_context=cfg.model.mask.encoder_left_mask,
                       right_context=cfg.model.mask.encoder_right_mask,
                       n_layer=cfg.model.enc.num_blocks,
                       feature_dim=cfg.data.feature_dim or 128,
                       stack_left=stack_context(cfg.data)[0],
                       subsample=subsample_factor(cfg.data),
                       seed_token=cfg.model.joint.vocab_size - 1)
        return cls(left_context=cfg.model.enc.left_context or 10,
                   right_context=cfg.model.enc.right_context or 2,
                   n_layer=cfg.model.enc.n_layer,
                   feature_dim=cfg.data.feature_dim or 128,
                   stack_left=stack_context(cfg.data)[0],
                   subsample=subsample_factor(cfg.data))

    @property
    def left_len(self) -> int:
        return self.n_layer * self.left_context

    @property
    def right_len(self) -> int:
        return self.n_layer * self.right_context

    @property
    def new_frames(self) -> int:
        # per ~1 s audio window: ~(win_audio/160+1) raw frames /subsample
        return (self.win_audio // 160 + 4) // self.subsample + 2

    def ensure_lengths(self) -> None:
        """Fill the static program lengths that default from the geometry:
        ``window_len`` (halos + one window of new frames, rounded up to a
        lane-friendly multiple of 64) and ``chunk_len`` (one window of new
        frames, multiple of 8).  Respects explicitly-set values."""
        if self.window_len is None:
            need = self.left_len + self.new_frames + self.right_len
            self.window_len = -(-need // 64) * 64
        if self.chunk_len is None:
            self.chunk_len = -(-self.new_frames // 8) * 8


def advance_window_geometry(pos: int, final_start: Optional[int],
                            total: int, last_clip: bool,
                            cfg: StreamingConfig):
    """The canonical window-consumption loop's position bookkeeping (pure
    integer arithmetic, no decoding): consume every ready window given
    ``total`` available feature rows.  Shared by the window sessions (which
    also materialize the windows) and the incremental sessions' shadow
    trackers — the final window's ``final_start`` pins the key-capacity
    clip that incremental decoding must reproduce (DESIGN.md §3b).

    Returns ``(new_pos, new_final_start)``."""
    while True:
        future = total - pos
        if future <= 0 or (not last_clip and future <= cfg.right_len):
            return pos, final_start
        left_frame = min(cfg.left_len, pos)
        start = pos - left_frame
        end = min(total, start + cfg.window_len)
        right_frame = cfg.right_len if (end < total or not last_clip) else 0
        n_eff = (end - start) - left_frame - right_frame
        if n_eff <= 0:
            return pos, final_start
        if right_frame == 0:
            final_start = start
        pos += n_eff


def pack_decode_outputs(toks, splits, confs):
    """Pack per-frame tokens / split flags / log-prob confidences into ONE
    float32 array so each device call costs a single device->host transfer
    (``out[0]=tokens``, ``out[1]=splits``, ``out[2]=confidences``; token ids
    and 0/1 splits are exact in f32 — vocab << 2^24).  Shared by the solo
    and batched decode programs."""
    return jnp.stack([toks.astype(jnp.float32),
                      splits.astype(jnp.float32), confs])


class StreamingSession:
    def __init__(self, model: Transducer, variables, cfg: StreamingConfig,
                 on_token: Optional[Callable[[int, bool], None]] = None,
                 keep_features: bool = False, incremental: bool = False):
        # keep_features: ALSO accumulate the full subsampled feature stream
        # in ``self.feature_log`` (diagnostics/tests only — it grows with
        # the audio; the decode path always runs on the trimmed buffers)
        self.keep_features = keep_features
        self.model = model
        # device-put once: the jitted programs take the parameters as an
        # ARGUMENT (never a closure) — closed-over arrays are baked into the
        # program as literal constants, which bloats the serialized HLO by
        # the full parameter size (~500 MB for the 18-layer flagship) and
        # overflows the remote-compile relay's request limit
        self.variables = jax.device_put(variables)
        self.cfg = cfg
        self.on_token = on_token
        d_stacked = cfg.feature_dim * (1 + cfg.stack_left)
        self._d = d_stacked
        cfg.ensure_lengths()
        self.incremental = incremental
        from transformer_transducer_tpu.decoding.greedy import (
            predict_last_state)
        cap = cfg.label_history + 1
        label_mask = look_ahead_mask(cap)
        self._predict_last = jax.jit(
            lambda variables, buf, count: predict_last_state(
                self.model, variables, buf, count, label_mask))
        self._encode = self._build_encode()
        if incremental:
            # family dispatch (native closed form / espnet shift-invariant
            # band; float or int8 params) lives in streaming/incremental.py
            from transformer_transducer_tpu.streaming.incremental import (
                make_incremental_encoder)
            stack, self._inc_geom, self._inc_step = make_incremental_encoder(
                self.model, self.variables, cfg)
            self._enc_stack = jax.device_put(stack)
            self._chunk_decode = self._build_chunk_decode()
        else:
            self._window_decode = self._build_window_decode()
        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        # Host buffers are TRIMMED as they are consumed (a long-lived stream
        # must hold O(halo) state, not O(audio history)); the *_base offsets
        # map the absolute positions the window math uses onto the retained
        # tails.  ``concat`` needs no buffer at all: the subsample slice only
        # ever reads rows appended in the same ingest (the phase counter
        # ``self.concat_len`` carries the absolute alignment).
        self.audio = np.empty((0,), dtype=np.int16)
        self._audio_base = 0
        self.log_mel = np.empty((0, self.cfg.feature_dim), dtype=np.float32)
        self.concat_len = 0
        self.subsampled = np.empty((0, self._d), dtype=np.float32)
        self._sub_base = 0
        self.feature_log = (np.empty((0, self._d), dtype=np.float32)
                            if self.keep_features else None)
        self.win_audio_position = 0
        self.win_feature_position = 0
        self.result: List[int] = []
        # per emitted token, the absolute subsampled-frame index it was
        # decoded at (frame period = subsample x 10 ms = 30 ms at the
        # shipped configs) and its log-softmax probability at the emitting
        # frame — beyond-reference serving metadata
        self.timestamps: List[int] = []
        self.confidences: List[float] = []
        self.segments: List[List[int]] = [[]]
        self._finished = False
        # device-side decode state: label ring buffer (blank seed + last <=40
        # tokens), its fill count, cached label-encoder state, blank-run len
        cap = self.cfg.label_history + 1
        self._buf = jnp.zeros((1, cap), dtype=jnp.int32) \
            .at[:, 0].set(self.cfg.seed_token)
        self._count = jnp.ones((1,), dtype=jnp.int32)
        self._blank_run = jnp.zeros((1,), dtype=jnp.int32)
        self._emitted_any = jnp.zeros((1,), dtype=jnp.int32)
        self._dec_state = None
        if getattr(self, "incremental", False):
            from transformer_transducer_tpu.streaming.incremental import (
                init_cache)
            n_layer, d_model = self._inc_geom
            self._cache = jax.device_put(init_cache(
                n_layer, self.cfg.left_context, self.cfg.right_context,
                d_model))
            self._fed = 0               # rows fed to the device encoder
            self._shadow_pos = 0        # canonical window-geometry mirror
            self._shadow_final_start = None

    # window-count buckets for the stacked multi-window program: one compile
    # per bucket, padded windows are no-ops (n_eff = 0 gates every effect)
    WINDOW_BUCKETS = (1, 2, 4, 8, 16, 32)
    # chunk-count buckets for the incremental program (each chunk is ~1 s of
    # audio; padded steps are no-ops with n_new = n_valid = 0)
    CHUNK_BUCKETS = (1, 2, 4, 8, 16)

    # ------------------------------------------------------------------
    def _make_frame_decoder(self, e_max: int):
        """Emission-driven greedy joint over ``e_max`` padded encoder frames
        (shared by the window and incremental-chunk programs).

        Greedy RNN-T only changes state on a NON-BLANK emission: while
        the label state is fixed, the per-frame argmax is a pure function
        of the frame.  So instead of scanning all ``e_max`` frame slots
        sequentially (tiny serial matvecs per window), one batched
        joint over the whole window finds the next emitting frame and a
        ``lax.while_loop`` jumps straight to it — (#emissions + 1)
        iterations of one MXU-shaped ``(e_max, V)`` matmul each.  Real
        speech emits on ~10-20 % of frames, so this is ~10x fewer serial
        device steps; even in the dense worst case (every frame emits)
        it is bounded by ``n_eff + 1 <= e_max`` iterations.  Numerics are
        identical to the per-frame loop (chunked==offline property
        tests).  Reference semantics: one emission per frame max,
        ``audio/streamRec_unlimit_dynamic_window.py:187-207``.  The
        batched-joint non-blank detection idea is WIND's
        (arXiv:2505.13765), realized here as a TPU ``while_loop``.
        """
        cfg = self.cfg
        cap = cfg.label_history + 1  # blank seed + history
        mask = look_ahead_mask(cap)

        from transformer_transducer_tpu.decoding.greedy import (
            predict_last_state)

        def predict_last(variables, buf, count):
            return predict_last_state(self.model, variables, buf, count, mask)

        def frame_decode(variables, state, enc_eff, n_eff):
            frame_idx = jnp.arange(e_max)

            def cond(carry):
                return carry[5] < n_eff

            def body(carry):
                (buf, count, dec_state, blank_run, emitted_any, t,
                 out_tok, out_split, out_conf) = carry
                # one batched joint against the CURRENT label state
                logits = self.model.apply(
                    variables, enc_eff,
                    jnp.broadcast_to(dec_state, (e_max, dec_state.shape[-1])),
                    method="joint_logits")
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                cand = (frame_idx >= t) & (frame_idx < n_eff) & (preds != 0)
                any_cand = jnp.any(cand)
                emit_t = jnp.where(any_cand, jnp.argmax(cand), n_eff)
                emit_i = jnp.minimum(emit_t, e_max - 1).astype(jnp.int32)
                pred = preds[emit_i]
                # per-emission confidence: log-softmax prob of the winning
                # token at the emitting frame (beyond-reference metadata)
                row = logits[emit_i].astype(jnp.float32)
                conf = row[pred] - jax.nn.logsumexp(row)
                # frames [t, emit_t) are all blank under this label state
                had_tokens = emitted_any[0] > 0
                blank_run = blank_run + jnp.where(had_tokens, emit_t - t, 0)
                split = any_cand & (blank_run[0] >= cfg.blank_split) \
                    & had_tokens

                # ring append: shift history left once the buffer is full
                pos = jnp.minimum(count[0], cap - 1)
                appended = buf.at[0, pos].set(pred)
                shifted = jnp.concatenate(
                    [buf[:, :1], buf[:, 2:], pred[None, None]], axis=1)
                new_buf = jnp.where(count[0] < cap, appended, shifted)
                new_buf = jnp.where(any_cand, new_buf, buf)
                new_count = jnp.where(any_cand,
                                      jnp.minimum(count + 1, cap), count)
                # scalar-gated: no emission -> skip the label-encoder call
                new_dec = jax.lax.cond(
                    any_cand,
                    lambda: predict_last(variables, new_buf, new_count),
                    lambda: dec_state)
                new_blank = jnp.where(any_cand, 0, blank_run)
                new_emitted = emitted_any + any_cand
                out_tok = jnp.where(
                    any_cand, out_tok.at[emit_i].set(pred), out_tok)
                out_split = jnp.where(
                    any_cand, out_split.at[emit_i].set(split), out_split)
                out_conf = jnp.where(
                    any_cand, out_conf.at[emit_i].set(conf), out_conf)
                new_t = jnp.where(any_cand, emit_t + 1, n_eff).astype(t.dtype)
                return (new_buf, new_count, new_dec, new_blank, new_emitted,
                        new_t, out_tok, out_split, out_conf)

            carry = state + (jnp.zeros((), jnp.int32),
                             jnp.zeros((e_max,), jnp.int32),
                             jnp.zeros((e_max,), bool),
                             jnp.zeros((e_max,), jnp.float32))
            out = jax.lax.while_loop(cond, body, carry)
            return out[:5], (out[6], out[7], out[8])

        return frame_decode

    # ------------------------------------------------------------------
    def _build_window_decode(self):
        """Jitted programs: greedy-joint every effective frame against the
        cached label-encoder state, updating the <=40-token ring buffer and
        blank-run counter on device.

        Two granularities share one window body:

        * single window — the real-time path (one device call per ~1 s
          audio window as it becomes ready);
        * K stacked windows — when several windows are ready at once
          (faster-than-realtime sources, e.g. file decoding), an outer
          ``lax.scan`` threads the decode state through all of them in ONE
          device call.  The per-call dispatch latency of the remote relay
          (~25-100 ms) is the streaming throughput bottleneck, not FLOPs,
          so call count is what this design minimizes.
        """
        cfg = self.cfg
        length = cfg.window_len
        left, right = cfg.left_context, cfg.right_context
        is_espnet = self._is_espnet()
        frame_decode = self._make_frame_decoder(length)

        def window_body(variables, state, window, left_frame, n_eff):
            """Banded encode + emission-driven greedy joint over one padded
            window (the joint loop lives in ``_make_frame_decoder``)."""
            if is_espnet:
                # espnet encoder bands internally (model.mask config); its
                # rel-pos encoding is shift-invariant, so no table pinning
                enc = self.model.apply(variables, window[None], None,
                                       method="encode")[0]
            else:
                amask = context_mask(length, left, right)
                enc = self.model.apply(variables, window[None], amask,
                                       method="encode")[0]
            # pad before the dynamic slice so it never clamps
            enc_pad = jnp.pad(enc, ((0, length), (0, 0)))
            enc_eff = jax.lax.dynamic_slice_in_dim(enc_pad, left_frame, length)
            return frame_decode(variables, state, enc_eff, n_eff)

        @jax.jit
        def window_decode_many(variables, windows, left_frames, n_effs, buf,
                               count, dec_state, blank_run, emitted_any):
            """K stacked windows threaded sequentially through the decode
            state — identical math to K single-window calls, one dispatch.
            Returns outputs packed as one float32 array (single host
            transfer): ``out[0] = tokens``, ``out[1] = splits``,
            ``out[2] = log-prob confidences`` (token ids and 0/1 splits are
            exact in f32 — vocab << 2^24)."""
            def outer(state, xs):
                window, lf, ne = xs
                state, outs = window_body(variables, state, window, lf, ne)
                return state, outs

            (buf, count, dec_state, blank_run, emitted_any), \
                (toks, splits, confs) = \
                jax.lax.scan(outer, (buf, count, dec_state, blank_run,
                                     emitted_any),
                             (windows, left_frames, n_effs))
            out = pack_decode_outputs(toks, splits, confs)
            return buf, count, dec_state, blank_run, emitted_any, out

        return window_decode_many

    # ------------------------------------------------------------------
    def _build_chunk_decode(self):
        """Jitted incremental program: advance the cached encoder by K
        feature chunks and greedy-joint the emerging output frames.

        Each step does O(new frames) encoder work via the per-layer input
        caches (``streaming/incremental.py``) instead of the window path's
        O(left_len + new + right_len) halo re-encode — at the 18-layer
        flagship the halo is 180+36 frames around ~33 new ones, a ~7.6x
        encoder-FLOP redundancy this path removes.  Numerics equal the
        pinned-window program exactly (incl. the final window's key clip,
        reproduced via ``key_limit``); property-tested in
        ``tests/test_incremental_streaming.py``.
        """
        cfg = self.cfg
        chunk = cfg.chunk_len
        frame_decode = self._make_frame_decoder(chunk)
        inc_step = self._inc_step   # family-dispatched cached-encoder step

        def chunk_body(variables, enc_stack, carry, x_new, n_new, key_limit,
                       valid_start, n_valid):
            cache, state = carry
            cache, out, _ = inc_step(enc_stack, cache, x_new, n_new,
                                     key_limit)
            # shift this step's decodable rows to the front (host computed
            # valid_start/n_valid from the output frontier)
            enc_pad = jnp.pad(out, ((0, chunk), (0, 0)))
            enc_eff = jax.lax.dynamic_slice_in_dim(enc_pad, valid_start,
                                                   chunk)
            state, outs = frame_decode(variables, state, enc_eff, n_valid)
            return (cache, state), outs

        @jax.jit
        def chunk_decode_many(variables, enc_stack, cache, xs, n_news,
                              key_limits, valid_starts, n_valids, buf, count,
                              dec_state, blank_run, emitted_any):
            """K stacked chunk steps threaded through the encoder cache and
            decode state in ONE device call (same dispatch-count logic as
            ``window_decode_many``)."""
            def outer(carry, step):
                return chunk_body(variables, enc_stack, carry, *step)

            (cache, (buf, count, dec_state, blank_run, emitted_any)), \
                (toks, splits, confs) = jax.lax.scan(
                    outer,
                    (cache, (buf, count, dec_state, blank_run, emitted_any)),
                    (xs, n_news, key_limits, valid_starts, n_valids))
            out = pack_decode_outputs(toks, splits, confs)
            return (cache, buf, count, dec_state, blank_run, emitted_any,
                    out)

        return chunk_decode_many

    def _is_espnet(self) -> bool:
        from transformer_transducer_tpu.decoding.greedy import (
            _is_native_family)
        return not _is_native_family(self.variables)

    def _build_encode(self):
        """Stand-alone banded window encoder (diagnostics / tests; the hot
        path uses the fused ``_window_decode`` program instead)."""
        length = self.cfg.window_len
        left, right = self.cfg.left_context, self.cfg.right_context

        @jax.jit
        def encode(variables, x):
            mask = context_mask(length, left, right)
            return self.model.apply(variables, x, mask, method="encode")
        return lambda x: encode(self.variables, x)

    # ------------------------------------------------------------------
    def accept_waveform(self, samples: np.ndarray) -> List[int]:
        """Append int16 samples; returns tokens newly emitted by processing
        any complete audio windows."""
        assert not self._finished, "session finished; call reset()"
        self.audio = np.concatenate([self.audio, samples.astype(np.int16)])
        # ingest features for EVERY complete audio window first (pure host
        # numpy), THEN decode: when audio arrives faster than real time,
        # all ready windows stack into one device program
        audio_total = self._audio_base + len(self.audio)
        while (self.win_audio_position + self.cfg.win_audio) <= audio_total:
            rel = self.win_audio_position - self._audio_base
            win = self.audio[rel:rel + self.cfg.win_audio]
            self._ingest_audio_window(win, last_clip=False)
            self.win_audio_position += self.cfg.audio_step
        # trim consumed audio (finalize still needs the tail)
        drop = self.win_audio_position - self._audio_base
        if drop > 0:
            self.audio = self.audio[drop:]
            self._audio_base = self.win_audio_position
        return self._process_feature_windows(last_clip=False)

    def finalize(self) -> List[int]:
        """Flush the remaining audio (the reference's ``last_clip`` path)."""
        assert not self._finished
        self._finished = True
        tail = self.audio[self.win_audio_position - self._audio_base:]
        if len(tail) >= 512:  # >= one FFT window of audio
            self._ingest_audio_window(tail, last_clip=True)
        return self._process_feature_windows(last_clip=True)

    # ------------------------------------------------------------------
    def _ingest_audio_window(self, win_audio: np.ndarray,
                             last_clip: bool) -> None:
        cfg = self.cfg
        # 1. feature smoothing: drop the 3 frames whose audio is incomplete
        feats = F.logmel_masked(win_audio, cfg.sample_rate, cfg.feature_dim)
        if not last_clip:
            feats = feats[:-3]
        n_new = feats.shape[0]
        if n_new <= 0:
            return
        # 2. stack smoothing: borrow `stack_left` history frames (only that
        # many log-mel rows are ever read again — keep just the tail)
        borrow = cfg.stack_left
        src = np.concatenate([self.log_mel, feats])[-borrow - n_new:]
        stacked = F.stack_frames(src, borrow, 0)[src.shape[0] - n_new:]
        self.log_mel = src[-borrow:] if borrow else src[:0]

        # 3. subsample phase alignment: resume at the first ABSOLUTE index
        # >= `before` that is a multiple of the subsample factor — previous
        # ingests consumed exactly the multiples below `before`, and every
        # multiple in [before, before + n_new) lands in `stacked`.
        before = self.concat_len
        off = (-before) % cfg.subsample
        new_sub = stacked[off::cfg.subsample]
        self.concat_len = before + n_new
        self.subsampled = np.concatenate([self.subsampled, new_sub])
        if self.feature_log is not None:
            self.feature_log = np.concatenate([self.feature_log, new_sub])

    def _process_feature_windows(self, last_clip: bool) -> List[int]:
        if self.incremental:
            return self._process_incremental(last_clip)
        cfg = self.cfg
        # gather ready windows (their geometry is pure host-side shape
        # arithmetic), decoding every full bucket as it fills so host
        # memory stays O(bucket), not O(audio length)
        emitted: List[int] = []
        ready = []
        max_bucket = self.WINDOW_BUCKETS[-1]
        while True:
            total = self._sub_base + self.subsampled.shape[0]
            future = total - self.win_feature_position
            if future <= 0 or (not last_clip and future <= cfg.right_len):
                break
            left_frame = min(cfg.left_len, self.win_feature_position)
            start = self.win_feature_position - left_frame
            end = min(total, start + cfg.window_len)
            # frames cut off by the window cap still need their right halo
            right_frame = cfg.right_len if (end < total or not last_clip) else 0
            window = self.subsampled[start - self._sub_base:
                                     end - self._sub_base]
            n_eff = window.shape[0] - left_frame - right_frame
            if n_eff <= 0:
                break
            ready.append((window, left_frame, n_eff,
                          self.win_feature_position))
            self.win_feature_position += n_eff
            if len(ready) == max_bucket:
                emitted += self._decode_windows(ready)
                ready = []
        emitted += self._decode_windows(ready)
        # trim feature frames older than the next window's left halo
        drop = (self.win_feature_position - cfg.left_len) - self._sub_base
        if drop > 0:
            self.subsampled = self.subsampled[drop:]
            self._sub_base += drop
        return emitted

    def _decode_window(self, window: np.ndarray, left_frame: int,
                       n_eff: int, abs_start: int) -> List[int]:
        return self._decode_windows([(window, left_frame, n_eff,
                                      abs_start)])

    def _decode_windows(self, ready) -> List[int]:
        """Decode a list of ``(window, left_frame, n_eff, abs_start)``
        tuples in ceil(len/16) device calls: each group is padded up to the
        next window-count bucket and run through the stacked-scan
        program."""
        cfg = self.cfg
        if not ready:
            return []
        if self._dec_state is None:
            self._dec_state = self._predict_last(
                self.variables, self._buf, self._count)
        length = cfg.window_len
        max_bucket = self.WINDOW_BUCKETS[-1]
        emitted = []
        for base in range(0, len(ready), max_bucket):
            group = ready[base:base + max_bucket]
            k = next(b for b in self.WINDOW_BUCKETS if b >= len(group))
            windows = np.zeros((k, length, self._d), np.float32)
            left_frames = np.zeros((k,), np.int32)
            n_effs = np.zeros((k,), np.int32)  # padded rows: n_eff=0 no-ops
            for j, (window, left_frame, n_eff, _) in enumerate(group):
                assert window.shape[0] <= length
                windows[j, :window.shape[0]] = window
                left_frames[j] = left_frame
                n_effs[j] = n_eff
            (self._buf, self._count, self._dec_state, self._blank_run,
             self._emitted_any, out) = self._window_decode(
                self.variables, jnp.asarray(windows),
                jnp.asarray(left_frames), jnp.asarray(n_effs), self._buf,
                self._count, self._dec_state, self._blank_run,
                self._emitted_any)
            out = np.asarray(out)  # ONE host transfer per device call
            for j, (_, _, n_eff, abs_start) in enumerate(group):
                emitted += self._emit(out[0, j, :n_eff], out[1, j, :n_eff],
                                      abs_start, out[2, j, :n_eff])
        return emitted

    # ----- incremental (cached-encoder) feed path ---------------------
    def _advance_shadow(self, total: int, last_clip: bool) -> None:
        """Mirror the canonical window loop's feature-position bookkeeping
        (no decoding) so the final window's key clip — the one place window
        geometry reaches the numerics — is reproduced exactly under the
        same feed pattern."""
        self._shadow_pos, self._shadow_final_start = advance_window_geometry(
            self._shadow_pos, self._shadow_final_start, total, last_clip,
            self.cfg)

    def _process_incremental(self, last_clip: bool) -> List[int]:
        """Feed pending feature rows (plus, at finalize, ``right_len`` zero
        flush rows that push the last outputs through the layer pipeline) to
        the cached encoder in ``chunk_len`` steps and decode the output rows
        that emerge.  Output position p becomes decodable once the feature
        frontier reaches ``p + right_len`` — the same readiness rule as the
        canonical window path (its ``future > right_len`` gate), so token
        order and values are identical."""
        from transformer_transducer_tpu.streaming.incremental import _BIG
        cfg = self.cfg
        chunk = cfg.chunk_len
        lag = cfg.right_len
        total = self._sub_base + self.subsampled.shape[0]
        self._advance_shadow(total, last_clip)
        if total == 0:
            return []
        pend = self.subsampled[self._fed - self._sub_base:]
        if last_clip:
            # the canonical final window clips keys at its padded capacity
            key_limit = (self._shadow_final_start + cfg.window_len
                         if self._shadow_final_start is not None
                         else total + lag)
            pend = np.concatenate(
                [pend, np.zeros((lag, self._d), np.float32)])
        else:
            key_limit = int(_BIG)
        steps = []  # (rows, n_new, key_limit, valid_start, n_valid)
        p, n_pend = 0, pend.shape[0]
        if n_pend == 0:
            return []
        while p < n_pend:
            n_new = min(chunk, n_pend - p)
            rows = np.zeros((chunk, self._d), np.float32)
            rows[:n_new] = pend[p:p + n_new]
            out_start = (self._fed + p) - lag
            valid_start = max(0, -out_start)
            n_valid = max(0, min(n_new - valid_start,
                                 total - (out_start + valid_start)))
            steps.append((rows, n_new, key_limit, valid_start, n_valid,
                          out_start + valid_start))
            p += n_new
        self._fed += n_pend
        emitted: List[int] = []
        if self._dec_state is None:
            self._dec_state = self._predict_last(
                self.variables, self._buf, self._count)
        max_bucket = self.CHUNK_BUCKETS[-1]
        for base in range(0, len(steps), max_bucket):
            group = steps[base:base + max_bucket]
            k = next(b for b in self.CHUNK_BUCKETS if b >= len(group))
            xs = np.zeros((k, chunk, self._d), np.float32)
            n_news = np.zeros((k,), np.int32)
            kls = np.full((k,), int(_BIG), np.int32)
            vss = np.zeros((k,), np.int32)
            nvs = np.zeros((k,), np.int32)  # padded steps: no-ops
            for j, (rows, n_new, kl, vs, nv, _) in enumerate(group):
                xs[j], n_news[j], kls[j], vss[j], nvs[j] = \
                    rows, n_new, kl, vs, nv
            (self._cache, self._buf, self._count, self._dec_state,
             self._blank_run, self._emitted_any, out) = self._chunk_decode(
                self.variables, self._enc_stack, self._cache,
                jnp.asarray(xs), jnp.asarray(n_news), jnp.asarray(kls),
                jnp.asarray(vss), jnp.asarray(nvs), self._buf, self._count,
                self._dec_state, self._blank_run, self._emitted_any)
            out = np.asarray(out)  # ONE host transfer per device call
            for j, (_, _, _, _, nv, abs_start) in enumerate(group):
                emitted += self._emit(out[0, j, :nv], out[1, j, :nv],
                                      abs_start, out[2, j, :nv])
        # fed rows are never re-read from the host buffer
        drop = min(self._fed, total) - self._sub_base
        if drop > 0:
            self.subsampled = self.subsampled[drop:]
            self._sub_base += drop
        return emitted

    def _emit(self, toks: np.ndarray, splits: np.ndarray,
              abs_start: int, confs: np.ndarray) -> List[int]:
        emitted = []
        for idx, (tok, split) in enumerate(zip(toks, splits)):
            if tok == 0:
                continue
            if split and self.segments[-1]:
                self.segments.append([])
            self.result.append(int(tok))
            self.timestamps.append(abs_start + idx)
            self.confidences.append(float(confs[idx]))
            self.segments[-1].append(int(tok))
            emitted.append(int(tok))
            if self.on_token is not None:
                self.on_token(int(tok), bool(split))
        return emitted


def chunked_encode(model: Transducer, variables, features: np.ndarray,
                   cfg: StreamingConfig, step: Optional[int] = None,
                   fixed_len: Optional[int] = None) -> np.ndarray:
    """Chunk-by-chunk banded encoding of a full feature sequence with
    receptive-field halos.  With every window padded to ``fixed_len`` this
    equals full-sequence banded encoding at the same padded length exactly
    (property-tested) — see ``StreamingConfig.window_len`` for why the
    length must be pinned."""
    t = features.shape[0]
    step = step or max(cfg.right_len, 1)
    fixed_len = fixed_len or (cfg.left_len + step + cfg.right_len)
    left, right = cfg.left_context, cfg.right_context
    mask = context_mask(fixed_len, left, right)
    session_enc = []
    pos = 0
    while pos < t:
        end = min(pos + step + cfg.right_len, t)
        left_frame = min(cfg.left_len, pos)
        start = pos - left_frame
        right_frame = cfg.right_len if end < t else 0
        window = features[start:end]
        assert window.shape[0] <= fixed_len
        padded = np.zeros((fixed_len, features.shape[1]), dtype=np.float32)
        padded[:window.shape[0]] = window
        enc = np.asarray(model.apply(variables, jnp.asarray(padded[None]),
                                     mask, method="encode"))[0]
        effective = enc[left_frame:window.shape[0] - right_frame]
        session_enc.append(effective)
        pos += effective.shape[0]
    return np.concatenate(session_enc, axis=0)


class TrapezoidStreamingSession(StreamingSession):
    """Fixed trapezoid-window variant (reference ``audio/streamRec.py``).

    The feature window GROWS from ``min_win = pred_frame + n_layer*right`` to
    ``max_win = n_layer*left + pred_frame + n_layer*right`` by ``pred_frame``
    per step, then SLIDES by ``pred_frame`` (:65-72, 199-202).  Each step
    decodes the ``pred_frame`` frames that sit ``min_win`` from the window
    end (they have exactly the required future context; during the growth
    phase their left history is still short — v1 is approximate by design,
    which is why the reference superseded it with the dynamic-window v2).

    Divergence: the reference's v1 silently drops the audio tail when
    recording stops mid-window; ``finalize`` here decodes it (right halo 0).
    """

    def __init__(self, model, variables, cfg: StreamingConfig,
                 pred_frame: int = 18, **kwargs):
        if kwargs.get("incremental"):
            raise ValueError("the trapezoid (v1) session has no incremental "
                             "mode; use StreamingSession")
        self.pred_frame = pred_frame
        self.min_win = pred_frame + cfg.right_len
        self.max_win = cfg.left_len + pred_frame + cfg.right_len
        if cfg.window_len is None:
            cfg.window_len = -(-self.max_win // 64) * 64
        super().__init__(model, variables, cfg, **kwargs)

    def reset(self):
        super().reset()
        self.win_len = self.min_win

    def _process_feature_windows(self, last_clip: bool) -> List[int]:
        emitted = []
        while True:
            total = self._sub_base + self.subsampled.shape[0]
            if self.win_feature_position + self.win_len <= total:
                rel = self.win_feature_position - self._sub_base
                window = self.subsampled[rel:rel + self.win_len]
                eff_start = self.win_len - self.min_win
                emitted += self._decode_window(
                    window, eff_start, self.pred_frame,
                    self.win_feature_position + eff_start)
                if self.win_len < self.max_win:
                    self.win_len += self.pred_frame
                else:
                    self.win_feature_position += self.pred_frame
            elif last_clip:
                # decode the remaining tail (v1 drops it; see class docstring)
                consumed = self.win_feature_position + self.win_len - self.min_win
                if consumed >= total:
                    break
                start = max(0, self.win_feature_position)
                window = self.subsampled[start - self._sub_base:
                                         total - self._sub_base]
                eff_start = consumed - start
                n_eff = window.shape[0] - eff_start
                if n_eff <= 0:
                    break
                emitted += self._decode_window(window, eff_start, n_eff,
                                               consumed)
                self.win_feature_position = total
            else:
                break
        # the sliding window never re-reads frames before its current start
        drop = self.win_feature_position - self._sub_base
        if drop > 0:
            self.subsampled = self.subsampled[drop:]
            self._sub_base += drop
        return emitted
