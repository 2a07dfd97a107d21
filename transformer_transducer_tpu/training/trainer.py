"""Training orchestration — the reference ``train.py`` loop, TPU-native.

Flow parity (reference ``train.py:142-265``): config -> vocab -> datasets ->
model -> optimizer -> (optional checkpoint load / ``continue`` mode) ->
per-epoch [train epoch -> save split checkpoint -> greedy-decode eval with
CER + decode dump -> LR decay from ``begin_to_adjust_lr`` with early stop at
lr < 1e-6].  Metrics: per-step loss/lr/grad-norm, per-epoch CER
(``train.py:67-84,136-137``) via the JSONL writer.

TPU-native: one compiled sharded train step (mesh from
``training.num_devices``/``num_gpu``), device-side SpecAugment, fused RNN-T
loss, batched jit greedy eval instead of the per-utterance Python loop.
"""

from __future__ import annotations

import functools
import os
import shutil
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_transducer_tpu.data.dataset import AudioDataset
from transformer_transducer_tpu.data.loader import DataLoader
from transformer_transducer_tpu.decoding.greedy import greedy_decode, tokens_to_lists
from transformer_transducer_tpu.models.transducer import Transducer, build_transducer
from transformer_transducer_tpu.parallel import mesh as mesh_lib
from transformer_transducer_tpu.training import optim as optim_lib
from transformer_transducer_tpu.training.train_step import (
    TrainStepConfig, compile_train_scan, compile_train_step,
    make_eval_loss_step)
from transformer_transducer_tpu.utils import checkpoint as ckpt_lib
from transformer_transducer_tpu.utils.config import Config, dump_config
from transformer_transducer_tpu.utils.logging import MetricsWriter, init_logger
from transformer_transducer_tpu.utils.metrics import batch_cer
from transformer_transducer_tpu.utils.vocab import Vocabulary


class Trainer:
    def __init__(self, config: Config, mode: str = "retrain",
                 log_file: str = "train.log", exp_root: str = "egs",
                 compute_dtype=jnp.float32, n_data: Optional[int] = None,
                 n_model: int = 1, remat: bool = False,
                 flash: bool = False, banded: bool = False,
                 n_pipe: Optional[int] = None,
                 pipe_micro: Optional[int] = None,
                 n_seq: Optional[int] = None,
                 zero: Optional[bool] = None):
        self.config = config
        self.mode = mode
        self.exp_dir = os.path.join(exp_root, config.data.name or "exp",
                                    config.training.save_model or "model")
        os.makedirs(self.exp_dir, exist_ok=True)
        self.logger = init_logger(os.path.join(self.exp_dir, log_file))
        dump_config(config, os.path.join(self.exp_dir, "config.yaml"))

        self.metrics = (MetricsWriter(self.exp_dir)
                        if config.training.visualization else None)

        self.vocab = Vocabulary.from_file(config.data.vocab)
        self.logger.info("Loaded vocabulary: %d units", len(self.vocab))

        # model family: an espnet-schema config has a model.mask block
        # (reference config/espnet_aishell.yaml vs config/aishell.yaml)
        self.is_espnet = config.model.mask is not None
        if self.is_espnet:
            from transformer_transducer_tpu.models.espnet_variant import (
                build_espnet_transducer)
            self.model = build_espnet_transducer(config.model,
                                                 compute_dtype=compute_dtype)
        else:
            self.model = build_transducer(config.model,
                                          compute_dtype=compute_dtype,
                                          remat=remat, flash=flash,
                                          banded=banded)
        # parallel.{n_pipe, pipe_micro, n_seq, sp_window} config block
        # (CLI flags win): pipeline / sequence parallelism for the encoder,
        # composed with dp on one mesh.  Validated here so misconfiguration
        # fails at construction, not at first compile.
        pcfg = config.parallel or Config()
        self.n_pipe = int(n_pipe if n_pipe is not None
                          else (pcfg.n_pipe or 1))
        self.pipe_micro = int(pipe_micro if pipe_micro is not None
                              else (pcfg.pipe_micro or 0)) or 2 * self.n_pipe
        self.n_seq = int(n_seq if n_seq is not None else (pcfg.n_seq or 1))
        self.sp_window = int(pcfg.sp_window or 0)
        # parallel.zero: ZeRO-1 — optimizer moments shard over the data
        # axis (params/grads stay replicated); ~1/n_data moment memory per
        # device for one param-sized all-gather per step (DESIGN.md §4)
        self.zero = bool(zero if zero is not None else pcfg.zero)
        batch = config.data.batch_size or 1
        # encoder block count (pipeline stages slice it): espnet keeps it in
        # enc_kwargs, the native family in the enc tuple
        self._enc_blocks = (dict(self.model.enc_kwargs)["num_blocks"]
                            if self.is_espnet else self.model.enc[0])
        if self.n_pipe > 1:
            if n_model > 1:
                raise NotImplementedError("n_pipe composes with the data "
                                          "axis only; set n_model=1")
            if self._enc_blocks % self.n_pipe:
                raise ValueError(f"encoder blocks={self._enc_blocks} must "
                                 f"divide over {self.n_pipe} pipeline stages")
            if batch % self.pipe_micro:
                raise ValueError(f"batch_size={batch} must divide into "
                                 f"{self.pipe_micro} microbatches "
                                 f"(parallel.pipe_micro)")
        if self.n_seq > 1:
            if self.is_espnet:
                # espnet band comes from the mask block; sp shards the
                # MODEL-rate time axis (post conv subsampling, if any)
                band = (self.model.encoder_left_mask,
                        self.model.encoder_right_mask)
                if min(band) < 0:
                    raise ValueError("parallel.n_seq needs a finite espnet "
                                     "band (model.mask.encoder_*_mask >= 0)")
                t_in = config.data.max_input_length or 0
                il = dict(self.model.enc_kwargs).get("input_layer")
                from transformer_transducer_tpu.models.espnet_variant import (
                    _CONV_STACKS)
                t_max = t_in
                if il in _CONV_STACKS:
                    for k, s in _CONV_STACKS[il]:
                        t_max = (t_max - k) // s + 1
            elif self.model.band is None:
                raise ValueError("parallel.n_seq needs banded training "
                                 "(--banded, or the espnet mask block)")
            else:
                band = self.model.band
                t_max = config.data.max_input_length or 0
            if t_max % self.n_seq:
                raise ValueError(
                    f"model-rate max length {t_max} must divide over "
                    f"{self.n_seq} sequence shards (adjust "
                    f"data.max_input_length)")
            if t_max // self.n_seq < max(band):
                raise ValueError(f"sequence shard {t_max // self.n_seq} "
                                 f"must cover the band halo {band}")
        if n_data is None:
            # largest data-axis size that divides the batch (the reference's
            # DataParallel analog requires batch % replicas == 0 too); with
            # pp the MICRObatch must also divide over the data axis
            avail = len(jax.devices()) // (n_model * self.n_pipe * self.n_seq)
            per_micro = batch // self.pipe_micro if self.n_pipe > 1 else batch
            n_data = max(d for d in range(1, max(avail, 1) + 1)
                         if batch % d == 0 and per_micro % d == 0)
        self.mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model,
                                       n_pipe=self.n_pipe, n_seq=self.n_seq)
        self.logger.info("Mesh: %s", dict(self.mesh.shape))

        seed = config.training.seed or 1
        self.rng = jax.random.PRNGKey(seed)

        t_max = config.data.max_input_length
        from transformer_transducer_tpu.utils.config import stack_context
        d_in = (config.data.feature_dim or 128) * (
            1 + sum(stack_context(config.data)))
        dummy_x = jnp.zeros((1, min(t_max, 8), d_in))
        dummy_y = jnp.zeros((1, min(config.data.max_target_length, 4)),
                            dtype=jnp.int32)
        self.rng, init_rng = jax.random.split(self.rng)
        # jitted init: eager init is hundreds of per-op relay dispatches —
        # minutes of flagship startup on a remote TPU backend (CLAUDE.md)
        if self.is_espnet:
            variables = jax.jit(self.model.init)(
                init_rng, dummy_x, jnp.asarray([dummy_x.shape[1]]), dummy_y,
                jnp.asarray([dummy_y.shape[1]]))
        else:
            variables = jax.jit(self.model.init)(init_rng, dummy_x, dummy_y)
        self.params = variables["params"]
        if self.n_pipe > 1:
            # pp mode: the encoder blocks live STACKED (n_layer, ...) for the
            # whole run, the layer axis sharded over the 'pipe' mesh axis
            # (and, via opt_state_shardings, so do their optimizer moments) —
            # each stage device materializes only its own layers.  The espnet
            # family uses the MIXED layout (non-block params replicated
            # beside the "layers" stack).  Checkpoints stay in the canonical
            # per-layer format via _to/_from_canonical.
            self.params = dict(self.params)
            self.params["encoder"] = self._pp_stack_fn()(
                self.params["encoder"])

        n_total, n_enc, n_dec = self._count_params()
        self.logger.info("# parameters: total %d | encoder %d | decoder %d | "
                         "joint %d", n_total, n_enc, n_dec,
                         n_total - n_enc - n_dec)

        self.tx = optim_lib.build_optimizer(
            config.optim, max_grad_norm=config.training.max_grad_norm)
        # training.grad_accum_steps: average grads over K batches per
        # optimizer update (optax.MultiSteps) — K× the effective batch at
        # the same per-step memory.  One K-batch update equals the
        # unaccumulated step on the concatenated batch (tested), because
        # the loss is a batch mean and grad-clip/LR apply to the averaged
        # grads at update time.  Beyond reference (whose effective batch is
        # capped by GPU memory, config/aishell.yaml batch_size).
        # Step-count semantics: global_step (and therefore --save-steps and
        # the nan-guard skip counter) ticks per LOADER BATCH (mini-step),
        # not per applied optimizer update — documented in MIGRATION.md;
        # changing it would break bit-exact step_* resume compatibility.
        ga = int(config.training.grad_accum_steps or 1)
        if ga > 1:
            import optax
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=ga).gradient_transformation()
            self.logger.info("Gradient accumulation: %d batches per update",
                             ga)
        # jitted for the same reason as model.init (one program, not one
        # dispatch per param leaf)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        self.lr_ctl = optim_lib.LRController(
            lr=config.optim.lr, decay_ratio=config.optim.decay_ratio or 1.0,
            begin_to_adjust=config.optim.begin_to_adjust_lr or 0)
        self.start_epoch = 0
        self.global_step = 0
        # training.save_every_steps: mid-epoch step_* checkpoints every N
        # optimizer updates (preemption-safe resume; beyond-reference — the
        # reference can only recover at epoch granularity, train.py:249-250)
        self.save_every_steps = int(config.training.save_every_steps or 0)
        self._last_step_save = 0
        self._resume_batches = 0
        self._maybe_load()

        # training.specaug: None/absent -> on (reference default: SpecAugment
        # is unconditional in its collate path); explicit false disables it
        # (needed e.g. for memorization tests and very small corpora).
        sa = config.training.specaug
        # training.loss_remat: None/absent -> True (recompute the joint in
        # the backward pass; min memory, and measured FASTER at real shapes
        # — see ops/rnnt_loss.fused_grid_logprobs).  Explicit false stores
        # joint residuals instead; only sensible for small vocab/T.
        lr_ = config.training.loss_remat
        # training.loss_pruned_range: band width N > 0 selects the pruned
        # transducer loss (ops/rnnt_loss_pruned.py); absent = full loss.
        pr_ = config.training.loss_pruned_range
        ss_ = config.training.loss_simple_scale
        # training.nan_guard: skip (inside the compiled step) any update
        # whose loss/grad-norm is non-finite; abort after
        # training.max_skipped_steps consecutive skips (default 25) — a
        # stream of NaNs means divergence, not one bad batch.
        # data.on_device_features: the loaders ship raw padded waveforms and
        # the log-mel frontend runs inside the compiled step (and the eval
        # programs) — see AudioDataset / ops.features.extract_batch_padded.
        frontend = None
        if config.data.on_device_features:
            from transformer_transducer_tpu.utils.config import (
                stack_context as _sc, subsample_factor as _sf)
            l_, r_ = _sc(config.data)
            frontend = (config.data.feature_dim or 128, l_, r_,
                        _sf(config.data), int(config.data.max_input_length),
                        "eps")
        self.frontend = frontend
        self.step_cfg = TrainStepConfig(compute_dtype=compute_dtype,
                                        frontend=frontend,
                                        specaug=True if sa is None else bool(sa),
                                        loss_remat=True if lr_ is None else bool(lr_),
                                        loss_pruned_range=int(pr_) if pr_ else None,
                                        loss_simple_scale=0.25 if ss_ is None
                                        else float(ss_),
                                        nan_guard=bool(config.training.nan_guard),
                                        n_pipe=self.n_pipe,
                                        pipe_micro=self.pipe_micro,
                                        n_seq=self.n_seq,
                                        sp_window=self.sp_window,
                                        zero=self.zero)
        self.max_skipped_steps = int(config.training.max_skipped_steps or 25)
        self._consecutive_skips = 0
        self.total_skips = 0    # lifetime nan-guard trips (observability)
        self.train_step = compile_train_step(
            self.model, self.tx, self.mesh, self.params, self.opt_state,
            self.step_cfg)
        # training.steps_per_call > 1 scans K optimizer updates inside one
        # device program (see compile_train_scan); leftovers (< K batches at
        # epoch end) fall back to the single-step program above.
        self.steps_per_call = int(config.training.steps_per_call or 1)
        self.train_scan = (compile_train_scan(
            self.model, self.tx, self.mesh, self.params, self.opt_state,
            self.step_cfg) if self.steps_per_call > 1 else None)
        self.eval_loss_step = make_eval_loss_step(
            self.model, self.step_cfg, mesh=self.mesh, params=self.params)

    # ------------------------------------------------------------------
    def _count_params(self):
        sizes = jax.tree_util.tree_map(lambda x: int(np.prod(x.shape)), self.params)
        total = sum(jax.tree_util.tree_leaves(sizes))
        enc = sum(jax.tree_util.tree_leaves(sizes["encoder"]))
        dec = sum(jax.tree_util.tree_leaves(sizes["decoder"]))
        return total, enc, dec

    def _pp_stack_fn(self):
        """Family-dispatched encoder stack function for pp mode."""
        from transformer_transducer_tpu.parallel import pipeline as pp
        n = self._enc_blocks
        if self.is_espnet:
            return lambda enc: pp.stack_espnet_encoder_layers(enc, n)
        return lambda enc: pp.stack_encoder_layers(enc, n)

    def _pp_unstack_fn(self):
        from transformer_transducer_tpu.parallel import pipeline as pp
        return (pp.unstack_espnet_encoder_layers if self.is_espnet
                else pp.unstack_encoder_layers)

    def _to_canonical(self, tree):
        """pp mode stores the encoder stacked (pipe-sharded); checkpoints
        stay in the canonical per-layer layout so they interchange with
        dp/tp runs.  No-op when n_pipe == 1."""
        if self.n_pipe <= 1:
            return tree
        from transformer_transducer_tpu.parallel.pipeline import (
            convert_encoder_subtrees)
        return convert_encoder_subtrees(tree, self._pp_unstack_fn())

    def _from_canonical(self, tree):
        if self.n_pipe <= 1:
            return tree
        from transformer_transducer_tpu.parallel.pipeline import (
            convert_encoder_subtrees)
        return convert_encoder_subtrees(tree, self._pp_stack_fn())

    def _maybe_load(self):
        tcfg = self.config.training
        if self.mode == "continue":
            path = ckpt_lib.latest_checkpoint(self.exp_dir) or tcfg.load_model
            if not path:
                raise FileNotFoundError("continue mode but no checkpoint found")
            params_c, opt_state, meta = ckpt_lib.load_checkpoint(
                path, self._to_canonical(self.params),
                self._to_canonical(self.opt_state))
            self.params = self._from_canonical(params_c)
            if opt_state is not None:
                self.opt_state = self._from_canonical(opt_state)
            self.start_epoch = meta.get("epoch", 0) + 1
            self.global_step = meta.get("step", 0)
            self.lr_ctl.lr = meta.get("lr", self.lr_ctl.lr)
            if "mid_epoch" in meta:   # step_* checkpoint: resume IN-epoch
                self.start_epoch = int(meta["mid_epoch"])
                self._resume_batches = int(meta.get("batches_done", 0))
                self.rng = jnp.asarray(meta["rng"], jnp.uint32)
                self._last_step_save = self.global_step
                self.logger.info(
                    "Continue mid-epoch from %s (epoch %d, batch %d, "
                    "step %d)", path, self.start_epoch,
                    self._resume_batches, self.global_step)
            else:
                self.logger.info("Continue from %s (epoch %d, step %d)",
                                 path, self.start_epoch, self.global_step)
        elif tcfg.load_model:
            params_c, _, _ = ckpt_lib.load_checkpoint(
                tcfg.load_model, self._to_canonical(self.params))
            self.params = self._from_canonical(params_c)
            self.logger.info("Loaded model from %s", tcfg.load_model)
        else:
            if tcfg.load_encoder:
                enc_c = self._to_canonical({"encoder": self.params["encoder"]})
                enc_c["encoder"] = ckpt_lib.load_component(
                    tcfg.load_encoder, "encoder", enc_c["encoder"])
                self.params["encoder"] = self._from_canonical(enc_c)["encoder"]
                self.logger.info("Loaded encoder from %s", tcfg.load_encoder)
            if tcfg.load_decoder:
                self.params["decoder"] = ckpt_lib.load_component(
                    tcfg.load_decoder, "decoder", self.params["decoder"])
                self.logger.info("Loaded decoder from %s", tcfg.load_decoder)

    # ------------------------------------------------------------------
    def make_loaders(self, augment: bool = False):
        dcfg = self.config.data
        odf = bool(dcfg.on_device_features)
        train_ds = AudioDataset(dcfg, "train", self.vocab, augment=augment,
                                on_device_features=odf)
        dev_ds = AudioDataset(dcfg, "dev", self.vocab,
                              on_device_features=odf)
        shuffle = bool(dcfg.shuffle)
        if dcfg.short_first and shuffle:
            # the curriculum sort would be silently destroyed by re-
            # permuting indices every epoch; short_first wins, loudly
            self.logger.warning("data.short_first overrides data.shuffle: "
                                "training keeps the short-first curriculum "
                                "order")
            shuffle = False
        train = DataLoader(train_ds, dcfg.batch_size, shuffle=shuffle,
                           seed=self.config.training.seed or 1)
        dev = DataLoader(dev_ds, dcfg.batch_size, shuffle=False, drop_last=False)
        return train, dev

    def _current_lr(self) -> float:
        """The LR actually in effect: with a per-step schedule
        (optim.schedule) read it from the injected optimizer hyperparams;
        otherwise the epoch-level controller owns it."""
        if self.config.optim.schedule is not None:
            lr = optim_lib.get_learning_rate(self.opt_state)
            if lr is not None:
                return lr
        return self.lr_ctl.lr

    def _record_step(self, epoch, loss, grad_norm, total_loss, steps, t0):
        show = self.config.training.show_interval or 10
        showing = self.global_step % show == 0
        if self.metrics is None and not showing:
            return   # _current_lr() costs a device->host RPC per call with
                     # a step schedule -- fetch only when actually recording
        lr = self._current_lr()
        if self.metrics is not None:
            self.metrics.add_scalar("train_loss", loss, self.global_step)
            self.metrics.add_scalar("learn_rate", lr, self.global_step)
        if showing:
            dt = time.perf_counter() - t0
            self.logger.info(
                "-Training-Epoch:%d, Step:%d, lr:%.6f, GradNorm:%.4f, "
                "Loss:%.5f, AvgLoss:%.5f, %.2f steps/s", epoch,
                self.global_step, lr, grad_norm,
                loss, total_loss / steps, steps / dt)

    def _note_skips(self, skips) -> None:
        """Failure detection bookkeeping for nan_guard'd steps: warn per
        skipped update, hard-fail after ``max_skipped_steps`` consecutive
        skips (persistent non-finite losses are divergence, and silently
        treading water forever would look like training)."""
        for s in skips:
            if int(s):
                self._consecutive_skips += 1
                self.total_skips += 1
                self.logger.warning(
                    "non-finite loss/grad at step %d — update skipped "
                    "(%d consecutive)", self.global_step,
                    self._consecutive_skips)
                if self._consecutive_skips >= self.max_skipped_steps:
                    raise RuntimeError(
                        f"{self._consecutive_skips} consecutive non-finite "
                        f"training steps (training.max_skipped_steps="
                        f"{self.max_skipped_steps}): training has diverged")
            else:
                self._consecutive_skips = 0

    def train_epoch(self, epoch: int, loader) -> float:
        total_loss, steps = 0.0, 0
        t0 = time.perf_counter()
        k = self.steps_per_call
        pending = []
        # deterministic order per epoch number + mid-epoch resume offset:
        # the loader re-derives the SAME shuffle for this epoch (seed +
        # epoch) and skips the batches a step_* checkpoint already consumed
        loader.epoch = epoch
        skip = self._resume_batches
        self._resume_batches = 0
        loader.start_batch = skip

        def maybe_step_save():
            if (self.save_every_steps and self.global_step -
                    self._last_step_save >= self.save_every_steps):
                self.save_step(epoch, skip + steps)

        def run_single(batch):
            nonlocal total_loss, steps
            batch = mesh_lib.shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, m = self.train_step(
                self.params, self.opt_state, batch, step_rng)
            self.global_step += 1
            steps += 1
            loss = float(m["loss"])
            total_loss += loss
            self._record_step(epoch, loss, float(m["grad_norm"]),
                              total_loss, steps, t0)
            if "skipped" in m:
                self._note_skips([int(m["skipped"])])
            maybe_step_save()

        def run_group(group):
            nonlocal total_loss, steps
            stacked = {key: np.stack([b[key] for b in group])
                       for key in group[0]}
            stacked = mesh_lib.shard_stacked_batch(stacked, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, ms = self.train_scan(
                self.params, self.opt_state, stacked, step_rng)
            losses = np.asarray(ms["loss"], dtype=np.float64)
            norms = np.asarray(ms["grad_norm"], dtype=np.float64)
            for loss, norm in zip(losses, norms):
                self.global_step += 1
                steps += 1
                total_loss += float(loss)
                self._record_step(epoch, float(loss), float(norm),
                                  total_loss, steps, t0)
            if "skipped" in ms:
                self._note_skips(np.asarray(ms["skipped"]).tolist())
            maybe_step_save()   # at group granularity: the scanned K
                                # updates share one rng split, so resume
                                # points must align with group boundaries

        for batch in loader:
            if k <= 1:
                run_single(batch)
                continue
            pending.append(batch)
            if len(pending) == k:
                run_group(pending)
                pending = []
        for batch in pending:  # leftover tail: single-step program
            run_single(batch)
        avg = total_loss / max(steps, 1)
        self.logger.info("-Training-Epoch:%d done, AvgLoss: %.5f", epoch, avg)
        return avg

    def _eval_decode_fn(self, max_tokens: int):
        """Jitted encode+greedy for evaluation — built ONCE and cached on
        self (a fresh jit-wrapped closure per evaluate() call would
        re-trace/re-compile every epoch; compiles cost 20-200 s through the
        remote relay).  Sharded over the SAME mesh as training (batch on
        'data', params per the sharding rules) so eval scales with the mesh
        instead of running replicated on device 0."""
        cache = getattr(self, "_eval_runs", None)
        if cache is None:
            cache = self._eval_runs = {}
        if max_tokens in cache:   # cache PER token budget, not first-wins
            return cache[max_tokens]

        from transformer_transducer_tpu.parallel import sharding as sharding_lib
        pspecs = sharding_lib.param_shardings(self.params, self.mesh)
        bspec = mesh_lib.batch_sharding(self.mesh)
        rspec = mesh_lib.replicated(self.mesh)

        if self.n_pipe > 1 and not self.is_espnet:
            from transformer_transducer_tpu.parallel.pipeline import (
                encoder_layer_module, encode_pipelined_stacked)
            pp_layer = encoder_layer_module(self.model, dropout=0.0)
        elif self.n_pipe > 1:
            from transformer_transducer_tpu.parallel.pipeline import (
                encode_pipelined_espnet)

        @functools.partial(jax.jit, in_shardings=(pspecs, bspec, bspec),
                           out_shardings=rspec)
        def run(params, inputs, t_len):
            # data.on_device_features: inputs are raw padded waveforms,
            # t_len is in samples — featurize in-program like the train step
            if self.frontend is not None:
                from transformer_transducer_tpu.ops.features import (
                    extract_batch_padded)
                n_mels, l_, r_, f_, mf_, var_ = self.frontend
                inputs, t_len = extract_batch_padded(
                    inputs, t_len, mf_, n_mels=n_mels, left=l_, right=r_,
                    factor=f_, log_variant=var_)
            # espnet family: second positional arg is lengths (pad mask);
            # native family: it is the (absent) attention mask
            if self.n_pipe > 1 and self.is_espnet:
                enc, _ = encode_pipelined_espnet(
                    self.model, params["encoder"], inputs, t_len, self.mesh,
                    n_micro=self.pipe_micro, data_axis=mesh_lib.DATA_AXIS)
            elif self.n_pipe > 1:
                # pp mode keeps the encoder stacked/pipe-sharded: evaluate
                # through the same GPipe program (deterministic)
                enc = encode_pipelined_stacked(
                    pp_layer, params["encoder"], inputs, self.mesh,
                    n_micro=self.pipe_micro, data_axis=mesh_lib.DATA_AXIS)
            else:
                enc = self.model.apply({"params": params}, inputs,
                                       t_len if self.is_espnet else None,
                                       method="encode")
            # conv-subsampling input layers shorten the encoder output;
            # decode over the mapped lengths, not the input lengths
            if self.is_espnet:
                t_len = self.model.encoded_lengths(t_len, inputs.shape[1])
            # espnet family seeds the label history with sos == vocab-1
            # (tt_espnet/model.py:86); native seeds blank 0
            seed = (self.model.vocab_size - 1) if self.is_espnet else 0
            return greedy_decode(self.model, {"params": params}, enc, t_len,
                                 max_tokens=max_tokens, seed_token=seed)

        cache[max_tokens] = run
        return run

    @staticmethod
    def _pad_batch(batch, size: int):
        """Pad a partial final batch (drop_last=False) to ``size`` rows by
        repeating row 0; returns (padded, n_valid).  One compiled shape then
        serves every eval batch AND the 'data'-sharded batch axis stays
        divisible by the mesh; the padding rows' outputs are discarded."""
        n = len(batch["inputs"])
        if n >= size:
            return batch, n
        padded = {k: np.concatenate([v, np.repeat(v[:1], size - n, axis=0)])
                  for k, v in batch.items()}
        return padded, n

    def evaluate(self, epoch: int, loader, max_batches: Optional[int] = None,
                 compute_loss: bool = True) -> float:
        total_dist, total_words = 0, 0
        total_loss, loss_utts = 0.0, 0
        dump_path = os.path.join(self.exp_dir, f"decode_{epoch}.txt")
        max_tokens = self.config.data.max_target_length + 1
        batch_cap = self.config.data.batch_size or 1

        run = self._eval_decode_fn(max_tokens)

        # "w", not "a": the file is epoch-unique, and a continue-mode resume
        # that re-evaluates the same epoch must not duplicate the dump
        with open(dump_path, "w", encoding="utf-8") as dump:
            for bi, batch in enumerate(loader):
                if max_batches is not None and bi >= max_batches:
                    break
                batch, valid = self._pad_batch(batch, batch_cap)
                if compute_loss:
                    losses = np.asarray(self.eval_loss_step(
                        self.params,
                        {k: jnp.asarray(v) for k, v in batch.items()}))
                    total_loss += float(losses[:valid].sum())
                    loss_utts += valid
                tokens, counts = run(self.params, jnp.asarray(batch["inputs"]),
                                     jnp.asarray(batch["inputs_length"]))
                preds = tokens_to_lists(np.asarray(tokens),
                                        np.asarray(counts))[:valid]
                refs = [list(batch["targets"][i][:batch["targets_length"][i]])
                        for i in range(len(preds))]
                pred_txt = self.vocab.decode_batch(preds)
                ref_txt = self.vocab.decode_batch(refs)
                dist, words = batch_cer(pred_txt, ref_txt)
                total_dist += dist
                total_words += words
                for p, r in zip(pred_txt, ref_txt):
                    dump.write("Transcripts:" + "".join(r) + "\n")
                    dump.write("---Predicts:" + "".join(p) + "\n")
        cer = 100.0 * total_dist / max(total_words, 1)
        avg_loss = total_loss / max(loss_utts, 1)
        self.logger.info("-Validation-Epoch:%d, AverageLoss: %.5f, "
                         "CER: %.5f %%", epoch, avg_loss, cer)
        if self.metrics is not None:
            self.metrics.add_scalar("cer", cer, epoch)
            if loss_utts:
                self.metrics.add_scalar("eval_loss", avg_loss, epoch)
        return cer

    def save(self, epoch: int):
        path = os.path.join(self.exp_dir, f"epoch_{epoch}")
        ckpt_lib.save_checkpoint(path, self._to_canonical(self.params),
                                 self._to_canonical(self.opt_state),
                                 epoch=epoch, step=self.global_step,
                                 extra={"lr": self.lr_ctl.lr})
        # step_* recovery artifacts are redundant once the epoch lands
        ckpt_lib.prune_step_checkpoints(self.exp_dir)
        self.logger.info("Epoch %d checkpoint saved to %s", epoch, path)

    def save_step(self, epoch: int, batches_done: int):
        """Mid-epoch preemption-safe checkpoint (``step_<global_step>``).

        Carries everything an exact in-epoch resume needs: params +
        optimizer state + the data position (epoch, batches consumed of the
        deterministic per-epoch shuffle) + the live RNG key (SpecAugment
        stream).  ``-mode continue`` restores all of it and the rerun is
        step-for-step identical to an uninterrupted run
        (``tests/test_training.py``).  Only the newest step checkpoint is
        kept."""
        path = os.path.join(self.exp_dir, f"step_{self.global_step}")
        ckpt_lib.save_checkpoint(
            path, self._to_canonical(self.params),
            self._to_canonical(self.opt_state),
            # "epoch": last COMPLETED epoch, consistent with epoch_* metas
            epoch=epoch - 1, step=self.global_step,
            extra={"lr": self.lr_ctl.lr, "mid_epoch": epoch,
                   "batches_done": int(batches_done),
                   "rng": np.asarray(jax.device_get(self.rng)).tolist()})
        ckpt_lib.prune_step_checkpoints(self.exp_dir, keep=path)
        self._last_step_save = self.global_step
        self.logger.info("Step checkpoint saved to %s (epoch %d, batch %d)",
                         path, epoch, batches_done)

    def profile_epoch(self, epoch: int, loader, trace_dir: str) -> float:
        """One training epoch under ``jax.profiler.trace`` — writes a
        TensorBoard/XPlane trace (xprof) of the steps to ``trace_dir``.
        Beyond-reference observability (the reference logs wall-clock only,
        ``train.py:78-84``); some remote-backend relays cannot capture
        device traces, so failure degrades to an un-profiled epoch."""
        try:
            cm = jax.profiler.trace(trace_dir)
            cm.__enter__()
        except Exception as e:  # relay/backend without profiler support
            self.logger.warning("profiler unavailable (%s); training "
                                "unprofiled", e)
            return self.train_epoch(epoch, loader)
        try:
            # a training failure here is REAL — propagate it, never mask it
            # as a profiling warning or re-run half-applied updates
            avg = self.train_epoch(epoch, loader)
        finally:
            try:
                cm.__exit__(None, None, None)
                self.logger.info("profiler trace written to %s", trace_dir)
            except Exception as e:  # teardown-only failure: epoch is valid
                self.logger.warning("profiler teardown failed (%s); "
                                    "continuing without a trace", e)
        return avg

    def fit(self, epochs: Optional[int] = None, augment: bool = False,
            eval_batches: Optional[int] = None,
            profile_dir: Optional[str] = None):
        epochs = epochs or self.config.training.epochs
        train_loader, dev_loader = self.make_loaders(augment=augment)
        for epoch in range(self.start_epoch, epochs):
            if profile_dir and epoch == self.start_epoch:
                self.profile_epoch(epoch, train_loader, profile_dir)
            else:
                self.train_epoch(epoch, train_loader)
            # decay BEFORE save (the checkpoint must carry the LR the NEXT
            # epoch trains at, or a continue-mode resume stays one decay
            # step behind); save BEFORE evaluate (an eval failure must not
            # lose the epoch's checkpoint)
            stop = False
            if self.config.optim.schedule is None:
                if self.lr_ctl.maybe_decay(epoch):
                    self.opt_state = optim_lib.set_learning_rate(
                        self.opt_state, self.lr_ctl.lr)
                else:
                    stop = True
            self.save(epoch)
            if self.config.training.eval_or_not:
                self.evaluate(epoch, dev_loader, max_batches=eval_batches)
            if stop:
                self.logger.info("The learning rate is too low to train.")
                break
        self.logger.info("The training process is OVER!")
