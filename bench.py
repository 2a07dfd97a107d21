#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): offline encode+greedy-decode
real-time factor on the AISHELL-1 config (4-layer encoder, d_model 512,
T=410 frames = 12.3 s audio/utt at the 30 ms frame rate).  ``vs_baseline``
is the multiple of the 20x-real-time-per-chip target (BASELINE.json); the
reference itself publishes no RTF numbers (SURVEY.md §6).

Extra sub-benchmarks (train step, RNN-T loss kernel) print on stderr so the
driver contract (one stdout JSON line) holds.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

FRAME_SECONDS = 0.03  # 10 ms hop x subsample 3

# bf16 peak of the bench chip (1x TPU v5e = 197 TFLOP/s); override with
# TTX_PEAK_FLOPS when benching elsewhere
PEAK_FLOPS = float(__import__("os").environ.get("TTX_PEAK_FLOPS", 197e12))


def transducer_flops(b, t, u1, v, d=512, inner=1024, n_enc=4, n_dec=1,
                     d_ffn=1024, include_joint=True):
    """Analytic FORWARD FLOPs of the transducer at aishell-config shapes
    (multiply-add = 2 FLOPs).  The joint's ``inner x V`` matmul over every
    (t, u) lattice cell dominates (~90 % at these shapes).  The fused loss
    projects enc/dec through the concat-joint's weight halves separately
    (concat([e,d]) @ W == e @ W_top + d @ W_bot), which is what is counted.
    """
    def layer(tt):
        qkv = 2 * 3 * tt * d * d
        scores = 2 * 2 * tt * tt * d     # AC + BD rel-attention einsums
        av = 2 * tt * tt * d             # softmax @ V
        out = 2 * tt * d * d
        ffn = 2 * 2 * tt * d * d_ffn
        return qkv + scores + av + out + ffn

    enc = b * n_enc * layer(t)
    dec = b * n_dec * layer(u1)
    if not include_joint:   # encoder-only benches must not credit the
        return enc + dec    # joint's enc-projection they never run
    joint = 2 * b * (t * d * inner + u1 * d * inner + t * u1 * inner * v)
    return enc + dec + joint


def _force(out):
    """Reduce any output pytree to a host scalar with a SINGLE device->host
    transfer (the remote relay's block_until_ready is lazy; only a transfer
    truly syncs, and each transfer costs one RPC round-trip)."""
    import numpy as np
    leaves = jax.tree_util.tree_leaves(out)
    stacked = jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in leaves])
    return float(np.asarray(jnp.sum(stacked)))


def _timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def _best_of(fn, *args, repeats=3, divisor=1):
    """Compile (one forced call), then best-of-``repeats`` wall time of
    ``fn(*args)`` divided by ``divisor`` (e.g. scan chain length) — the
    shared shape of every chained sub-benchmark here (the relay's dispatch
    latency is noisy, so min-of-N is the stable statistic)."""
    _force(fn(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, (time.perf_counter() - t0) / divisor)
    return best


def bench_offline_rtf(batch=8, t=410, u_cap=43, int8=False):
    """Encoder + batched greedy decode on the aishell config.

    ``int8``: the W8A8 serving path (ops/quant.py) — s8 MXU matmuls for
    every projection, dynamic activation scales."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.decoding.greedy import greedy_decode

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    params = model.init(rng, x[:, :8], jnp.zeros((batch, 4), jnp.int32))
    if int8:
        from transformer_transducer_tpu.models.factory import to_quant
        model, params = to_quant(model, params)
    t_len = jnp.full((batch,), t)

    # params as jit ARGUMENTS (framework rule: closures bake them into the
    # serialized HLO; see DESIGN.md §3)
    @jax.jit
    def run(params, x, t_len):
        enc = model.apply(params, x, None, method=Transducer.encode)
        return greedy_decode(model, params, enc, t_len, max_tokens=u_cap)

    dt = _timeit(run, params, x, t_len, iters=5)
    audio_seconds = batch * t * FRAME_SECONDS
    return audio_seconds / dt


def bench_train_step(batch=4, t=410, u=42, n_chain=8):
    """Full fused-loss training step on the aishell config, bf16 compute.

    ``n_chain`` optimizer updates run as ONE device program (``lax.scan``,
    the ``training.steps_per_call`` production path), so the relay's
    25-100 ms per-call dispatch amortizes away and the number reflects chip
    throughput — exactly what a pipelined/scanned training loop achieves.
    """
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, 4334)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": jnp.full((batch,), t),
               "targets_length": jnp.full((batch,), u)}
    params = model.init(rng, x[:, :8], y[:, :4])["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2.5e-4, "momentum": 0.9}), 200.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, TrainStepConfig(
        compute_dtype=jnp.bfloat16, loss_chunk_size=16))

    @jax.jit
    def chain(p, o, batch_d):
        def body(carry, i):
            p, o, m = step(carry[0], carry[1], batch_d,
                           jax.random.fold_in(jax.random.PRNGKey(2), i))
            return (p, o), m["loss"]
        (p, o), losses = jax.lax.scan(body, (p, o), jnp.arange(n_chain))
        return losses[-1]

    return _best_of(chain, params, opt_state, batch_d,
                    divisor=n_chain) * 1e3  # ms/step


def bench_encode_int8_ms(batch=16, t=410, n_chain=64):
    """Encoder-only chain time, bf16 vs int8 (W8A8), same shapes as
    bench_encode_mfu — isolates the s8-MXU win on the projection matmuls
    (the attention einsums stay bf16 in both)."""
    from transformer_transducer_tpu.models.factory import to_quant
    from transformer_transducer_tpu.models.transducer import Transducer

    def run(int8):
        model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                           dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                           compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (batch, t, 512))
        params = model.init(rng, x[:1, :8], jnp.zeros((1, 4), jnp.int32))
        if int8:
            model, params = to_quant(model, params)

        @jax.jit
        def chain(params, x):
            def body(c, _):
                out = model.apply(params, c, None, method=Transducer.encode)
                return out * 1e-3 + x, None
            out, _ = jax.lax.scan(body, x, None, length=n_chain)
            return jnp.sum(out)

        return _best_of(chain, params, x, divisor=n_chain) * 1e3

    return run(False), run(True)


def bench_encode_mfu(batch=16, t=410, n_chain=64):
    """Encoder-only MFU at a saturating batch (aishell config, bf16).

    ``n_chain`` encoder applications chain inside one program (the output is
    d_model-sized like the input, so each feeds the next) — a single encode
    is ~4 ms of chip time, far below the relay dispatch floor; 64
    applications keep the residual per-call dispatch share under ~10 %
    (the round-2 16-chains under-reported MFU by ~25 %).  See DESIGN.md
    §2a for the measured roofline decomposition of this number.
    """
    from transformer_transducer_tpu.models.transducer import Transducer

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    params = model.init(rng, x[:1, :8], jnp.zeros((1, 4), jnp.int32))

    @jax.jit
    def chain(params, x):
        def body(c, _):
            out = model.apply(params, c, None, method=Transducer.encode)
            return out * 1e-3 + x, None
        out, _ = jax.lax.scan(body, x, None, length=n_chain)
        return jnp.sum(out)

    best = _best_of(chain, params, x, divisor=n_chain)
    flops = transducer_flops(batch, t, 0, 0, include_joint=False)
    return flops / best / PEAK_FLOPS


def bench_train_step_espnet(batch=4, t=410, u=42, n_chain=8):
    """ESPnet-family training step (configs/espnet_aishell.yaml shapes:
    8-block encoder, 2-block text encoder, additive joint, vocab 4233),
    scan-chained like bench_train_step."""
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config, load_config

    cfg = load_config("configs/espnet_aishell.yaml")
    model = build_espnet_transducer(cfg.model, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, 4233)
    t_len = jnp.full((batch,), t)
    u_len = jnp.full((batch,), u)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": t_len, "targets_length": u_len}
    params = model.init(rng, x[:1, :8], t_len[:1] * 0 + 8, y[:1, :4],
                        u_len[:1] * 0 + 4)["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2.5e-4, "momentum": 0.9}), 200.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, TrainStepConfig(
        compute_dtype=jnp.bfloat16, loss_chunk_size=16))

    @jax.jit
    def chain(p, o, batch_d):
        def body(carry, i):
            p, o, m = step(carry[0], carry[1], batch_d,
                           jax.random.fold_in(jax.random.PRNGKey(2), i))
            return (p, o), m["loss"]
        (p, o), losses = jax.lax.scan(body, (p, o), jnp.arange(n_chain))
        return losses[-1]

    return _best_of(chain, params, opt_state, batch_d, divisor=n_chain) * 1e3


def bench_train_step_flagship(batch=4, t=410, u=42, n_chain=4,
                              pruned_range=None):
    """Training step at the FLAGSHIP streaming geometry — the reference's
    actual product model (``config/joint_streaming.yaml:22-44``): 18-layer
    encoder (d_inner 2048), 2-layer label encoder, joint inner 2048, vocab
    6485 — bf16, scan-chained like ``bench_train_step``.  Returns
    (ms_per_step, mfu).

    ``pruned_range=N``: the pruned transducer loss (width-N label band,
    ops/rnnt_loss_pruned.py).  The returned MFU still counts FULL-grid
    model FLOPs (pruning is a work REDUCTION; utilization of the smaller
    workload is not comparable) — read the ms, not the MFU, for this
    variant."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    v = 6485
    model = Transducer(vocab_size=v, enc=(18, 410, 8, 512, 64, 2048),
                       dec=(2, 42, 8, 512, 64, 2048), joint_inner=2048,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, v)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": jnp.full((batch,), t),
               "targets_length": jnp.full((batch,), u)}
    params = model.init(rng, x[:1, :8], y[:1, :4])["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2e-4, "momentum": 0.9}), 200.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, TrainStepConfig(
        compute_dtype=jnp.bfloat16, loss_chunk_size=16,
        loss_pruned_range=pruned_range))

    @jax.jit
    def chain(p, o, batch_d):
        def body(carry, i):
            p, o, m = step(carry[0], carry[1], batch_d,
                           jax.random.fold_in(jax.random.PRNGKey(2), i))
            return (p, o), m["loss"]
        (p, o), losses = jax.lax.scan(body, (p, o), jnp.arange(n_chain))
        return losses[-1]

    ms = _best_of(chain, params, opt_state, batch_d, divisor=n_chain) * 1e3
    flops = 3 * transducer_flops(batch, t, u + 1, v, inner=2048, n_enc=18,
                                 n_dec=2, d_ffn=2048)
    return ms, flops / (ms / 1e3) / PEAK_FLOPS


def _flagship_streaming_parts():
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    model = Transducer(vocab_size=6485, enc=(18, 410, 8, 512, 64, 2048),
                       dec=(2, 42, 8, 512, 64, 2048), joint_inner=2048,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 512)),
                           jnp.zeros((1, 4), jnp.int32))
    # flagship halos: 18 layers x 10/2 = 180 left / 36 right frames
    cfg = StreamingConfig(left_context=10, right_context=2, n_layer=18,
                          feature_dim=128)
    return model, variables, cfg


def _pin_gate_density(model, variables, enc_rows, density):
    """Zero the joint's dec-side weights (the greedy/beam gate becomes a
    pure per-frame function — a constant bias cannot pin a random-weight
    model's rate, measured swinging 0-100 % as the label state drifts)
    and set the blank bias at the (1-density)-quantile of the gate margin
    over ``enc_rows`` (N, D): the gate then fires on ~``density`` of
    frames with identical compute shapes.  Shared by the beam and
    streaming controlled-density benches."""
    joint = variables["params"]["joint"]
    w1 = joint["forward_layer"]["kernel"]
    d_enc = w1.shape[0] // 2
    joint["forward_layer"]["kernel"] = w1.at[d_enc:].set(0.0)
    dec0 = model.apply(variables, jnp.zeros((1, 1), jnp.int32), None,
                       method="predict")[:, 0]
    logits = model.apply(
        variables, enc_rows,
        jnp.broadcast_to(dec0, (enc_rows.shape[0], dec0.shape[-1])),
        method="joint_logits")
    diff = jnp.max(logits[:, 1:], axis=-1) - logits[:, 0]
    bias = float(jnp.quantile(diff.astype(jnp.float32), 1.0 - density))
    joint["project_layer"]["bias"] = \
        joint["project_layer"]["bias"].at[0].add(bias)
    return variables


def _controlled_density_variables(model, variables, wav, cfg,
                                  density=0.15):
    """Streaming variant of the density rig: calibrate the gate margin on
    the session's OWN feature distribution (banded encode of the bench
    audio's log-mel pipeline)."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.ops import features_np as F
    from transformer_transducer_tpu.ops.masks import context_mask

    feats = F.subsample(F.stack_frames(
        F.logmel_masked(wav[:16000 * 8], 16000, cfg.feature_dim),
        cfg.stack_left, 0), cfg.subsample)
    t = min(feats.shape[0], 256)
    x = jnp.asarray(feats[None, :t])
    mask = context_mask(t, cfg.left_context, cfg.right_context)
    enc = model.apply(variables, x, mask, method=Transducer.encode)[0]
    return _pin_gate_density(model, variables, enc, density)


def bench_streaming_rtf_flagship(seconds=30, incremental=False,
                                 emission_density=None,
                                 measure_cadence=True):
    """Warm streaming RTF + cadence at the FLAGSHIP config (18-layer
    encoder, 180/36-frame halos — ``audio/streamRec_unlimit_dynamic_window
    .py:56-62``); same two regimes as ``bench_streaming_rtf``.

    ``incremental=True`` uses the cached-encoder session
    (``streaming/incremental.py``): O(new frames) encoder work per step
    instead of re-encoding the 180+36-frame halo around every ~33 new
    frames (~a 7.6x FLOP redundancy at this geometry).

    ``emission_density=None`` keeps the random-init joint (greedy emits on
    ~every frame — the emission loop's worst case); 0.15 pins the gate at
    the trained-model serving rate via ``_controlled_density_variables``."""
    import numpy as np
    from transformer_transducer_tpu.streaming.session import StreamingSession

    model, variables, cfg = _flagship_streaming_parts()
    rs = np.random.RandomState(0)
    wav = (rs.randn(16000 * seconds) * 3000).astype("int16")
    if emission_density is not None:
        variables = _controlled_density_variables(model, variables, wav,
                                                  cfg, emission_density)
    session = StreamingSession(model, variables, cfg, incremental=incremental)
    session.accept_waveform(wav)
    session.finalize()
    dt = 1e9
    for _ in range(3):
        session.reset()
        t0 = time.perf_counter()
        session.accept_waveform(wav)
        session.finalize()
        dt = min(dt, time.perf_counter() - t0)
    if not measure_cadence:   # throughput-only callers skip the per-window
        return seconds / dt, None           # regime (its compiles + ~60
    # per-relay-dispatch calls are minutes of dead work otherwise)
    # warm the per-window regime's own program sizes too (the 1-window/
    # 1-chunk buckets never compile during the stacked full-wave passes —
    # without this the first cadence window pays a multi-second compile)
    session.reset()
    for i in range(0, len(wav), cfg.audio_step):
        session.accept_waveform(wav[i:i + cfg.audio_step])
    session.finalize()
    session.reset()
    # per-window latency DISTRIBUTION (serving-SLO numbers: the relay's
    # dispatch tail hides behind a mean) + first-token latency measured
    # from the first audio hitting the session
    lats = []
    first_token_ms = None
    t_start = time.perf_counter()
    for i in range(0, len(wav), cfg.audio_step):
        t0 = time.perf_counter()
        session.accept_waveform(wav[i:i + cfg.audio_step])
        lats.append((time.perf_counter() - t0) * 1e3)
        if session.result and first_token_ms is None:
            first_token_ms = (time.perf_counter() - t_start) * 1e3
    session.finalize()
    lat_stats = _latency_stats(lats, first_token_ms)
    return seconds / dt, lat_stats


def _latency_stats(lats_ms, first_token_ms=None):
    """{mean, p50, p95, p99[, first_token_ms]} of a latency sample (ms) —
    the serving-SLO shape (VERDICT r3 #7): the relay's dispatch tail hides
    behind a mean."""
    import numpy as np
    a = np.asarray(lats_ms, np.float64)
    out = {"mean": round(float(a.mean()), 2),
           "p50": round(float(np.percentile(a, 50)), 2),
           "p95": round(float(np.percentile(a, 95)), 2),
           "p99": round(float(np.percentile(a, 99)), 2)}
    if first_token_ms is not None:
        out["first_token_ms"] = round(float(first_token_ms), 2)
    return out


def bench_multistream_cadence_flagship(n_streams=8, n_rounds=30,
                                       incremental=False):
    """LIVE multi-stream serving-round latency distribution at the flagship
    config: every stream receives one audio window per round (the mic
    regime — no drain stacking possible), one fused ``process()`` call per
    round.  Returns ``_latency_stats`` of the per-round wall times — the
    p50/p95/p99 a serving SLO is written against."""
    import numpy as np
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)

    model, variables, cfg = _flagship_streaming_parts()
    session = BatchedStreamingSession(model, variables, cfg, n_streams,
                                      incremental=incremental)
    rs = np.random.RandomState(0)
    step = cfg.audio_step
    wavs = [(rs.randn(step * (n_rounds + 2)) * 3000).astype("int16")
            for _ in range(n_streams)]

    def feed(r):
        for i, w in enumerate(wavs):
            session.accept_waveform(i, w[r * step:(r + 1) * step])
        return session.process()

    for r in range(3):   # warm: compiles + first-round buckets
        feed(r)
    lats = []
    for r in range(3, n_rounds + 2):
        t0 = time.perf_counter()
        feed(r)
        lats.append((time.perf_counter() - t0) * 1e3)
    return _latency_stats(lats)


def bench_multistream_flagship(n_streams=8, seconds=30, incremental=False):
    """8-stream aggregate serving throughput at the FLAGSHIP config.

    ``incremental=True``: cached-encoder rounds — O(new frames) encoder
    work per stream AND a ~40-slot greedy scan per round instead of the
    window path's 256 (see streaming/batched.py)."""
    import numpy as np
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)

    model, variables, cfg = _flagship_streaming_parts()
    session = BatchedStreamingSession(model, variables, cfg, n_streams,
                                      incremental=incremental)
    rs = np.random.RandomState(0)
    wavs = [(rs.randn(16000 * seconds) * 3000).astype("int16")
            for _ in range(n_streams)]

    def run():
        session.reset()
        for i, w in enumerate(wavs):
            session.accept_waveform(i, w)
            session.finalize(i)
        session.run_to_completion()

    run()
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    return n_streams * seconds / dt


def bench_rnnt_loss_cpu_ms(batch=4, t=410, u=42, v=4334):
    """CPU fwd+bwd time of the SAME fused RNN-T loss at matched shapes — the
    denominator for the ">=5x CPU warp-rnnt" north star (BASELINE.md:25).
    Neither ``warprnnt_pytorch`` nor ``torchaudio`` is installed in this
    image (and installs are disallowed), so the repo's own XLA lattice
    compiled for CPU is the closest available stand-in, run in a fresh
    subprocess (this process owns the TPU backend).  Single timed iteration
    after a compile+warmup pass — CPU runs are seconds, not ms."""
    import os
    import subprocess

    code = f"""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from transformer_transducer_tpu.ops.rnnt_loss import rnnt_loss_fused
b, t, u, v, d, inner = {batch}, {t}, {u}, {v}, 512, 1024
rng = jax.random.PRNGKey(0)
enc = jax.random.normal(rng, (b, t, d))
dec = jax.random.normal(rng, (b, u + 1, d))
y = jax.random.randint(jax.random.PRNGKey(1), (b, u), 1, v)
jp = tuple(jax.random.normal(jax.random.PRNGKey(i), s) * 0.05
           for i, s in enumerate([(d, inner), (d, inner), (inner,),
                                  (inner, v), (v,)]))
t_len = jnp.full((b,), t)
u_len = jnp.full((b,), u)
grad_fn = jax.jit(jax.grad(lambda e, d_, jp_: rnnt_loss_fused(
    e, d_, jp_, y, t_len, u_len, chunk_size=16)))
grad_fn(enc, dec, jp)[0].block_until_ready()
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    grad_fn(enc, dec, jp)[0].block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(best * 1e3)
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(
                             os.path.abspath(__file__)) or ".")
    if out.returncode != 0:
        print("cpu loss bench failed:", out.stderr[-500:], file=sys.stderr)
        return None
    return float(out.stdout.strip().splitlines()[-1])


def bench_beam_rtf(batch=8, t=410, width=5, emission_density=None,
                   flagship=False):
    """Encoder + width-5 batched beam search (the reference's beam decode,
    ``tt/model.py:110-179``) on the aishell config (or the 18-layer
    flagship ``joint_streaming`` geometry with ``flagship=True``).

    ``emission_density=None`` keeps the random-init joint, whose gate argmax
    is almost NEVER blank (1/V odds) — every frame expands, the worst case
    for the emission-jump search.  Real trained models emit on ~10-20 % of
    frames (see streaming/session.py), so ``emission_density=0.15`` builds a
    CONTROLLED-density variant: the joint's dec-side weights are zeroed
    (making the gate a pure per-frame function — a constant blank bias
    cannot pin the rate of a random-weight model, measured swinging
    0-100 % as the label state drifts) and the blank bias is set to the
    (1-density)-quantile so the gate fires on exactly ~15 % of frames at
    every decode state.  Compute shapes/FLOPs are unchanged."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.decoding.beam import beam_search_batched

    if flagship:
        model = Transducer(vocab_size=6485, enc=(18, 410, 8, 512, 64, 2048),
                           dec=(2, 42, 8, 512, 64, 2048), joint_inner=2048,
                           compute_dtype=jnp.bfloat16)
    else:
        model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                           dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    variables = model.init(rng, x[:, :8], jnp.zeros((batch, 4), jnp.int32))
    t_len = jnp.full((batch,), t)

    if emission_density is not None:
        enc = model.apply(variables, x, None, method=Transducer.encode)
        variables = _pin_gate_density(model, variables,
                                      enc.reshape(batch * t, -1),
                                      emission_density)

    @jax.jit
    def run(variables, x, t_len):
        enc = model.apply(variables, x, None, method=Transducer.encode)
        return beam_search_batched(model, variables, enc, t_len,
                                   beam_width=width)

    dt = _timeit(run, variables, x, t_len, iters=3)
    return batch * t * FRAME_SECONDS / dt


def bench_rnnt_loss(batch=4, t=410, u=42, v=4334, n_chain=8):
    """Fused joint+lattice fwd+bwd from encoder/decoder states,
    scan-chained so the number is chip time rather than relay dispatch."""
    from transformer_transducer_tpu.ops.rnnt_loss import rnnt_loss_fused

    rng = jax.random.PRNGKey(0)
    d, inner = 512, 1024
    enc = jax.random.normal(rng, (batch, t, d))
    dec = jax.random.normal(rng, (batch, u + 1, d))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, v)
    jp = tuple(jax.random.normal(jax.random.PRNGKey(i), s) * 0.05
               for i, s in enumerate([(d, inner), (d, inner), (inner,),
                                      (inner, v), (v,)]))
    t_len = jnp.full((batch,), t)
    u_len = jnp.full((batch,), u)

    grad_fn = jax.grad(lambda e, d_, jp_: rnnt_loss_fused(
        e, d_, jp_, y, t_len, u_len, chunk_size=16,
        compute_dtype=jnp.bfloat16))

    @jax.jit
    def chain(enc, dec, jp):
        def body(c, _):
            return c + grad_fn(c, dec, jp) * 1e-3, None
        out, _ = jax.lax.scan(body, enc, None, length=n_chain)
        return jnp.sum(out)

    return _best_of(chain, enc, dec, jp, divisor=n_chain) * 1e3


def bench_streaming_rtf(seconds=30):
    """Warm single-stream streaming-session performance on the aishell
    config, two regimes:

    * **throughput** (the headline RTF) — the whole waveform is available
      (file decoding / faster-than-realtime source): the session stacks all
      ready ~1 s windows into one scan program, so the relay's per-call
      dispatch latency (~25-100 ms) amortizes over up to 16 windows/call;
    * **cadence latency** — audio fed in ~1-window steps (mic regime): one
      device call per window; reports ms per window (window hop is ~0.97 s
      of audio, so RTF_cadence = 970 / latency_ms).
    """
    import numpy as np
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 512)),
                           jnp.zeros((1, 4), jnp.int32))
    cfg = StreamingConfig(left_context=10, right_context=2, n_layer=4,
                          feature_dim=128)
    session = StreamingSession(model, variables, cfg)
    rs = np.random.RandomState(0)
    wav = (rs.randn(16000 * seconds) * 3000).astype("int16")
    # throughput: warm-up pass (compiles), then best of 3 timed passes (the
    # relay's dispatch latency is noisy — single-pass numbers swing 2-5x)
    session.accept_waveform(wav)
    session.finalize()
    dt = 1e9
    for _ in range(3):
        session.reset()
        t0 = time.perf_counter()
        session.accept_waveform(wav)
        session.finalize()
        dt = min(dt, time.perf_counter() - t0)
    # cadence: one audio window per accept_waveform call.  Warm this
    # regime's own program sizes first (the 1-window bucket may never
    # compile during the stacked full-wave passes)
    session.reset()
    for i in range(0, len(wav), cfg.audio_step):
        session.accept_waveform(wav[i:i + cfg.audio_step])
    session.finalize()
    session.reset()
    t0 = time.perf_counter()
    n_win = 0
    for i in range(0, len(wav), cfg.audio_step):
        session.accept_waveform(wav[i:i + cfg.audio_step])
        n_win += 1
    session.finalize()
    lat_ms = (time.perf_counter() - t0) / n_win * 1e3
    return seconds / dt, lat_ms


def bench_streaming_rtf_espnet(seconds=30):
    """Warm single-stream streaming RTF for the ESPnet family
    (configs/espnet_aishell.yaml geometry: 8 rel-pos blocks, d=512,
    additive joint, vocab 4233) — the one family x config pairing the
    other streaming benches don't cover.  Throughput regime only (stacked
    ready windows, same program structure as bench_streaming_rtf)."""
    import os

    import numpy as np
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)
    from transformer_transducer_tpu.utils.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs", "espnet_aishell.yaml"))
    model = build_espnet_transducer(cfg.model, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 512)), jnp.asarray([8]),
                           jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    scfg = StreamingConfig.from_config(cfg)
    session = StreamingSession(model, variables, scfg)
    rs = np.random.RandomState(0)
    wav = (rs.randn(16000 * seconds) * 3000).astype("int16")
    session.accept_waveform(wav)
    session.finalize()
    dt = 1e9
    for _ in range(3):
        session.reset()
        t0 = time.perf_counter()
        session.accept_waveform(wav)
        session.finalize()
        dt = min(dt, time.perf_counter() - t0)
    return seconds / dt


def bench_multistream(n_streams=8, seconds=30):
    """Aggregate serving throughput: N concurrent streaming sessions on one
    chip via ``BatchedStreamingSession`` (one fused device program per round,
    all streams' windows + greedy scans advance together).  Returns aggregate
    x-realtime: N x seconds of audio over wall time."""
    import numpy as np
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 512)),
                           jnp.zeros((1, 4), jnp.int32))
    cfg = StreamingConfig(left_context=10, right_context=2, n_layer=4,
                          feature_dim=128)
    session = BatchedStreamingSession(model, variables, cfg, n_streams)
    rs = np.random.RandomState(0)
    wavs = [(rs.randn(16000 * seconds) * 3000).astype("int16")
            for _ in range(n_streams)]

    def run():
        session.reset()
        for i, w in enumerate(wavs):
            session.accept_waveform(i, w)
            session.finalize(i)
        session.run_to_completion()

    run()  # warm-up/compile
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    return n_streams * seconds / dt


def bench_multistream_espnet(n_streams=8, seconds=30, incremental=False):
    """8-stream aggregate serving throughput for the ESPnet family
    (configs/espnet_aishell.yaml geometry).  ``incremental=True`` uses the
    round-4 shift-invariant cached-encoder rounds
    (streaming/incremental.py::_espnet_layer_step) — the multi-stream win
    the espnet family was denied in round 3."""
    import os

    import numpy as np
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig
    from transformer_transducer_tpu.utils.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs", "espnet_aishell.yaml"))
    model = build_espnet_transducer(cfg.model, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 8, 512)), jnp.asarray([8]),
                           jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    scfg = StreamingConfig.from_config(cfg)
    session = BatchedStreamingSession(model, variables, scfg, n_streams,
                                      incremental=incremental)
    rs = np.random.RandomState(0)
    wavs = [(rs.randn(16000 * seconds) * 3000).astype("int16")
            for _ in range(n_streams)]

    def run():
        session.reset()
        for i, w in enumerate(wavs):
            session.accept_waveform(i, w)
            session.finalize(i)
        session.run_to_completion()

    run()
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    return n_streams * seconds / dt


def bench_banded_attention(t=2048, b=4, h=8, dh=64, n_apply=50):
    """Pallas banded kernel vs dense masked attention, amortized inside one
    jit (the relay's per-call latency would swamp single ops)."""
    import numpy as np
    from transformer_transducer_tpu.ops.pallas.banded_attention import (
        banded_attention)
    from transformer_transducer_tpu.models.attention import rel_shift
    from transformer_transducer_tpu.ops.masks import context_mask

    def dense(q, k, v, re, u, rb):
        ac = jnp.einsum("bind,bjnd->bnij", q + u[None, None], k)
        bd = rel_shift(jnp.einsum("bind,jnd->bnij", q, re)
                       + rb.T[None, :, None, :])
        scores = jnp.where(context_mask(t, 10, 2)[None, None], -1e30,
                           (ac + bd) / (dh ** 0.5))
        return jnp.einsum("bnij,bjnd->bind",
                          jax.nn.softmax(scores, axis=-1), v)

    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype("float32") * 0.3)
    args = (mk(b, t, h, dh), mk(b, t, h, dh), mk(b, t, h, dh),
            mk(t, h, dh), mk(h, dh), mk(t, h))

    def chain(f):
        def run(q, k, v, re, u, rb):
            def body(c, _):
                return f(c, k, v, re, u, rb) * 1e-3 + c, None
            out, _ = jax.lax.scan(body, q, None, length=n_apply)
            return jnp.sum(out)
        return jax.jit(run)

    def timed(f):
        import numpy as np
        np.asarray(f(*args))
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return (time.perf_counter() - t0) / n_apply * 1e3

    return timed(chain(dense)), timed(chain(
        lambda q, k, v, re, u, rb: banded_attention(q, k, v, re, u, rb, 10, 2)))


def _synth_wav_corpus(root, n=256, dur_s=12.3, sr=16000, seed=0):
    """A real-corpus stand-in ON DISK: ``n`` int16 mono WAV files of
    ``dur_s`` seconds (12.3 s = T=410 frames at the 30 ms rate, the bench
    shape) + a ``file_path,label`` manifest + a vocab — so the input
    pipeline is measured with genuine file I/O + wav decode + featurize +
    pad, not device-resident arrays (VERDICT r3 weak #2).  Idempotent."""
    import os
    import wave as wavemod

    import numpy as np

    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    manifest = os.path.join(root, "train.csv")
    vocab_path = os.path.join(root, "vocab.txt")
    chars = [chr(c) for c in range(0x4e00, 0x4e00 + 200)]
    done = os.path.join(root, f".done_{n}_{dur_s}")
    if not os.path.exists(done):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            x = rng.normal(0, 3000, int(sr * dur_s)).astype(np.int16)
            p = os.path.join(root, "wav", f"{i:04d}.wav")
            with wavemod.open(p, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(x.tobytes())
            label = "".join(rng.choice(chars,
                                       size=int(rng.integers(12, 30))))
            rows.append((p, label))
        with open(manifest, "w") as f:
            f.write("file_path,label\n")
            for p, l in rows:
                f.write(f"{p},{l}\n")
        with open(vocab_path, "w") as f:
            f.write("<b> 0\n")
            for j, c in enumerate(chars):
                f.write(f"{c} {j + 1}\n")
        open(done, "w").close()
    return manifest, vocab_path


def _wav_loader(batch=32, n=256, dur_s=12.3, num_workers=8,
                max_target_length=42, on_device_features=False):
    import os

    from transformer_transducer_tpu.data.dataset import AudioDataset
    from transformer_transducer_tpu.data.loader import DataLoader
    from transformer_transducer_tpu.utils.config import Config
    from transformer_transducer_tpu.utils.vocab import Vocabulary

    root = os.path.join("/tmp", "ttx_bench_corpus")
    manifest, vocab_path = _synth_wav_corpus(root, n=n, dur_s=dur_s)
    cfg = Config({"train": manifest, "feature_dim": 128,
                  "left_context_width": 3, "right_context_width": 0,
                  "frame_rate": 30, "max_input_length": 410,
                  "max_target_length": max_target_length})
    ds = AudioDataset(cfg, "train", Vocabulary.from_file(vocab_path),
                      on_device_features=on_device_features)
    return DataLoader(ds, batch_size=batch, shuffle=True,
                      num_workers=num_workers, drop_last=True)


def bench_input_pipeline(batch=32, n=256, dur_s=12.3,
                         on_device_features=False):
    """HOST-side Dataset -> loader throughput on WAV files on disk:
    (utts/s, audio-seconds/s).  The number to hold against the chip's
    demand (utts/s of the train-step rows): the reference kept its GPU fed
    with 12 worker processes (/root/reference/train.py:174-177); here the
    loader is a thread pool over the GIL-releasing numpy/native featurizer,
    so feed rate scales ~per-core — this box has ONE core, so this is the
    per-core floor, not the multi-core ceiling.  With
    ``on_device_features`` the host does file I/O + pad only (the frontend
    moves into the compiled step), which multiplies the per-core feed
    rate."""
    loader = _wav_loader(batch=batch, n=n, dur_s=dur_s,
                         on_device_features=on_device_features)
    it = iter(loader)     # warm: mel cache, page cache
    next(it)
    del it
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        n_utts = sum(b["inputs"].shape[0] for b in loader)
        best = max(best, n_utts / (time.perf_counter() - t0))
    return best, best * dur_s


def bench_train_flagship_real_io(batch=32, n=256, dur_s=12.3, k_chain=2,
                                 on_device_features=False):
    """END-TO-END flagship training throughput with REAL file I/O (utts/s):
    WAVs on disk -> prefetching loader (decode + featurize + pad on host
    threads) -> device transfer -> scan-chained flagship train step
    (``training.steps_per_call`` production path), loader and chip
    overlapped exactly as ``Trainer.train_epoch`` does.  Compare with the
    synthetic-input ``train_step_ms_flagship`` rows: the gap is the host
    pipeline + transfer cost that device-resident benches hide."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    v = 6485
    t, u = 410, 42
    model = Transducer(vocab_size=v, enc=(18, 410, 8, 512, 64, 2048),
                       dec=(2, 42, 8, 512, 64, 2048), joint_inner=2048,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 512))
    params = model.init(rng, x0, jnp.zeros((1, 4), jnp.int32))["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2e-4, "momentum": 0.9}), 200.0)
    opt_state = tx.init(params)
    frontend = ((128, 3, 0, 3, 410, "eps") if on_device_features else None)
    step = make_train_step(model, tx, TrainStepConfig(
        compute_dtype=jnp.bfloat16, loss_chunk_size=16, frontend=frontend))

    @jax.jit
    def chain(p, o, batches, rng):
        def body(carry, xs):
            b, r = xs
            p, o, m = step(carry[0], carry[1], b, r)
            return (p, o), m["loss"]
        (p, o), losses = jax.lax.scan(body, (p, o), (batches, rng))
        return p, o, losses[-1]

    def stack(bs):
        import numpy as np
        # host-featurized mode ships features bf16 (the step casts inputs
        # to bf16 at entry anyway, so pre-casting halves the host->device
        # payload with identical training semantics); on-device mode ships
        # int16 samples untouched
        cast = (lambda a: a) if on_device_features else (
            lambda a: a.astype(jnp.bfloat16))
        cat = {k: (cast(np.stack([b[k] for b in bs]))
                   if k == "inputs" else np.stack([b[k] for b in bs]))
               for k in bs[0]}
        return {k: jnp.asarray(v) for k, v in cat.items()}

    loader = _wav_loader(batch=batch, n=n, dur_s=dur_s,
                         on_device_features=on_device_features)
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(3), i)
                      for i in range(k_chain)])

    def epoch():
        nonlocal params, opt_state
        n_utts = 0
        pend = []
        last = None
        for b in loader:
            pend.append(b)
            if len(pend) == k_chain:
                dev = stack(pend)        # async transfer starts while the
                pend = []                # previous chain still computes
                if last is not None:     # force the PREVIOUS chain only:
                    _force(last[2])      # loader prefetch overlaps the chip
                params, opt_state, loss = chain(params, opt_state, dev, rngs)
                last = (params, opt_state, loss)
                n_utts += batch * k_chain
        _force(last[2])
        return n_utts

    epoch()   # compile + warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        n_utts = epoch()
        best = max(best, n_utts / (time.perf_counter() - t0))
    return best


def _note(name):
    """Per-bench progress marker (stderr): the full suite is ~an hour of
    mostly remote compiles — a stalled run should be diagnosable."""
    print(f"[bench] {name} @ {time.strftime('%H:%M:%S')}",
          file=sys.stderr, flush=True)


def main():
    backend = jax.default_backend()
    _note("offline_rtf")
    rtf = bench_offline_rtf()
    _note("offline_rtf int8")
    rtf_int8 = bench_offline_rtf(int8=True)
    _note("encode int8 vs bf16")
    enc_ms_f, enc_ms_q = bench_encode_int8_ms()
    _note("train_step b4")
    step_ms = bench_train_step()
    _note("train_step b32")
    step_ms32 = bench_train_step(batch=32)
    _note("train_step espnet")
    esp_step_ms = bench_train_step_espnet()
    _note("train_step flagship")
    flag_ms, flag_mfu = bench_train_step_flagship()
    _note("train_step flagship b32")
    flag_ms32, flag_mfu32 = bench_train_step_flagship(batch=32, n_chain=2)
    _note("train_step flagship pruned5")
    flag_pruned_ms, _ = bench_train_step_flagship(pruned_range=5)
    _note("beam dense")
    beam_rtf = bench_beam_rtf()
    _note("beam 15pct")
    beam_rtf_15 = bench_beam_rtf(emission_density=0.15)
    _note("beam 15pct flagship")
    flag_beam_rtf_15 = bench_beam_rtf(emission_density=0.15, flagship=True)
    _note("rnnt loss")
    loss_ms = bench_rnnt_loss()
    _note("rnnt loss cpu")
    cpu_loss_ms = bench_rnnt_loss_cpu_ms()
    _note("encode mfu")
    enc_mfu = bench_encode_mfu()
    _note("streaming aishell")
    stream_rtf, stream_lat_ms = bench_streaming_rtf()
    _note("streaming espnet")
    stream_rtf_esp = bench_streaming_rtf_espnet()
    _note("streaming flagship")
    flag_rtf, flag_lat = bench_streaming_rtf_flagship()
    _note("streaming flagship incremental")
    flag_inc_rtf, flag_inc_lat = bench_streaming_rtf_flagship(
        incremental=True)
    _note("streaming flagship 15pct")
    flag_rtf_15, _ = bench_streaming_rtf_flagship(emission_density=0.15,
                                                  measure_cadence=False)
    _note("streaming flagship 15pct incremental")
    flag_inc_rtf_15, _ = bench_streaming_rtf_flagship(
        incremental=True, emission_density=0.15, measure_cadence=False)
    _note("multistream aishell")
    multi_rtf = bench_multistream()
    _note("multistream flagship")
    flag_multi_rtf = bench_multistream_flagship()
    _note("multistream flagship incremental")
    flag_multi_inc_rtf = bench_multistream_flagship(incremental=True)
    _note("multistream espnet")
    esp_multi_rtf = bench_multistream_espnet()
    _note("multistream espnet incremental")
    esp_multi_inc_rtf = bench_multistream_espnet(incremental=True)
    _note("multistream flagship live-round latency")
    flag_round_lat = bench_multistream_cadence_flagship()
    _note("multistream flagship live-round latency incremental")
    flag_round_lat_inc = bench_multistream_cadence_flagship(incremental=True)
    _note("input pipeline (host)")
    pipe_utts, pipe_audio = bench_input_pipeline()
    _note("train flagship real file I/O")
    real_io_utts = bench_train_flagship_real_io()
    _note("banded attention")
    dense_ms, banded_ms = bench_banded_attention()
    # MFU: standard convention — required model FLOPs (3x analytic forward;
    # remat recompute not credited) over measured time vs bf16 chip peak
    def train_mfu(b, ms):
        return 3 * transducer_flops(b, 410, 43, 4334) / (ms / 1e3) / PEAK_FLOPS
    print(json.dumps({
        # "aishell" rows = 4-layer config (configs/aishell.yaml geometry);
        # "flagship" rows = 18-layer joint_streaming config
        # (configs/joint_streaming.yaml, the reference's product model)
        "train_step_ms_aishell_b4": round(step_ms, 2),
        "train_step_ms_aishell_b32": round(step_ms32, 2),
        "train_step_ms_espnet_b4": round(esp_step_ms, 2),
        "train_step_ms_flagship_b4": round(flag_ms, 2),
        "train_step_ms_flagship_b32": round(flag_ms32, 2),
        "mfu_train_step_b32_flagship": round(flag_mfu32, 4),
        "train_step_ms_flagship_b4_pruned5": round(flag_pruned_ms, 2),
        "beam5_x_realtime_b8_aishell_dense": round(beam_rtf, 2),
        "beam5_x_realtime_b8_aishell_15pct": round(beam_rtf_15, 2),
        "beam5_x_realtime_b8_flagship_15pct": round(flag_beam_rtf_15, 2),
        "mfu_train_step_b4_aishell": round(train_mfu(4, step_ms), 4),
        "mfu_train_step_b32_aishell": round(train_mfu(32, step_ms32), 4),
        "mfu_train_step_b4_flagship": round(flag_mfu, 4),
        "mfu_offline_encode_b16_aishell": round(enc_mfu, 4),
        "offline_rtf_int8_aishell": round(rtf_int8, 2),
        "encode_chain_ms_b16_aishell": {"bf16": round(enc_ms_f, 3),
                                        "int8": round(enc_ms_q, 3)},
        "rnnt_loss_fwdbwd_ms_b4_t410_u42": round(loss_ms, 2),
        "rnnt_loss_cpu_fwdbwd_ms_b4_t410_u42": (
            round(cpu_loss_ms, 1) if cpu_loss_ms else None),
        "rnnt_loss_tpu_vs_cpu_x": (
            round(cpu_loss_ms / loss_ms, 1) if cpu_loss_ms else None),
        "streaming_x_realtime_warm_aishell": round(stream_rtf, 2),
        "streaming_x_realtime_warm_espnet": round(stream_rtf_esp, 2),
        "streaming_cadence_ms_per_window_aishell": round(stream_lat_ms, 2),
        "streaming_x_realtime_warm_flagship": round(flag_rtf, 2),
        "streaming_cadence_ms_per_window_flagship": flag_lat["mean"],
        # serving-SLO shape: per-window latency percentiles + first-token
        # latency in the mic regime (VERDICT r3 #7)
        "streaming_window_latency_flagship": flag_lat,
        "streaming_x_realtime_warm_flagship_incremental":
            round(flag_inc_rtf, 2),
        "streaming_cadence_ms_per_window_flagship_incremental":
            flag_inc_lat["mean"],
        "streaming_window_latency_flagship_incremental": flag_inc_lat,
        "streaming_x_realtime_warm_flagship_15pct": round(flag_rtf_15, 2),
        "streaming_x_realtime_warm_flagship_15pct_incremental":
            round(flag_inc_rtf_15, 2),
        "multistream_8_aggregate_x_realtime_aishell": round(multi_rtf, 2),
        "multistream_8_aggregate_x_realtime_flagship": round(flag_multi_rtf, 2),
        "multistream_8_aggregate_x_realtime_flagship_incremental":
            round(flag_multi_inc_rtf, 2),
        "multistream_8_aggregate_x_realtime_espnet": round(esp_multi_rtf, 2),
        "multistream_8_aggregate_x_realtime_espnet_incremental":
            round(esp_multi_inc_rtf, 2),
        # live 8-stream serving-round latency (one window/stream/round, one
        # fused process() per round — the mic-regime SLO distribution)
        "multistream_8_round_latency_ms_flagship": flag_round_lat,
        "multistream_8_round_latency_ms_flagship_incremental":
            flag_round_lat_inc,
        "banded_attn_t2048_ms": {"dense": round(dense_ms, 3),
                                 "pallas": round(banded_ms, 3)},
        # host Dataset->loader feed rate on WAVs on disk (12.3 s utts);
        # single-core box — scales ~per-core on real hosts (DESIGN.md §5a)
        "input_pipeline_utts_per_s_b32": round(pipe_utts, 1),
        "input_pipeline_audio_s_per_s_b32": round(pipe_audio, 0),
        # end-to-end flagship training from files on disk, loader
        # overlapped with the chip (steps_per_call path), vs the
        # synthetic-input train_step rows
        "train_e2e_real_io_utts_per_s_flagship_b32": round(real_io_utts, 1),
        "train_e2e_real_io_vs_synthetic":
            round(real_io_utts / (32 / (flag_ms32 / 1e3)), 3),
        "backend": backend,
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "offline_encode_greedy_x_realtime_aishell",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 2),
    }))


if __name__ == "__main__":
    main()
