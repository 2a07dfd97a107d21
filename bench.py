#!/usr/bin/env python3
"""Benchmark harness — timeout-proof, incremental, budgeted.

Headline metric (BASELINE.md north star): offline encode+greedy-decode
real-time factor on the AISHELL-1 config (4-layer encoder, d_model 512,
T=410 frames = 12.3 s audio/utt at the 30 ms frame rate).  ``vs_baseline``
is the multiple of the 20x-real-time-per-chip target (BASELINE.json); the
reference itself publishes no RTF numbers (SURVEY.md §6).

Survivability contract (VERDICT r4 #1 — the round-4 run was killed by the
driver with zero parseable output):

* sections run **most-load-bearing first** and each is individually
  try/except-guarded;
* the cumulative results JSON reprints on **stderr after every section**
  (same keys, so the tail of a killed run always parses to the latest
  superset);
* the stdout headline line prints **as soon as the headline section
  lands**, and the final version reprints at the end (the driver takes the
  last stdout JSON line);
* a wall-clock budget (env ``TTX_BENCH_BUDGET_S``, default 1500 s) skips
  remaining sections once exceeded, recording them under
  ``bench_skipped``;
* SIGTERM/SIGINT flush both JSON lines before exiting, so even a hard
  driver kill leaves driver-parseable numbers.

Cold-compile cost is cut by sharing constructed models/params across
sections (``_PARTS``) and by deriving the encoder-MFU and bf16-chain
numbers from ONE compiled program instead of two identical ones.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

FRAME_SECONDS = 0.03  # 10 ms hop x subsample 3

# ---------------------------------------------------------------------------
# survivability state: cumulative results + budget (VERDICT r4 #1)
# ---------------------------------------------------------------------------
RESULTS = {}          # cumulative cross-section results (the stderr JSON)
SKIPPED = []          # sections dropped by the wall-clock budget
SECTION_S = {}        # per-section wall seconds (the r5 cost map)
T_START = time.time()
BUDGET_S = float(os.environ.get("TTX_BENCH_BUDGET_S", "1500"))
HEADLINE_KEY = "offline_encode_greedy_x_realtime_aishell"

# shared constructed parts (model + initialized variables) so sections stop
# paying duplicate remote init compiles for the same geometry
_PARTS = {}


def _copy_tree(t):
    """Fresh container structure, shared array leaves — so sections that
    MUTATE a variables dict (the gate-density rigs) cannot corrupt the
    shared ``_PARTS`` cache."""
    return jax.tree_util.tree_map(lambda a: a, t)


def _emit_cumulative():
    out = dict(RESULTS)
    out["bench_skipped"] = list(SKIPPED)
    out["bench_section_s"] = {k: round(v, 1) for k, v in SECTION_S.items()}
    out["bench_wall_s"] = round(time.time() - T_START, 1)
    print(json.dumps(out), file=sys.stderr, flush=True)


def _emit_headline(force=False):
    rtf = RESULTS.get(HEADLINE_KEY)
    if rtf is None and not force:
        return
    line = {
        "metric": HEADLINE_KEY,
        "value": round(rtf, 2) if rtf is not None else 0.0,
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 2) if rtf is not None else 0.0,
    }
    if rtf is None:   # still parseable: a 0 beats a dead artifact
        line["error"] = "headline section did not complete"
    print(json.dumps(line), flush=True)


def _on_signal(signum, frame):
    SKIPPED.append(f"(signal {signum})")
    _emit_cumulative()
    _emit_headline()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(1)

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


def _aishell_parts():
    """Shared aishell-config model + initialized variables (one remote init
    compile for every aishell section: offline RTF, beam, encode chains)."""
    if "aishell" not in _PARTS:
        from transformer_transducer_tpu.models.transducer import Transducer
        model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                           dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                           compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        # jit the init: EAGER init is hundreds of per-op dispatches (and,
        # cold, hundreds of tiny server-side op compiles) through the relay
        # — measured 87 s eager vs 9 s jitted for this model (r5 probe)
        variables = jax.jit(model.init)(rng, jnp.zeros((1, 8, 512)),
                                        jnp.zeros((1, 4), jnp.int32))
        _PARTS["aishell"] = (model, variables)
    return _PARTS["aishell"]


def bench_offline_rtf(batch=8, t=410, u_cap=43, int8=False):
    """Encoder + batched greedy decode on the aishell config.

    ``int8``: the W8A8 serving path (ops/quant.py) — s8 MXU matmuls for
    every projection, dynamic activation scales."""
    from transformer_transducer_tpu.decoding.greedy import greedy_decode
    from transformer_transducer_tpu.models.transducer import Transducer

    model, params = _aishell_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    if int8:
        from transformer_transducer_tpu.models.factory import to_quant
        model, params = to_quant(model, _copy_tree(params))
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
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    model, variables = _aishell_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, 4334)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": jnp.full((batch,), t),
               "targets_length": jnp.full((batch,), u)}
    params = variables["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2.5e-4, "momentum": 0.9}), 200.0)
    opt_state = jax.jit(tx.init)(params)  # eager init = per-leaf dispatches
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


def _encode_chain_s(int8, batch=16, t=410, n_chain=64):
    """Best per-application seconds of an ``n_chain``-long encoder chain
    (aishell config).  ONE compiled program serves both the MFU and the
    bf16-vs-int8 sections (they previously compiled the identical HLO
    twice — pure cold-cache waste).  ``n_chain`` encoder applications chain
    inside one jit (the output is d_model-sized like the input, so each
    feeds the next): a single encode is ~4 ms of chip time, far below the
    relay dispatch floor; 64 applications keep the residual per-call
    dispatch share under ~10 % (the round-2 16-chains under-reported MFU by
    ~25 %).  See DESIGN.md §2a for the roofline decomposition."""
    key = ("encode_chain", int8, batch, t, n_chain)
    if key in _PARTS:
        return _PARTS[key]
    from transformer_transducer_tpu.models.transducer import Transducer

    model, params = _aishell_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    if int8:
        from transformer_transducer_tpu.models.factory import to_quant
        model, params = to_quant(model, _copy_tree(params))

    @jax.jit
    def chain(params, x):
        def body(c, _):
            out = model.apply(params, c, None, method=Transducer.encode)
            return out * 1e-3 + x, None
        out, _ = jax.lax.scan(body, x, None, length=n_chain)
        return jnp.sum(out)

    best = _best_of(chain, params, x, divisor=n_chain)
    _PARTS[key] = best
    return best


def bench_encode_int8_ms(batch=16, t=410, n_chain=64):
    """Encoder-only chain time, bf16 vs int8 (W8A8) — isolates the s8-MXU
    win on the projection matmuls (attention einsums stay bf16 in both)."""
    return (_encode_chain_s(False, batch, t, n_chain) * 1e3,
            _encode_chain_s(True, batch, t, n_chain) * 1e3)


def bench_encode_mfu(batch=16, t=410, n_chain=64):
    """Encoder-only MFU at a saturating batch (aishell config, bf16)."""
    best = _encode_chain_s(False, batch, t, n_chain)
    flops = transducer_flops(batch, t, 0, 0, include_joint=False)
    return flops / best / PEAK_FLOPS


def _espnet_parts():
    """Shared espnet-family config + model + initialized variables (one
    remote init compile for the espnet train/streaming/multistream
    sections)."""
    if "espnet" not in _PARTS:
        from transformer_transducer_tpu.models.espnet_variant import (
            build_espnet_transducer)
        from transformer_transducer_tpu.utils.config import load_config
        cfg = load_config(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "configs",
            "espnet_aishell.yaml"))
        model = build_espnet_transducer(cfg.model, compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        # jitted init: see _aishell_parts
        variables = jax.jit(model.init)(
            rng, jnp.zeros((1, 8, 512)), jnp.asarray([8]),
            jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
        _PARTS["espnet"] = (cfg, model, variables)
    return _PARTS["espnet"]


def bench_train_step_espnet(batch=4, t=410, u=42, n_chain=8):
    """ESPnet-family training step (configs/espnet_aishell.yaml shapes:
    8-block encoder, 2-block text encoder, additive joint, vocab 4233),
    scan-chained like bench_train_step."""
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    cfg, model, variables = _espnet_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, 4233)
    t_len = jnp.full((batch,), t)
    u_len = jnp.full((batch,), u)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": t_len, "targets_length": u_len}
    params = variables["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2.5e-4, "momentum": 0.9}), 200.0)
    opt_state = jax.jit(tx.init)(params)  # eager init = per-leaf dispatches
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
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.training.train_step import (
        TrainStepConfig, make_train_step)
    from transformer_transducer_tpu.utils.config import Config

    v = 6485
    model, variables = _flagship_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch, u), 1, v)
    batch_d = {"inputs": x, "targets": y,
               "inputs_length": jnp.full((batch,), t),
               "targets_length": jnp.full((batch,), u)}
    params = variables["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2e-4, "momentum": 0.9}), 200.0)
    opt_state = jax.jit(tx.init)(params)  # eager init = per-leaf dispatches
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


def _flagship_parts():
    """Shared flagship model (configs/joint_streaming.yaml dims) +
    initialized variables — one remote init compile for the flagship
    train/streaming/multistream/beam sections."""
    if "flagship" not in _PARTS:
        from transformer_transducer_tpu.models.transducer import Transducer
        model = Transducer(vocab_size=6485, enc=(18, 410, 8, 512, 64, 2048),
                           dec=(2, 42, 8, 512, 64, 2048), joint_inner=2048,
                           compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        # jitted init: see _aishell_parts (18 eager layers would be minutes)
        variables = jax.jit(model.init)(rng, jnp.zeros((1, 8, 512)),
                                        jnp.zeros((1, 4), jnp.int32))
        _PARTS["flagship"] = (model, variables)
    return _PARTS["flagship"]


def _flagship_streaming_parts():
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    model, variables = _flagship_parts()
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
    streaming controlled-density benches.

    Returns a FRESH variables tree (the inputs may come from the shared
    ``_PARTS`` cache, which in-place mutation would corrupt)."""
    variables = _copy_tree(variables)
    joint = variables["params"]["joint"]
    w1 = joint["forward_layer"]["kernel"]
    d_enc = w1.shape[0] // 2
    joint["forward_layer"]["kernel"] = w1.at[d_enc:].set(0.0)

    # one jitted program (eager model.apply = per-op relay dispatches)
    @jax.jit
    def gate_margin(variables, enc_rows):
        dec0 = model.apply(variables, jnp.zeros((1, 1), jnp.int32), None,
                           method="predict")[:, 0]
        logits = model.apply(
            variables, enc_rows,
            jnp.broadcast_to(dec0, (enc_rows.shape[0], dec0.shape[-1])),
            method="joint_logits")
        diff = jnp.max(logits[:, 1:], axis=-1) - logits[:, 0]
        return jnp.quantile(diff.astype(jnp.float32), 1.0 - density)

    bias = float(gate_margin(variables, enc_rows))
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
    enc = jax.jit(lambda v, x, m: model.apply(
        v, x, m, method=Transducer.encode))(variables, x, mask)[0]
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


def bench_serve_continuous(n_streams=8, n_groups=2):
    """Continuous batching vs gang scheduling (VERDICT r4 #3): decode the
    same skewed file set — per group of ``n_streams``, one 30 s utterance
    and seven 8 s ones — through (a) the gang-scheduled group mode
    (``apps/serve.py`` default: every slot waits for the group's longest
    member) and (b) ``serve_files`` per-slot turnover.  Returns
    (gang_x_rt, continuous_x_rt, slot_utilization).  aishell config."""
    import numpy as np
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    model, variables = _aishell_parts()
    cfg = StreamingConfig(left_context=10, right_context=2, n_layer=4,
                          feature_dim=128)
    session = BatchedStreamingSession(model, variables, cfg, n_streams)
    rs = np.random.RandomState(0)
    durs = ([30] + [8] * (n_streams - 1)) * n_groups
    waves = [(rs.randn(16000 * s) * 3000).astype("int16") for s in durs]
    audio_s = float(sum(durs))

    def gang():
        for base in range(0, len(waves), n_streams):
            session.reset()
            grp = waves[base:base + n_streams]
            for i, w in enumerate(grp):
                session.accept_waveform(i, w)
                session.finalize(i)
            for i in range(len(grp), n_streams):
                session.finalize(i)
            session.run_to_completion()

    gang()                       # warm (compiles)
    session.serve_files(waves)
    t_gang = t_cont = 1e9
    util = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        gang()
        t_gang = min(t_gang, time.perf_counter() - t0)
        t0 = time.perf_counter()
        session.serve_files(waves)
        t_cont = min(t_cont, time.perf_counter() - t0)
        util = session.last_stats["slot_utilization"]
    return audio_s / t_gang, audio_s / t_cont, util


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

    model, variables = _flagship_parts() if flagship else _aishell_parts()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    t_len = jnp.full((batch,), t)

    if emission_density is not None:
        enc = jax.jit(lambda v, x: model.apply(
            v, x, None, method=Transducer.encode))(variables, x)
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
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)

    model, variables = _aishell_parts()
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
    import numpy as np
    from transformer_transducer_tpu.streaming.session import (
        StreamingConfig, StreamingSession)

    cfg, model, variables = _espnet_parts()
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
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    model, variables = _aishell_parts()
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
    import numpy as np
    from transformer_transducer_tpu.streaming.batched import (
        BatchedStreamingSession)
    from transformer_transducer_tpu.streaming.session import StreamingConfig

    cfg, model, variables = _espnet_parts()
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
    model, variables = _flagship_parts()
    params = variables["params"]
    tx = optim_lib.build_optimizer(
        Config({"type": "sgd", "lr": 2e-4, "momentum": 0.9}), 200.0)
    opt_state = jax.jit(tx.init)(params)  # eager init = per-leaf dispatches
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
    """Per-bench progress marker (stderr) — a stalled run should be
    diagnosable from the tail."""
    print(f"[bench] {name} @ {time.strftime('%H:%M:%S')} "
          f"(+{time.time() - T_START:.0f}s)", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# sections — each updates RESULTS; ordered most-load-bearing first so a
# budget/driver kill loses only the tail (VERDICT r4 #1).  Key names are
# unchanged from rounds 2-4 for cross-round comparability.
# ---------------------------------------------------------------------------

def _train_mfu(b, ms):
    # MFU: standard convention — required model FLOPs (3x analytic forward;
    # remat recompute not credited) over measured time vs bf16 chip peak
    return 3 * transducer_flops(b, 410, 43, 4334) / (ms / 1e3) / PEAK_FLOPS


def _sec_offline_rtf():
    RESULTS[HEADLINE_KEY] = round(bench_offline_rtf(), 2)


def _sec_train_flagship_b4():
    ms, mfu = bench_train_step_flagship()
    RESULTS["train_step_ms_flagship_b4"] = round(ms, 2)
    RESULTS["mfu_train_step_b4_flagship"] = round(mfu, 4)


def _sec_train_flagship_pruned():
    ms, _ = bench_train_step_flagship(pruned_range=5)
    RESULTS["train_step_ms_flagship_b4_pruned5"] = round(ms, 2)


def _sec_train_aishell_b4():
    ms = bench_train_step()
    RESULTS["train_step_ms_aishell_b4"] = round(ms, 2)
    RESULTS["mfu_train_step_b4_aishell"] = round(_train_mfu(4, ms), 4)


def _sec_train_aishell_b32():
    ms = bench_train_step(batch=32)
    RESULTS["train_step_ms_aishell_b32"] = round(ms, 2)
    RESULTS["mfu_train_step_b32_aishell"] = round(_train_mfu(32, ms), 4)


def _sec_train_flagship_b32():
    ms, mfu = bench_train_step_flagship(batch=32, n_chain=2)
    RESULTS["train_step_ms_flagship_b32"] = round(ms, 2)
    RESULTS["mfu_train_step_b32_flagship"] = round(mfu, 4)


def _sec_rnnt_loss():
    RESULTS["rnnt_loss_fwdbwd_ms_b4_t410_u42"] = round(bench_rnnt_loss(), 2)


def _sec_streaming_flagship():
    rtf, lat = bench_streaming_rtf_flagship()
    RESULTS["streaming_x_realtime_warm_flagship"] = round(rtf, 2)
    RESULTS["streaming_cadence_ms_per_window_flagship"] = lat["mean"]
    # serving-SLO shape: per-window latency percentiles + first-token
    # latency in the mic regime (VERDICT r3 #7)
    RESULTS["streaming_window_latency_flagship"] = lat


def _sec_streaming_flagship_inc():
    rtf, lat = bench_streaming_rtf_flagship(incremental=True)
    RESULTS["streaming_x_realtime_warm_flagship_incremental"] = round(rtf, 2)
    RESULTS["streaming_cadence_ms_per_window_flagship_incremental"] = \
        lat["mean"]
    RESULTS["streaming_window_latency_flagship_incremental"] = lat


def _sec_multistream_espnet():
    RESULTS["multistream_8_aggregate_x_realtime_espnet"] = round(
        bench_multistream_espnet(), 2)


def _sec_multistream_espnet_inc():
    RESULTS["multistream_8_aggregate_x_realtime_espnet_incremental"] = round(
        bench_multistream_espnet(incremental=True), 2)


def _sec_multistream_flagship():
    RESULTS["multistream_8_aggregate_x_realtime_flagship"] = round(
        bench_multistream_flagship(), 2)


def _sec_multistream_flagship_inc():
    RESULTS["multistream_8_aggregate_x_realtime_flagship_incremental"] = \
        round(bench_multistream_flagship(incremental=True), 2)


def _sec_input_pipeline():
    utts, audio = bench_input_pipeline()
    # host Dataset->loader feed rate on WAVs on disk (12.3 s utts);
    # single-core box — scales ~per-core on real hosts (DESIGN.md §5a)
    RESULTS["input_pipeline_utts_per_s_b32"] = round(utts, 1)
    RESULTS["input_pipeline_audio_s_per_s_b32"] = round(audio, 0)
    # data.on_device_features: host does file I/O + pad only (int16 waves;
    # the log-mel frontend runs inside the compiled step) — the feed-rate
    # row behind DESIGN.md §5a's host-bottleneck removal
    utts_d, audio_d = bench_input_pipeline(on_device_features=True)
    RESULTS["input_pipeline_utts_per_s_b32_ondevice"] = round(utts_d, 1)
    RESULTS["input_pipeline_audio_s_per_s_b32_ondevice"] = round(audio_d, 0)


def _sec_real_io():
    # end-to-end flagship training from files on disk, loader overlapped
    # with the chip (steps_per_call path), vs the synthetic-input rows
    utts = bench_train_flagship_real_io()
    RESULTS["train_e2e_real_io_utts_per_s_flagship_b32"] = round(utts, 1)
    ms32 = RESULTS.get("train_step_ms_flagship_b32")
    if ms32:
        RESULTS["train_e2e_real_io_vs_synthetic"] = round(
            utts / (32 / (ms32 / 1e3)), 3)
    # the production fix for the host bottleneck the row above exposes:
    # data.on_device_features ships int16 waves, frontend inside the
    # compiled step (host = file I/O + pad only on this 1-core box)
    utts_d = bench_train_flagship_real_io(on_device_features=True)
    RESULTS["train_e2e_real_io_utts_per_s_flagship_b32_ondevice"] = round(
        utts_d, 1)
    if ms32:
        RESULTS["train_e2e_real_io_vs_synthetic_ondevice"] = round(
            utts_d / (32 / (ms32 / 1e3)), 3)


def _sec_train_espnet():
    RESULTS["train_step_ms_espnet_b4"] = round(bench_train_step_espnet(), 2)


def _sec_encode_mfu():
    RESULTS["mfu_offline_encode_b16_aishell"] = round(bench_encode_mfu(), 4)


def _sec_encode_int8():
    f, q = bench_encode_int8_ms()
    RESULTS["encode_chain_ms_b16_aishell"] = {"bf16": round(f, 3),
                                              "int8": round(q, 3)}


def _sec_streaming_aishell():
    rtf, lat_ms = bench_streaming_rtf()
    RESULTS["streaming_x_realtime_warm_aishell"] = round(rtf, 2)
    RESULTS["streaming_cadence_ms_per_window_aishell"] = round(lat_ms, 2)


def _sec_streaming_espnet():
    RESULTS["streaming_x_realtime_warm_espnet"] = round(
        bench_streaming_rtf_espnet(), 2)


def _sec_beam():
    RESULTS["beam5_x_realtime_b8_aishell_dense"] = round(bench_beam_rtf(), 2)


def _sec_beam_15():
    RESULTS["beam5_x_realtime_b8_aishell_15pct"] = round(
        bench_beam_rtf(emission_density=0.15), 2)


def _sec_beam_15_flagship():
    RESULTS["beam5_x_realtime_b8_flagship_15pct"] = round(
        bench_beam_rtf(emission_density=0.15, flagship=True), 2)


def _sec_multistream_aishell():
    RESULTS["multistream_8_aggregate_x_realtime_aishell"] = round(
        bench_multistream(), 2)


def _sec_serve_continuous():
    gang, cont, util = bench_serve_continuous()
    # continuous batching (serve.py --continuous) vs the gang-scheduled
    # group mode over a skewed file set (1x30s + 7x8s per 8-slot group):
    # per-slot turnover removes the head-of-line wait behind each group's
    # longest member
    RESULTS["serve_files_x_realtime_aishell"] = {
        "gang": round(gang, 2), "continuous": round(cont, 2),
        "slot_utilization": round(util, 4)}


def _sec_streaming_flagship_15():
    rtf, _ = bench_streaming_rtf_flagship(emission_density=0.15,
                                          measure_cadence=False)
    RESULTS["streaming_x_realtime_warm_flagship_15pct"] = round(rtf, 2)


def _sec_streaming_flagship_15_inc():
    rtf, _ = bench_streaming_rtf_flagship(incremental=True,
                                          emission_density=0.15,
                                          measure_cadence=False)
    RESULTS["streaming_x_realtime_warm_flagship_15pct_incremental"] = \
        round(rtf, 2)


def _sec_round_latency():
    # live 8-stream serving-round latency (one window/stream/round, one
    # fused process() per round — the mic-regime SLO distribution)
    RESULTS["multistream_8_round_latency_ms_flagship"] = \
        bench_multistream_cadence_flagship()


def _sec_round_latency_inc():
    RESULTS["multistream_8_round_latency_ms_flagship_incremental"] = \
        bench_multistream_cadence_flagship(incremental=True)


def _sec_rnnt_loss_cpu():
    cpu_ms = bench_rnnt_loss_cpu_ms()
    RESULTS["rnnt_loss_cpu_fwdbwd_ms_b4_t410_u42"] = (
        round(cpu_ms, 1) if cpu_ms else None)
    loss_ms = RESULTS.get("rnnt_loss_fwdbwd_ms_b4_t410_u42")
    RESULTS["rnnt_loss_tpu_vs_cpu_x"] = (
        round(cpu_ms / loss_ms, 1) if cpu_ms and loss_ms else None)


def _sec_banded_attention():
    dense_ms, banded_ms = bench_banded_attention()
    RESULTS["banded_attn_t2048_ms"] = {"dense": round(dense_ms, 3),
                                       "pallas": round(banded_ms, 3)}


def _sec_offline_rtf_int8():
    RESULTS["offline_rtf_int8_aishell"] = round(bench_offline_rtf(int8=True), 2)


# (name, fn, cost_estimate_s_warm) — order is the survival order.
# "aishell" rows = 4-layer config (configs/aishell.yaml geometry);
# "flagship" rows = 18-layer joint_streaming config (the reference's
# product model, configs/joint_streaming.yaml).
SECTIONS = [
    ("offline_rtf", _sec_offline_rtf),                 # headline — first
    ("train_step flagship b4", _sec_train_flagship_b4),
    ("train_step flagship pruned5", _sec_train_flagship_pruned),
    ("train_step b4", _sec_train_aishell_b4),
    ("train_step b32", _sec_train_aishell_b32),
    ("train_step flagship b32", _sec_train_flagship_b32),
    ("rnnt loss", _sec_rnnt_loss),
    ("streaming flagship", _sec_streaming_flagship),
    ("streaming flagship incremental", _sec_streaming_flagship_inc),
    ("multistream espnet", _sec_multistream_espnet),
    ("multistream espnet incremental", _sec_multistream_espnet_inc),
    ("multistream flagship", _sec_multistream_flagship),
    ("multistream flagship incremental", _sec_multistream_flagship_inc),
    ("serve continuous vs gang", _sec_serve_continuous),
    ("input pipeline (host)", _sec_input_pipeline),
    ("train flagship real file I/O", _sec_real_io),
    ("train_step espnet", _sec_train_espnet),
    ("encode mfu", _sec_encode_mfu),
    ("encode int8 vs bf16", _sec_encode_int8),
    ("streaming aishell", _sec_streaming_aishell),
    ("streaming espnet", _sec_streaming_espnet),
    ("beam dense", _sec_beam),
    ("beam 15pct", _sec_beam_15),
    ("beam 15pct flagship", _sec_beam_15_flagship),
    ("multistream aishell", _sec_multistream_aishell),
    ("streaming flagship 15pct", _sec_streaming_flagship_15),
    ("streaming flagship 15pct incremental", _sec_streaming_flagship_15_inc),
    ("multistream flagship live-round latency", _sec_round_latency),
    ("multistream flagship live-round latency incremental",
     _sec_round_latency_inc),
    ("rnnt loss cpu", _sec_rnnt_loss_cpu),
    ("banded attention", _sec_banded_attention),
    ("offline_rtf int8", _sec_offline_rtf_int8),       # known wash — last
]


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    RESULTS["backend"] = jax.default_backend()
    headline_printed = False
    # debug/dev filter: TTX_BENCH_ONLY="substr1,substr2" runs only the
    # sections whose name contains one of the substrings
    only = [s.strip() for s in
            os.environ.get("TTX_BENCH_ONLY", "").split(",") if s.strip()]
    for name, fn in SECTIONS:
        if only and not any(s in name for s in only):
            continue
        if time.time() - T_START > BUDGET_S:
            SKIPPED.append(name)
            continue
        _note(name)
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:           # one broken section must not kill
            RESULTS.setdefault("bench_errors", {})[name] = repr(e)[:300]
        SECTION_S[name] = time.perf_counter() - t0
        _emit_cumulative()
        if not headline_printed and HEADLINE_KEY in RESULTS:
            _emit_headline()             # secure the stdout line EARLY
            headline_printed = True
    _emit_cumulative()
    _emit_headline(force=True)           # final reprint (driver takes last)


if __name__ == "__main__":
    main()
