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


def _timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_offline_rtf(batch=8, t=410, u_cap=43):
    """Encoder + batched greedy decode on the aishell config."""
    from transformer_transducer_tpu.models.transducer import Transducer
    from transformer_transducer_tpu.decoding.greedy import greedy_decode

    model = Transducer(vocab_size=4334, enc=(4, 410, 8, 512, 64, 1024),
                       dec=(1, 42, 8, 512, 64, 1024), joint_inner=1024,
                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, t, 512))
    params = model.init(rng, x[:, :8], jnp.zeros((batch, 4), jnp.int32))
    t_len = jnp.full((batch,), t)

    @jax.jit
    def run(x, t_len):
        enc = model.apply(params, x, None, method=Transducer.encode)
        return greedy_decode(model, params, enc, t_len, max_tokens=u_cap)

    dt = _timeit(run, x, t_len, iters=5)
    audio_seconds = batch * t * FRAME_SECONDS
    return audio_seconds / dt


def bench_train_step(batch=4, t=410, u=42):
    """Full fused-loss training step on the aishell config, bf16 compute."""
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
    step = jax.jit(make_train_step(
        model, tx, TrainStepConfig(compute_dtype=jnp.bfloat16,
                                   loss_chunk_size=16)))

    def run(p, o):
        p, o, m = step(p, o, batch_d, jax.random.PRNGKey(2))
        return m["loss"]

    dt = _timeit(run, params, opt_state, iters=5)
    return dt * 1e3  # ms / step


def bench_rnnt_loss(batch=4, t=410, u=42, v=4334):
    """Fused joint+lattice fwd+bwd from encoder/decoder states."""
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

    @jax.jit
    def fwd_bwd(enc, dec):
        return jax.grad(lambda e, d_: rnnt_loss_fused(
            e, d_, jp, y, t_len, u_len, chunk_size=64,
            compute_dtype=jnp.bfloat16))(enc, dec)[0].sum()

    dt = _timeit(fwd_bwd, enc, dec, iters=5)
    return dt * 1e3


def main():
    backend = jax.default_backend()
    rtf = bench_offline_rtf()
    step_ms = bench_train_step()
    loss_ms = bench_rnnt_loss()
    print(json.dumps({
        "train_step_ms_aishell_b4": round(step_ms, 2),
        "rnnt_loss_fwdbwd_ms_b4_t410_u42": round(loss_ms, 2),
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
