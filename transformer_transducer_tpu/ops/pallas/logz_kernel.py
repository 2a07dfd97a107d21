"""Pallas TPU kernel for the additive-joint partition function.

``logZ[b, t, u] = logsumexp_v(A[b, t, v] + L[b, u, v])`` — the normalizer
of the pruned transducer's linearized simple joint
(``ops/rnnt_loss_pruned.simple_grid_logprobs``).  An XLA scan over u
re-reads the (B, T, V) slab from HBM on every step (~43x traffic at
flagship shapes, measured ~13 ms fwd+bwd of a 33 ms pruned loss); here
each (b, t-tile) grid step holds its A tile VMEM-resident and sweeps all
u rows over it — A is read from HBM exactly once.

Output layout is (B, U1, T) (u on sublanes so each u step writes a full
lane vector); callers transpose.  The backward pass (softmax-weighted
scatter into A and L) stays an XLA scan — it runs only when the simple
loss term is differentiable (``loss_simple_scale > 0``); the pruning
bounds use the forward under ``stop_gradient``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANES = 128


def _logz_kernel(a_ref, l_ref, out_ref):
    u1 = l_ref.shape[1]
    a = a_ref[0].astype(jnp.float32)                    # (T_t, Vp) resident

    def body(u, _):
        x = a + l_ref[0, u, :].astype(jnp.float32)[None, :]
        m = jnp.max(x, axis=1)
        s = jnp.sum(jnp.exp(x - m[:, None]), axis=1)
        out_ref[0, u, :] = m + jnp.log(s)
        return 0

    jax.lax.fori_loop(0, u1, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logz_pallas(a_grid: jax.Array, l_grid: jax.Array,
                 interpret: bool = False) -> jax.Array:
    b, t, v = a_grid.shape
    u1 = l_grid.shape[1]
    t_tile = 128 if t >= 128 else max(8, -(-t // 8) * 8)
    pad_t = (-t) % t_tile
    pad_v = (-v) % LANES
    a_p = jnp.pad(a_grid, ((0, 0), (0, pad_t), (0, pad_v)),
                  constant_values=NEG)
    l_p = jnp.pad(l_grid, ((0, 0), (0, 0), (0, pad_v)),
                  constant_values=NEG)
    tp, vp = t + pad_t, v + pad_v
    out = pl.pallas_call(
        _logz_kernel,
        out_shape=jax.ShapeDtypeStruct((b, u1, tp), jnp.float32),
        grid=(b, tp // t_tile),
        in_specs=[
            pl.BlockSpec((1, t_tile, vp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, u1, vp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, u1, t_tile), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(a_p, l_p)
    return out.transpose(0, 2, 1)[:, :t]                # (B, T, U1)


def additive_logz_xla(a_grid: jax.Array, l_grid: jax.Array) -> jax.Array:
    """XLA fallback and test oracle: scan over u."""
    def per_u(_, l_row):
        x = a_grid + l_row[:, None, :]
        return None, jax.nn.logsumexp(x, axis=-1)

    _, z = jax.lax.scan(per_u, None, l_grid.swapaxes(0, 1))
    return z.transpose(1, 2, 0)


@jax.custom_vjp
def additive_logz(a_grid: jax.Array, l_grid: jax.Array) -> jax.Array:
    """``logsumexp_v(A[t] + L[u])`` -> (B, T, U1), differentiable."""
    return _additive_logz_fwd(a_grid, l_grid)[0]


def _additive_logz_fwd(a_grid, l_grid):
    a_grid = a_grid.astype(jnp.float32)
    l_grid = l_grid.astype(jnp.float32)
    from transformer_transducer_tpu.ops.rnnt_loss import _use_pallas
    if _use_pallas():
        z = _logz_pallas(a_grid, l_grid)
    else:
        z = additive_logz_xla(a_grid, l_grid)
    return z, (a_grid, l_grid, z)


def _additive_logz_bwd(res, g):
    a_grid, l_grid, z = res

    def step(d_a, xs):
        l_row, z_u, g_u = xs                            # (B,V) (B,T) (B,T)
        p = jnp.exp(a_grid + l_row[:, None, :] - z_u[:, :, None])
        d_a = d_a + g_u[:, :, None] * p
        d_l_u = jnp.einsum("bt,btv->bv", g_u, p)
        return d_a, d_l_u

    d_a, d_l = jax.lax.scan(
        step, jnp.zeros_like(a_grid),
        (l_grid.swapaxes(0, 1), z.transpose(2, 0, 1), g.transpose(2, 0, 1)))
    return d_a, d_l.swapaxes(0, 1)


additive_logz.defvjp(_additive_logz_fwd, _additive_logz_bwd)
