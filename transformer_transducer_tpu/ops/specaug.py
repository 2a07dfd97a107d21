"""SpecAugment-style batch masking — pure-functional, on-device.

Parity surface: the reference zeroes 10 random time stripes (width U[0,5))
and 10 random frequency stripes per *batch* inside the training step
(reference: ``tt/utils.py:297-329``, applied at ``train.py:41-44``).  Note the
reference draws one stripe set for the whole batch (not per utterance); we
reproduce that contract and add a vmapped per-utterance variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stripe_mask(rng: jax.Array, length: int, max_width: int,
                 num: int) -> jax.Array:
    """Boolean (length,) mask with ``num`` random stripes of width U[0,max)."""
    r1, r2 = jax.random.split(rng)
    widths = jax.random.uniform(r1, (num,), minval=0.0, maxval=max_width)
    widths = widths.astype(jnp.int32)                      # floor, as int(U[0,w))
    # inclusive upper bound, matching the reference's random.randint
    # (tt/utils.py:301,319): a stripe may end flush at the sequence edge
    starts = jax.random.randint(r2, (num,), 0,
                                jnp.maximum(length - widths + 1, 1))
    pos = jnp.arange(length)[None, :]
    in_stripe = (pos >= starts[:, None]) & (pos < (starts + widths)[:, None])
    return in_stripe.any(axis=0)


def time_mask(rng: jax.Array, inputs: jax.Array, max_mask_time: int = 5,
              mask_num: int = 10) -> jax.Array:
    """(B, T, F): zero ``mask_num`` shared time stripes."""
    mask = _stripe_mask(rng, inputs.shape[1], max_mask_time, mask_num)
    return jnp.where(mask[None, :, None], 0.0, inputs)


def frequency_mask(rng: jax.Array, inputs: jax.Array,
                   max_mask_frequency: int = 5, mask_num: int = 10) -> jax.Array:
    """(B, T, F): zero ``mask_num`` shared frequency stripes."""
    mask = _stripe_mask(rng, inputs.shape[2], max_mask_frequency, mask_num)
    return jnp.where(mask[None, None, :], 0.0, inputs)


def spec_augment(rng: jax.Array, inputs: jax.Array, max_mask_time: int = 5,
                 max_mask_frequency: int = 5, mask_num: int = 10) -> jax.Array:
    """freq masking then time masking, as in the reference train step."""
    r1, r2 = jax.random.split(rng)
    return time_mask(r2, frequency_mask(r1, inputs, max_mask_frequency, mask_num),
                     max_mask_time, mask_num)


def spec_augment_per_utterance(rng: jax.Array, inputs: jax.Array,
                               max_mask_time: int = 5,
                               max_mask_frequency: int = 5,
                               mask_num: int = 10) -> jax.Array:
    """Stronger variant: independent stripes per utterance (vmapped)."""
    rngs = jax.random.split(rng, inputs.shape[0])
    fn = lambda r, x: spec_augment(r, x[None], max_mask_time,
                                   max_mask_frequency, mask_num)[0]
    return jax.vmap(fn)(rngs, inputs)
