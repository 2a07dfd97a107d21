"""Optimizer factory + epoch-level LR control (optax).

Parity surface: the reference ``Optimizer`` wrapper (``tt/optim.py:4-83``):

* factory for sgd (momentum, optional nesterov) / adam (betas 0.9, 0.98,
  eps 1e-8) / adadelta, each with weight decay;
* epoch-level geometric decay ``lr *= decay_ratio`` from
  ``begin_to_adjust_lr`` with early stop at lr < 1e-6 (``train.py:256-263``);
* a warmup-hold-decay ``step_decay_lr`` whose decay helper is a stub
  returning None in the reference (``tt/optim.py:53-55``) — implemented
  correctly here (linear warmup to max_lr, hold, exponential decay);
* gradient clipping by global norm (``train.py:62-63``) is part of the chain.

The epoch/step counters live with the optimizer, as in the reference, via
``TrainState``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def build_optimizer(config, max_grad_norm: Optional[float] = None) -> optax.GradientTransformation:
    """sgd/adam/adadelta from a reference-schema ``optim:`` config block.

    ``schedule: step_decay`` in the block selects the per-step
    warmup-hold-decay schedule (:func:`step_decay_schedule`) instead of the
    fixed ``lr`` (overridable knobs: ``warmup_steps``, ``hold_steps``,
    ``final_step``, ``init_lr``, ``min_lr``; ``lr`` becomes ``max_lr``).
    The epoch-level :class:`LRController` should be disabled by the caller
    when a step schedule is active (the Trainer does this).
    """
    kind = config.type
    wd = config.weight_decay or 0.0
    lr = config.lr
    if getattr(config, "schedule", None) == "step_decay":
        import functools

        def knob(value, default):
            # `or` would turn an EXPLICIT 0 into the default — a silent
            # hyperparameter override (e.g. warmup_steps: 0 to disable)
            return default if value is None else value
        lr = functools.partial(
            step_decay_schedule,
            warmup_steps=knob(config.warmup_steps, 4e3),
            hold_steps=knob(config.hold_steps, 3e4),
            final_step=knob(config.final_step, 2.3e5),
            init_lr=knob(config.init_lr, 1e-6),
            max_lr=config.lr,
            min_lr=knob(config.min_lr, 2.5e-6))
    if kind == "adam":
        tx = optax.inject_hyperparams(_adam, static_args=("weight_decay",))(
            learning_rate=lr, weight_decay=wd)
    elif kind == "sgd":
        tx = optax.inject_hyperparams(
            _sgd, static_args=("momentum", "nesterov", "weight_decay"))(
            learning_rate=lr, momentum=config.momentum or 0.0,
            nesterov=bool(config.nesterov), weight_decay=wd)
    elif kind == "adadelta":
        tx = optax.inject_hyperparams(
            _adadelta, static_args=("rho", "eps", "weight_decay"))(
            learning_rate=lr, rho=config.rho or 0.9,
            eps=config.eps or 1e-6, weight_decay=wd)
    else:
        raise NotImplementedError(f"optimizer type {kind!r}")
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def _wd(weight_decay):
    return optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity()


def _adam(learning_rate, weight_decay=0.0):
    # weight decay BEFORE the moment updates (L2, grad += wd*param) — the
    # reference's torch.optim.Adam semantics (``tt/optim.py:59-65``), not
    # AdamW-style decoupled decay
    return optax.chain(_wd(weight_decay),
                       optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-8),
                       optax.scale(-learning_rate))


def _sgd(learning_rate, momentum=0.0, nesterov=False, weight_decay=0.0):
    trace = (optax.trace(decay=momentum, nesterov=nesterov)
             if momentum else optax.identity())
    return optax.chain(_wd(weight_decay), trace, optax.scale(-learning_rate))


def _adadelta(learning_rate, rho=0.9, eps=1e-6, weight_decay=0.0):
    # L2 decay before the accumulator updates, like torch.optim.Adadelta
    return optax.chain(_wd(weight_decay),
                       optax.scale_by_adadelta(rho=rho, eps=eps),
                       optax.scale(-learning_rate))


def step_decay_schedule(step, warmup_steps: float = 4e3,
                        hold_steps: float = 3e4, final_step: float = 2.3e5,
                        init_lr: float = 1e-6, max_lr: float = 2.5e-4,
                        min_lr: float = 2.5e-6):
    """jnp (traceable) twin of :func:`step_decay_lr` — usable as an optax
    schedule through ``inject_hyperparams`` (``optim.schedule: step_decay``)."""
    step = jnp.asarray(step, jnp.float32)
    # strict < and a guarded divisor: warmup_steps == 0 (explicitly allowed
    # to disable warmup) must give max_lr at step 0, not 0/0 = NaN
    warm = init_lr + (max_lr - init_lr) * step / jnp.maximum(warmup_steps, 1)
    frac = jnp.clip((step - hold_steps) / (final_step - hold_steps), 0.0, 1.0)
    decay = max_lr * jnp.exp(frac * jnp.log(min_lr / max_lr))
    return jnp.where(step < warmup_steps, warm,
                     jnp.where(step <= hold_steps, max_lr, decay))


def step_decay_lr(step: int, warmup_steps: float = 4e3, hold_steps: float = 3e4,
                  final_step: float = 2.3e5, init_lr: float = 1e-6,
                  max_lr: float = 2.5e-4, min_lr: float = 2.5e-6) -> float:
    """Warmup-hold-exponential-decay schedule (working version of the
    reference's buggy ``step_decay_lr``, ``tt/optim.py:35-55``)."""
    import math
    if step < warmup_steps:   # strict: warmup_steps == 0 disables warmup
        return init_lr + (max_lr - init_lr) * step / warmup_steps
    if step <= hold_steps:
        return max_lr
    # exponential from (hold_steps, max_lr) to (final_step, min_lr)
    frac = min(1.0, (step - hold_steps) / (final_step - hold_steps))
    return max_lr * math.exp(frac * math.log(min_lr / max_lr))


@dataclasses.dataclass
class LRController:
    """Epoch-level LR state machine (reference ``Optimizer.decay_lr`` +
    trainer loop ``train.py:256-263``)."""

    lr: float
    decay_ratio: float
    begin_to_adjust: int
    min_lr: float = 1e-6

    def maybe_decay(self, epoch: int) -> bool:
        """Decay after ``epoch`` if due; returns False when training should
        early-stop (lr fell below min)."""
        if epoch >= self.begin_to_adjust:
            self.lr *= self.decay_ratio
            if self.lr < self.min_lr:
                return False
        return True


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Rewrite the injected learning_rate hyperparameter inside an optax
    state tree (works through the clip chain)."""
    def visit(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or hasattr(node, "hyperparams"):
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                old = hp["learning_rate"]
                hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(old).dtype)
                return node._replace(hyperparams=hp)
        return None

    def rec(node):
        hit = visit(node)
        if hit is not None:
            return hit
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(rec(x) for x in node)
        if hasattr(node, "_fields"):
            return type(node)(*[rec(getattr(node, f)) for f in node._fields])
        return node

    return rec(opt_state)


def get_learning_rate(opt_state: Any) -> Optional[float]:
    def rec(node):
        if hasattr(node, "hyperparams") and "learning_rate" in getattr(node, "hyperparams", {}):
            return float(jax.device_get(node.hyperparams["learning_rate"]))
        if isinstance(node, tuple):
            for x in node:
                r = rec(x)
                if r is not None:
                    return r
        return None
    return rec(opt_state)
