"""Device mesh construction and topology ownership.

TPU-native replacement for the reference's distributed-communication story:
the active path there is single-process ``torch.nn.DataParallel``
(reference: ``train.py:216-218``) and the vendored-inactive path is
NCCL/MPI/Gloo process groups (``espnet2/train/distributed_utils.py:14-96``).
On TPU there is no separate backend to initialize — this module owns
``jax.devices() -> Mesh`` construction and the jit shardings in
``parallel.sharding`` own the rest; XLA emits the collectives over ICI/DCN.

Axes:
* ``data``  — batch (data parallel; the reference's only active parallelism);
* ``model`` — tensor parallel over heads/FFN/joint inner dims (absent in the
  reference, kept open here for larger configs).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"    # pipeline stages (parallel/pipeline.py)
SEQ_AXIS = "seq"      # banded sequence shards (parallel/sequence.py)

_log = logging.getLogger("transformer_transducer_tpu")


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """``shard_map`` with replication checking off, across jax versions:
    the public ``jax.shard_map`` (jax >= 0.6) calls the knob ``check_vma``;
    the older experimental API calls it ``check_rep``."""
    try:
        from jax import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except (ImportError, TypeError):  # pragma: no cover - old jax
        from jax.experimental.shard_map import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None, *,
              n_pipe: int = 1, n_seq: int = 1) -> Mesh:
    """Build a (data, model[, pipe][, seq]) mesh over available devices.

    Defaults to all devices on the data axis.  Oversized requests degrade
    gracefully: if the axis product exceeds the pool, ``n_data`` shrinks
    to the largest fit (with a warning) rather than crashing — an odd pool
    just leaves its remainder devices unused.  ``n_model``/``n_pipe``/
    ``n_seq`` are never shrunk (their degrees change parameter/activation
    layouts, so they must be explicit choices); a pool smaller than their
    product still raises.

    The ``pipe`` (pipeline stages, ``parallel/pipeline.py``) and ``seq``
    (banded sequence shards, ``parallel/sequence.py``) axes only appear
    when requested >1, so existing 2-axis specs stay valid.
    """
    devices = list(devices if devices is not None else jax.devices())
    fixed = n_model * max(1, n_pipe) * max(1, n_seq)
    if len(devices) < fixed:
        raise ValueError(f"model x pipe x seq axes need {fixed} devices, "
                         f"have {len(devices)}")
    fit = len(devices) // fixed
    if n_data is None:
        n_data = fit
    elif n_data * fixed > len(devices):
        _log.warning("mesh %dx%d needs %d devices, have %d; shrinking the "
                     "data axis to %d (%d device(s) left unused)",
                     n_data, fixed, n_data * fixed, len(devices), fit,
                     len(devices) - fit * fixed)
        n_data = fit
    shape = [n_data, n_model]
    axes = [DATA_AXIS, MODEL_AXIS]
    if n_pipe > 1:
        shape.append(n_pipe)
        axes.append(PIPE_AXIS)
    if n_seq > 1:
        shape.append(n_seq)
        axes.append(SEQ_AXIS)
    need = int(np.prod(shape))
    grid = np.asarray(devices[:need]).reshape(shape)
    return Mesh(grid, tuple(axes))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])


def batch_spec() -> P:
    """Leading-axis batch sharding."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (K, B, ...) super-batch of K stacked step batches:
    the step axis is a device-side loop (replicated), batch rides 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(batch, mesh: Mesh):
    """Place a (K, B, ...) host super-batch (see ``stacked_batch_sharding``)."""
    sh = stacked_batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading batch dim) on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
