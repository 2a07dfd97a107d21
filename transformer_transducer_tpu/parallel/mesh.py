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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over available devices.

    Defaults to all devices on the data axis.  ``n_data * n_model`` must not
    exceed the device count; extra devices are left unused (a warning would be
    better than a crash for odd pool sizes).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])


def batch_spec() -> P:
    """Leading-axis batch sharding."""
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading batch dim) on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
