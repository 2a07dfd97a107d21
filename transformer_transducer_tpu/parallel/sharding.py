"""Parameter sharding rules (GSPMD partition specs).

Data-parallel training replicates parameters; with a >1 ``model`` axis the
rules below shard the FLOP-heavy kernels tensor-parallel:

* attention QKV / output projections over heads,
* FFN inner dimension (column-parallel fc1, row-parallel fc2),
* joint network inner dimension and vocab projection.

XLA GSPMD inserts the all-reduce/all-gather collectives implied by these
specs; nothing here is communication code.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_transducer_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    nd = leaf.ndim
    if "qkv" in joined and joined.endswith("kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("out/kernel"):
        return P(MODEL_AXIS, None)
    if joined.endswith("fc1/kernel") or joined.endswith("forward_layer/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("fc1/bias") or joined.endswith("forward_layer/bias"):
        return P(MODEL_AXIS)
    if joined.endswith("fc2/kernel") or joined.endswith("project_layer/kernel"):
        return P(MODEL_AXIS, None)
    if joined.endswith("r_emb"):
        return P(None, MODEL_AXIS, None)
    if joined.endswith("r_bias") and nd == 2:
        return P(None, MODEL_AXIS)
    if joined.endswith("r_w_bias"):
        return P(MODEL_AXIS, None)
    return P()


def param_specs(params: Any, tensor_parallel: bool = True) -> Any:
    """PartitionSpec pytree for a Transducer parameter tree."""
    if not tensor_parallel:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = None) -> Any:
    """NamedSharding pytree; TP rules activate when the model axis is >1."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get(MODEL_AXIS, 1) > 1
    specs = param_specs(params, tensor_parallel)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = None) -> Any:
    sh = param_shardings(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
