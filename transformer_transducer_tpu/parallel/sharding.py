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

from transformer_transducer_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                                      PIPE_AXIS)


# column-parallel projections (output dim sharded): native QKV; espnet
# q/k/v/pos; FFN inner (fc1 / w_1 / forward_layer); joint inner
# (lin_enc / lin_dec).  Row-parallel (input dim sharded, GSPMD inserts the
# all-reduce): attention out projections; FFN outer (fc2 / w_2); vocab
# projections (project_layer / lin_out).
_COL_KERNELS = ("linear_q", "linear_k", "linear_v", "linear_pos",
                "fc1", "w_1", "forward_layer", "lin_enc", "lin_dec")
_ROW_KERNELS = ("attn/out", "linear_out", "fc2", "w_2", "project_layer",
                "lin_out")


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    nd = leaf.ndim
    if "qkv" in joined and joined.endswith("kernel"):
        return P(None, MODEL_AXIS)
    for mod in _COL_KERNELS:
        if joined.endswith(f"{mod}/kernel"):
            return P(None, MODEL_AXIS)
        if joined.endswith(f"{mod}/bias"):
            return P(MODEL_AXIS)
    for mod in _ROW_KERNELS:
        # full module-path suffixes: a bare endswith("out/kernel") would
        # also catch e.g. the conv-subsampling "out" Dense, whose producer
        # is replicated — sharding it only buys a reshard
        if joined.endswith(f"{mod}/kernel"):
            return P(MODEL_AXIS, None)
    if joined.endswith("r_emb"):
        return P(None, MODEL_AXIS, None)
    if joined.endswith("r_bias") and nd == 2:
        return P(None, MODEL_AXIS)
    if joined.endswith("r_w_bias") or joined.endswith("pos_bias_u") \
            or joined.endswith("pos_bias_v"):
        return P(MODEL_AXIS, None)
    return P()


def param_specs(params: Any, tensor_parallel: bool = True) -> Any:
    """PartitionSpec pytree for a Transducer parameter tree."""
    if not tensor_parallel:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = None) -> Any:
    """NamedSharding pytree; TP rules activate when the model axis is >1,
    and — when the mesh carries a ``pipe`` axis — a stacked encoder tree
    (``parallel.pipeline.stack_encoder_layers`` layout, trainer pp mode)
    shards its leading layer axis over the pipeline stages, so each stage
    device materializes only its own layers' parameters (and, through
    :func:`opt_state_shardings`, their optimizer moments)."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get(MODEL_AXIS, 1) > 1
    if mesh.shape.get(PIPE_AXIS, 1) > 1:
        if tensor_parallel:
            raise NotImplementedError(
                "pipeline parallelism composes with the data axis only; "
                "set n_model=1 when n_pipe>1")

        # native pp layout: the WHOLE encoder subtree is the stacked layer
        # tree (every key was layer_i) -> pipe-shard all of it.  espnet pp
        # layout is MIXED (parallel.pipeline.stack_espnet_encoder_layers):
        # only encoder/"layers" stacks; embed / input_proj / subsample /
        # after_norm stay replicated.
        mixed = (isinstance(params, dict)
                 and isinstance(params.get("encoder"), dict)
                 and "layers" in params["encoder"])

        def pp_spec(path, leaf):
            name = getattr(path[0], "key", getattr(path[0], "name", ""))
            if name != "encoder":
                return P()
            if not mixed:
                return P(PIPE_AXIS)
            sub = getattr(path[1], "key", getattr(path[1], "name", "")) \
                if len(path) > 1 else ""
            return P(PIPE_AXIS) if sub == "layers" else P()

        specs = jax.tree_util.tree_map_with_path(pp_spec, params)
    else:
        specs = param_specs(params, tensor_parallel)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def zero_param_shardings(params: Any, mesh: Mesh, pshardings: Any) -> Any:
    """ZeRO-1 shardings: each leaf's sharding gains the DATA axis on its
    largest still-unsharded, dp-divisible dimension.

    Applied to the OPTIMIZER STATE only (``parallel.zero``): parameters and
    gradients stay replicated across dp (the reference analog is
    ``DataParallel``, ``/root/reference/train.py:216-218``), while momenta /
    Adam moments / grad-accumulators shrink to 1/n_data per device — the
    ZeRO stage-1 partition (Rajbhandari et al., arXiv:1910.02054, PAPERS.md).
    GSPMD inserts the implied collectives: the moment update slices the
    replicated gradient locally (free) and the parameter delta is
    all-gathered once per step over ICI.  Leaves with no divisible free
    dimension (tiny biases, scalars) stay as-is — the memory win lives in
    the big kernels.  Composes with tp ('model' stays on its dim) and pp
    (the stacked encoder's 'pipe' dim 0 is already taken; dims 1+ shard)."""
    n_data = mesh.shape.get(DATA_AXIS, 1)

    def add_data(leaf, sh):
        spec = tuple(sh.spec) + (None,) * (leaf.ndim - len(sh.spec))
        if n_data <= 1 or leaf.ndim == 0:
            return sh
        free = [d for d in range(leaf.ndim)
                if spec[d] is None and leaf.shape[d] % n_data == 0]
        if not free:
            return sh
        d = max(free, key=lambda i: leaf.shape[i])
        new = list(spec)
        new[d] = DATA_AXIS
        return NamedSharding(mesh, P(*new))

    return jax.tree_util.tree_map(add_data, params, pshardings)


def opt_state_shardings(opt_state: Any, params: Any, pspecs: Any,
                        mesh: Mesh) -> Any:
    """Shardings for an optax state: subtrees that mirror the param tree
    (momenta, grad accumulators, ...) inherit the param shardings; every
    other leaf (step counters, empty states) is replicated.  Keeps
    tensor-parallel / pipeline-sharded moments co-located with their
    parameters instead of replicating them on every device.  Pass
    :func:`zero_param_shardings` output as ``pspecs`` for ZeRO-1 moments."""
    ptree = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def walk(node):
        try:
            if jax.tree_util.tree_structure(node) == ptree:
                return pspecs
        except Exception:   # unhashable/odd nodes: fall through
            pass
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "_fields"):          # NamedTuple (optax states)
            return type(node)(*(walk(x) for x in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(x) for x in node)
        return repl

    return walk(opt_state)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = None) -> Any:
    sh = param_shardings(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
