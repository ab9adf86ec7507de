"""Parameter sharding rules for the (dp, fsdp, tp) mesh.

Rules are shape/name-driven so they apply to any model in the zoo without
per-model annotation plumbing:

  * 'tp' shards the dimensions that are contraction-parallel in a transformer:
    qkv / mlp-fc1 output dims (column parallel) and proj / fc2 input dims
    (row parallel).  XLA's SPMD partitioner inserts the psum for the row-parallel
    halves automatically,
  * 'fsdp' shards the largest remaining dim of every tensor with >= 2**16
    elements (ZeRO-3 semantics: params live sharded, XLA all-gathers just-in-time
    and reduce-scatters gradients),
  * 'pp' shards the stacked-layer axis (axis 0) of the scanned block stacks
    (in_blocks/out_blocks[_dual]) so each pipeline stage holds only its own
    layer slice (see `pipeline.py`); non-pipelined consumers (sampling) still
    work — the partitioner gathers just-in-time,
  * everything else is replicated.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Column-parallel params: output dim (last axis of the kernel) is split.
# (U-ViT naming + the UNet family's to_q/to_k/to_v and GEGLU ff_proj.)
_TP_COL = ("qkv", "fc1", "to_q", "to_k", "to_v", "ff_proj")
# Row-parallel params: input dim (first axis of the kernel) is split.
_TP_ROW = ("proj", "fc2", "to_out", "ff_out")

_FSDP_MIN_SIZE = 1 << 16

# Scanned-stack module names whose params carry a leading stacked-layer axis
# that the pipeline shards over 'pp' (parallel/pipeline.py).
_PP_STACKED = ("in_blocks", "out_blocks", "in_blocks_dual", "out_blocks_dual")


def _spec_for(path: Tuple[str, ...], shape, mesh: Mesh) -> P:
    tp = mesh.shape["tp"]
    fsdp = mesh.shape["fsdp"]
    pp = mesh.shape["pp"]
    names = [None] * len(shape)
    path_strs = [str(getattr(k, "key", k)) for k in path]

    if (
        pp > 1
        and shape
        and shape[0] % pp == 0
        and any(s in _PP_STACKED for s in path_strs)
    ):
        names[0] = "pp"

    # 2-D kernels, or 3-D with a leading stacked-layers axis (scan_blocks).
    is_kernel = path_strs and path_strs[-1] == "kernel" and len(shape) in (2, 3)

    if tp > 1 and is_kernel:
        owner = path_strs[-2] if len(path_strs) >= 2 else ""
        if owner in _TP_COL and shape[-1] % tp == 0:
            names[-1] = "tp"
        elif owner in _TP_ROW and shape[-2] % tp == 0:
            names[-2] = "tp"

    if fsdp > 1:
        size = 1
        for s in shape:
            size *= s
        if size >= _FSDP_MIN_SIZE:
            # shard the largest eligible unsharded dim
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for i in order:
                if names[i] is None and shape[i] % fsdp == 0:
                    names[i] = "fsdp"
                    break
    while names and names[-1] is None:
        names.pop()
    return P(*names)


def shard_params_rules(params: Any, mesh: Mesh):
    """Pytree of NamedShardings matching `params` under the mesh's rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = [
        NamedSharding(mesh, _spec_for(path, leaf.shape, mesh)) for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_opt_state_rules(opt_state: Any, mesh: Mesh):
    """Optimizer-state shardings: Adam moments mirror their parameters'
    shardings, scalars (step counts) replicate.

    Works by reusing the param rules directly — they are path-SUFFIX and
    shape driven, and the mu/nu subtrees of `optax` states mirror the param
    tree (each moment leaf's path ends in the same `<module>/kernel` names
    as the param it tracks), so the same `_spec_for` yields identical specs.
    This is the other half of ZeRO-3 semantics: moments are 2x param bytes,
    and leaving them replicated forfeits most of the fsdp memory win."""
    return shard_params_rules(opt_state, mesh)


def apply_sharding(params: Any, shardings: Any):
    """Place a (host or differently-sharded) pytree onto the mesh."""
    return jax.tree.map(jax.device_put, params, shardings)
