"""Device-mesh construction and data sharding.

This module is the whole "distributed backend" of the framework: where the
reference wires torch.distributed/NCCL through HF Accelerate (DDP prepare/
gather/reduce/backward and barriers scattered through the training loops,
reference `train.py:28,60-61,87-88`, `train_t2i_discrete.py:233-235`), the
TPU-native design is one `jax.sharding.Mesh` + NamedSharding annotations:

  * data parallelism  = batch-dim sharding over the 'dp' axis (ICI);
    gradient all-reduce emerges from XLA's partitioner — no explicit collectives,
  * FSDP/ZeRO-style parameter sharding = 'fsdp' axis in the param shardings
    (see `sharding.py`); XLA inserts the all-gathers/reduce-scatters,
  * tensor parallelism = 'tp' axis on attention-head / MLP-hidden dims,
  * sequence (context) parallelism = 'sp' axis on the TOKEN dim of activations
    (params stay replicated across sp, so the partitioner psums grads over it);
    the lever for the long-sequence 512-res panoptic geometry (L≈2126) where
    per-token activations, not params, dominate HBM,
  * pipeline parallelism = 'pp' axis over the DEPTH of the scanned block
    stacks (see `pipeline.py`): stage s owns a contiguous slice of in-blocks
    and the out-blocks that consume exactly those long skips, so skips stay
    stage-local and only the token activation crosses stages via ppermute,
  * multi-host: `jax.distributed.initialize()` once at startup; DCN handled by
    the runtime.

Mesh axes are always (pp, dp, fsdp, sp, tp); unused axes have size 1.  'pp'
is outermost (slowest-varying over the device list) because pipeline traffic
is the sparsest: one activation handoff per tick vs per-op collectives on the
inner axes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("pp", "dp", "fsdp", "sp", "tp")


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (pp, dp, fsdp, sp, tp) mesh over the available devices.

    With only `dp=None` everything defaults to pure data parallelism over all
    devices — the reference's one supported strategy (SURVEY.md §2.2).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (pp * fsdp * sp * tp) == 0, (
            f"{n} devices not divisible by pp*fsdp*sp*tp"
        )
        dp = n // (pp * fsdp * sp * tp)
    need = dp * fsdp * sp * tp * pp
    assert need <= n, (
        f"mesh pp{pp}x{dp}x{fsdp}x{sp}x{tp} needs {need} devices, have {n}"
    )
    dev_array = np.asarray(devices[:need]).reshape(pp, dp, fsdp, sp, tp)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp and fsdp axes jointly — fsdp
    shards both params and batch so pure-fsdp meshes still scale data."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def token_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """Sharding constraint for (B, L, C) token activations under sequence
    parallelism: tokens over 'sp', batch UNCONSTRAINED (the partitioner keeps
    whatever the data input dictates — pinning it here would force batch-1
    traces like `model.init` to satisfy dp*fsdp divisibility).  None when
    sp == 1 (no constraint — propagation is optimal for the unsharded case).

    The token count must be divisible by sp (true for every zoo geometry at
    sp=2: image stream 334/1102 tokens, mask stream 590/2126)."""
    if mesh.shape.get("sp", 1) == 1:
        return None
    return NamedSharding(mesh, P(P.UNCONSTRAINED, "sp"))


def constrain_tokens(x, sharding: Optional[NamedSharding]):
    """`with_sharding_constraint` for (B, L, C) token activations, or identity
    when sequence parallelism is off (sharding=None).  Models call this at the
    token-stream entry and at every block boundary so the partitioner keeps
    the L axis sharded on 'sp' through the whole depth instead of silently
    gathering after the first op it prefers replicated."""
    if sharding is None or x is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def process_batch_slice(sharding: NamedSharding, global_batch: int) -> slice:
    """Rows of the global batch that THIS process's addressable devices need
    under `sharding` (viewed over the batch dim alone).

    For pure data layouts (dp/fsdp split across hosts) this is each process's
    disjoint contiguous slice — the round-2 multi-host contract.  When the
    batch is REPLICATED across processes on some mesh axis (e.g. a pp axis
    spanning hosts: every host holds a full stage-local replica), the
    addressable shards cover the whole batch and this returns the full range,
    which `jax.make_array_from_process_local_data` requires the local data to
    provide.  The union is contiguous for every layout `make_mesh` produces
    (the host boundary always falls on an outer mesh axis)."""
    imap = sharding.addressable_devices_indices_map((global_batch,))
    starts, stops = [], []
    for idx in imap.values():
        s = idx[0]
        starts.append(s.start or 0)
        stops.append(global_batch if s.stop is None else s.stop)
    return slice(min(starts), max(stops))


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} data shards"
    )
    return global_batch_size // n
