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
  * multi-host: `jax.distributed.initialize()` once at startup; DCN handled by
    the runtime.

Mesh axes are always (dp, fsdp, tp); unused axes have size 1.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over the available devices.

    With only `dp=None` everything defaults to pure data parallelism over all
    devices — the reference's one supported strategy (SURVEY.md §2.2).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, f"{n} devices not divisible by fsdp*tp"
        dp = n // (fsdp * tp)
    need = dp * fsdp * tp
    assert need <= n, f"mesh {dp}x{fsdp}x{tp} needs {need} devices, have {n}"
    dev_array = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp and fsdp axes jointly — fsdp
    shards both params and batch so pure-fsdp meshes still scale data."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} data shards"
    )
    return global_batch_size // n
