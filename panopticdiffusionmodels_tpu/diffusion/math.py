"""Small tensor helpers shared by the diffusion core.

Semantics match the reference helpers `stp`/`mos` (reference `sde.py:18-26`,
`train_t2i_discrete.py:59-67`) but are implemented as pure JAX functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def stp(s, ts):
    """Scalar-tensor product: broadcast a per-batch scalar over trailing dims.

    `s` has shape (B,) (or is a python scalar); `ts` has shape (B, ...).
    """
    s = jnp.asarray(s, dtype=ts.dtype)
    extra_dims = (1,) * (ts.ndim - 1)
    return s.reshape(-1, *extra_dims) * ts


def mos(a, start_dim: int = 1):
    """Mean-of-squares over all dims from `start_dim` on; returns shape (B,)."""
    return jnp.mean(jnp.square(a.reshape(*a.shape[:start_dim], -1)), axis=-1)


def duplicate(x, n: int):
    """Broadcast x to a leading batch dim of size n."""
    return jnp.broadcast_to(x[None, ...], (n, *x.shape))
