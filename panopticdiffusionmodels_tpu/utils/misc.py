"""Small host-side helpers."""
from __future__ import annotations

import jax


def amortize(n_samples: int, batch_size: int):
    """Split n_samples into full batches plus a remainder
    (reference `utils.py:452-455`)."""
    k = n_samples // batch_size
    r = n_samples % batch_size
    return k * [batch_size] if r == 0 else k * [batch_size] + [r]


def cnt_params(params) -> int:
    return sum(a.size for a in jax.tree.leaves(params))
