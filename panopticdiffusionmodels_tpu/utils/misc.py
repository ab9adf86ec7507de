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


def one_deep(items, dispatch):
    """Yield (item, dispatch(item)) one step BEHIND the dispatch calls.

    jax dispatch is asynchronous, so calling `dispatch(item_{i+1})` before the
    consumer fetches item_i's outputs keeps the device busy while host work
    runs — the single overlap idiom behind sample2dir, fid.dir_statistics and
    serving.generate_batches.  Order is preserved; the tail is flushed."""
    pending = None
    for item in items:
        out = dispatch(item)
        if pending is not None:
            yield pending
        pending = (item, out)
    if pending is not None:
        yield pending
