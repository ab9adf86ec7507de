"""The driver contract: entry() compile-checks single-chip; dryrun_multichip
jits the full training step over an n-device mesh."""
import sys

import jax
import jax.numpy as jnp


def test_entry_jittable(rng):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    noise, mask_pred = out
    assert noise.shape == (4, 32, 32, 4)
    assert mask_pred.shape == (4, 64, 64, 8)
    assert bool(jnp.isfinite(noise).all())


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally
