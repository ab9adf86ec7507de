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


def test_dryrun_multichip_driver_env():
    """Honest driver-contract test: a FRESH subprocess with no conftest, so the
    backend-init ordering is exercised exactly the way the driver exercises it.
    Round 1 failed here: jax.devices() ran before the CPU-platform config and
    locked in the accelerator plugin (MULTICHIP_r01.json rc=1)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd="/root/repo", capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
