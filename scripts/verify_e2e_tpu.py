#!/usr/bin/env python
"""End-to-end hardware smoke: train -> sample -> checkpoint -> resume on the
real chip, via the same Trainer engine users run (synthetic data, tiny
panoptic dual-stream config).

Asserts, on TPU:
  1. training runs and the loss DECREASES over the run (overfit a tiny set),
  2. a jitted sampling step produces finite images + masks,
  3. an orbax checkpoint round-trips (save at step N, resume into a fresh
     Trainer, step counter and a param leaf match).

Complements bench.py (throughput) and verify_kernel_tpu.py (kernel
numerics) as the driver-independent integration evidence.

Run: python scripts/verify_e2e_tpu.py   (one TPU process at a time)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    from panopticdiffusionmodels_tpu.configs import get_config
    from panopticdiffusionmodels_tpu.train import checkpoint as ckpt_lib
    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    print("backend:", jax.default_backend(), "| devices:", jax.devices())
    config = get_config("synthetic_tiny")
    config.dataset.n = 16
    config.train.batch_size = 16
    config.train.n_steps = 150
    config.train.log_interval = 25
    config.train.save_interval = 150
    config.train.eval_interval = 0
    config.optimizer.lr = 1e-3
    config.lr_scheduler.warmup_steps = 5

    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(config, wd)
        metrics = trainer.fit()
        first = np.mean([m["loss"] + m["loss_mask"] for m in metrics[:2]])
        last = np.mean([m["loss"] + m["loss_mask"] for m in metrics[-2:]])
        print(f"loss+loss_mask: {first:.4f} -> {last:.4f} over {len(metrics)} windows")
        assert last < first, f"loss did not decrease on TPU: {first} -> {last}"

        sample_fn = jax.jit(trainer.build_sample_fn(sample_steps=6))
        ctx = jnp.zeros((4, *config.dataset.clip_shape))
        out = sample_fn(*trainer.sample_weights(), jax.random.PRNGKey(0), ctx)
        imgs, pred_mask = out if isinstance(out, tuple) else (out, None)
        assert np.isfinite(np.asarray(imgs)).all()
        if pred_mask is not None:
            assert np.isfinite(np.asarray(pred_mask)).all()
        print(f"sampling OK: {tuple(np.shape(imgs))}")

        # resume from the checkpoint the save_interval wrote
        trainer2 = Trainer(config, wd)
        state2, ok = ckpt_lib.resume(trainer2.ckpt_root, trainer2.state)
        assert ok, "checkpoint did not resume"
        assert int(state2.step) == 150, int(state2.step)
        leaf = jax.tree.leaves(trainer.state.params)[0]
        leaf2 = jax.tree.leaves(state2.params)[0]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf2))
        print("checkpoint resume OK (step 150, params byte-equal)")
    print("E2E TPU SMOKE OK")


if __name__ == "__main__":
    main()
