"""SPMD correctness: the jitted train step must compute the SAME numbers
whatever the mesh layout — sharding is a placement decision, not a semantic one.
"""
import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.train.trainer import Trainer


def _losses(mesh_kwargs, tmp_path, steps=3):
    config = get_config("synthetic_tiny")
    for k, v in mesh_kwargs.items():
        config.mesh[k] = v
    config.train.batch_size = 16
    trainer = Trainer(config, str(tmp_path))
    stream = trainer.data_stream()
    out = []
    for i in range(steps):
        batch = next(stream)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, metrics = trainer._train_step(trainer.state, batch, key)
        out.append((float(metrics["loss"]), float(metrics["loss_mask"])))
    return out


def test_dp8_matches_dp1(tmp_path):
    a = _losses(dict(dp=1, fsdp=1, tp=1), tmp_path / "a")
    b = _losses(dict(dp=8, fsdp=1, tp=1), tmp_path / "b")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fsdp_tp_matches_dp1(tmp_path):
    a = _losses(dict(dp=1, fsdp=1, tp=1), tmp_path / "a")
    c = _losses(dict(dp=2, fsdp=2, tp=2), tmp_path / "c")
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def _samples(mesh_kwargs, tmp_path, speed_modes=False):
    config = get_config("synthetic_tiny")
    for k, v in mesh_kwargs.items():
        config.mesh[k] = v
    config.train.batch_size = 16
    if speed_modes:
        config.sample.accel = 0.2
        config.sample.cfg_interval = (0.0, 0.5)
    trainer = Trainer(config, str(tmp_path))
    sample_fn = jax.jit(trainer.build_sample_fn(sample_steps=6))
    ctx = jnp.zeros((8, *config.dataset.clip_shape))
    imgs, pred_mask = sample_fn(*trainer.sample_weights(),
                                jax.random.PRNGKey(3), ctx)
    return np.asarray(imgs, np.float32), np.asarray(pred_mask, np.float32)


def test_sampling_dp8_matches_dp1(tmp_path):
    """The FULL sampling pipeline (CFG + mask-aware solver + speed modes) is
    layout-invariant: dp8 == dp1 to float tolerance."""
    ia, ma = _samples(dict(dp=1, fsdp=1, tp=1), tmp_path / "a", speed_modes=True)
    ib, mb = _samples(dict(dp=8, fsdp=1, tp=1), tmp_path / "b", speed_modes=True)
    np.testing.assert_allclose(ia, ib, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ma, mb, rtol=1e-4, atol=1e-4)
